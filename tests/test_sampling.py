"""Sampling + sequence packing (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_deterministic_sample_stable_and_growth_invariant(spark, docs):
    from osm_cut_spark.operators.sampling import deterministic_sample

    a = {r.doc_id for r in deterministic_sample(docs, keep_pct=30).collect()}
    b = {r.doc_id for r in deterministic_sample(docs, keep_pct=30).collect()}
    assert a == b and 0 < len(a) < docs.count()
    # adding documents never flips earlier keep/drop decisions: the sample
    # of a prefix equals the full sample restricted to that prefix
    prefix = docs.orderBy("doc_id").limit(40)
    pa = {r.doc_id for r in deterministic_sample(prefix, keep_pct=30).collect()}
    prefix_ids = {r.doc_id for r in prefix.select("doc_id").collect()}
    assert pa == (a & prefix_ids)
    # a different salt draws an (almost surely) different sample
    c = {r.doc_id for r in deterministic_sample(docs, keep_pct=30, salt="v2").collect()}
    assert c != a


def test_deterministic_sample_validates_rate(spark, docs):
    from osm_cut_spark.operators.sampling import deterministic_sample

    with pytest.raises(ValueError):
        deterministic_sample(docs, keep_pct=101)


def test_stratified_sample_rates(spark, docs):
    from osm_cut_spark.operators.sampling import stratified_sample
    from osm_cut_spark.operators.textstats import lang_id

    out = stratified_sample(docs, rates={"latin": 0})
    rows = out.collect()
    # rate 0 removes the whole latin stratum, keeps every other family
    assert all(r.lang_family != "latin" for r in rows)
    fam = lang_id(docs).groupBy("lang_family").count().collect()
    non_latin = sum(r["count"] for r in fam if r.lang_family != "latin")
    assert len(rows) == non_latin


def test_pack_sequences_matches_bruteforce_and_partition_invariant(spark, docs):
    from osm_cut_spark.operators.sampling import pack_sequences

    got = {
        r.doc_id: (r.n_tokens, r.bin)
        for r in pack_sequences(docs, budget=256, partitions=16).collect()
    }
    # brute force: global id order, exclusive prefix
    toks = sorted(
        (r.doc_id, len([t for t in r.text.split() if t]))
        for r in docs.select("doc_id", "text").collect()
    )
    acc = 0
    want = {}
    for doc_id, n in toks:
        want[doc_id] = (n, acc // 256)
        acc += n
    # whitespace split parity: python str.split() == the \s+ regex here
    assert {k: v[1] for k, v in got.items()} == {k: v[1] for k, v in want.items()}
    # the distributed prefix sum is partition-count independent
    got2 = {
        r.doc_id: (r.n_tokens, r.bin)
        for r in pack_sequences(docs, budget=256, partitions=3).collect()
    }
    assert got2 == got


def test_pack_sequences_null_text(spark):
    """Null text counts as 0 tokens: the driver-side prefix scan must not
    raise on all-null range partitions, and null rows still get a bin
    (they used to be silently excluded from partition totals)."""
    from osm_cut_spark.operators.sampling import pack_sequences

    rows = [(f"d{i:03d}", None if i % 3 else "a b c") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id STRING, text STRING")
    got = {r.doc_id: (r.n_tokens, r.bin) for r in pack_sequences(df, budget=4, partitions=8).collect()}
    assert len(got) == 30
    acc, want = 0, {}
    for doc_id, text in sorted(rows):
        n = len(text.split()) if text else 0
        want[doc_id] = (n, acc // 4)
        acc += n
    assert got == want


def test_pack_sequences_empty_and_validation(spark, docs):
    from osm_cut_spark.operators.sampling import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)
    empty = docs.filter(F.lit(False))
    assert pack_sequences(empty, budget=64).count() == 0
