"""Tests for kNN, dedup, and textstats operators on small Spark frames."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_knn_bruteforce_matches_numpy(spark):
    from osm_cut_spark.operators.knn import knn_bruteforce

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    q = mat[ids == 0][0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(
        [(s, i) for s, i in zip(sims, ids) if i != 0], key=lambda t: (-t[0], t[1])
    )
    want = [int(i) for _, i in order[:10]]
    got = [r.vec_id for r in knn_bruteforce(emb.filter("vec_id != 0"), list(q), 10).collect()]
    assert got == want


def test_knn_points_cell_expansion(spark):
    from osm_cut_spark.operators.extract import make_cell_udf
    from osm_cut_spark.operators.knn import knn_points

    pts = spark.createDataFrame(
        [(i, float(i % 13), float(i % 7)) for i in range(200)], "id LONG, lon DOUBLE, lat DOUBLE"
    ).withColumn("cell_r7", make_cell_udf(spark, 7)(F.col("lon"), F.col("lat")))
    got = knn_points(spark, pts, 5.0, 3.0, k=5, res=7)
    rows = got.collect()
    assert len(rows) == 5
    # verify against brute force
    all_pts = pts.collect()
    brute = sorted(all_pts, key=lambda r: (((r.lon - 5.0) ** 2 + (r.lat - 3.0) ** 2), r.id))[:5]
    assert [r.id for r in rows] == [r.id for r in brute]


def test_knn_join_matches_bruteforce(spark):
    from osm_cut_spark.operators.knn import knn_join

    pts = spark.createDataFrame(
        [(i, float(i % 13), float(i % 7)) for i in range(200)], "id LONG, lon DOUBLE, lat DOUBLE"
    )
    qs = spark.createDataFrame(
        [(100 + j, float(j * 2.5), float(j % 5)) for j in range(6)],
        "qid LONG, lon DOUBLE, lat DOUBLE",
    )
    # radius spans the whole res-3 grid -> exact kNN for every query
    got = knn_join(spark, pts, qs, k=4, res=3, radius=8).collect()
    all_pts = pts.collect()
    for q in qs.collect():
        brute = sorted(
            all_pts, key=lambda r: ((r.lon - q.lon) ** 2 + (r.lat - q.lat) ** 2, r.id)
        )[:4]
        mine = sorted([r for r in got if r.qid == q.qid], key=lambda r: r.rn)
        assert [r.id for r in mine] == [r.id for r in brute], q.qid


def test_exact_dedup_clusters(spark):
    from osm_cut_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "cc"), (4, "aa bb")], "doc_id LONG, text STRING"
    )
    got = {r.keep_id: r.n_dups for r in exact_dedup(df).collect()}
    assert got == {1: 3, 3: 1}


def test_minhash_finds_near_dups(spark):
    from osm_cut_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    near = base.replace("lazy", "sleepy")
    far = "completely different words that share nothing with anything else here at all"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)], "doc_id LONG, text STRING"
    )
    got = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df, jaccard_threshold=0.3).collect()}
    assert (1, 4) in got  # exact dup pair
    assert (1, 2) in got or (2, 4) in got  # near dup caught
    assert (1, 3) not in got and (2, 3) not in got
    # minhash candidates (verified) are a subset of exact jaccard pairs
    exact = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(df, jaccard_threshold=0.3).collect()}
    assert got <= exact


def test_dup_clusters_connected_components(spark):
    from osm_cut_spark.operators.dedup import dup_clusters

    # components: {1,2,3,9} (chain 1-2, 2-3, 3-9), {5,7}, {10,11,12} (clique)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (5, 7), (10, 11), (11, 12), (10, 12)],
        "id_a LONG, id_b LONG",
    )
    got = {r.doc_id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5, 10: 10, 11: 10, 12: 10}


def test_simhash_hamming(spark):
    from osm_cut_spark.operators.dedup import simhash_dup_pairs

    base = " ".join(f"word{i}" for i in range(120))
    near = base + " tail"  # changes only the final bigram shingles
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, "umm"), (4, base)], "doc_id LONG, text STRING"
    )
    rows = {(r.id_a, r.id_b): r.hamming for r in simhash_dup_pairs(df, max_hamming=8).collect()}
    assert rows.get((1, 4)) == 0
    assert (1, 2) in rows and rows[(1, 2)] <= 8
    assert (1, 3) not in rows


def test_token_stats_values(spark):
    from osm_cut_spark.operators.textstats import token_stats

    df = spark.createDataFrame([(1, "Hello world, 42 times!")], "doc_id LONG, text STRING")
    r = token_stats(df).collect()[0]
    assert r.n_chars == 22
    assert r.n_ws_tokens == 4
    # bpe: Hello world , 42 times ! -> 6
    assert r.n_bpe_tokens == 6


def test_repetition_stats_values_and_plan(spark):
    from osm_cut_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),          # top a=3/5; runs all len 1; 2g: ab ba ab ba -> 2 dup of 4; 3g: aba bab aba -> 1 dup of 3
            (2, "x x x y"),            # top x=3/4, run 3; 2g: xx xx xy -> 1/3; 3g: xxx xxy -> 0/2
            (3, "solo"),               # single word: no n-grams
            (4, ""),                   # empty text -> zero everything
        ],
        "doc_id LONG, text STRING",
    )
    r = {x.doc_id: x for x in repetition_stats(df).collect()}
    assert (r[1].n_words, r[1].top_word_count, r[1].max_word_run) == (5, 3, 1)
    assert r[1].top_word_frac == 3 / 5
    assert r[1].dup_2gram_frac == 2 / 4
    assert r[1].dup_3gram_frac == 1 / 3
    assert (r[2].n_words, r[2].top_word_count, r[2].max_word_run) == (4, 3, 3)
    assert r[2].dup_2gram_frac == 1 / 3
    assert r[2].dup_3gram_frac == 0.0
    assert (r[3].n_words, r[3].top_word_count, r[3].max_word_run) == (1, 1, 1)
    assert (r[3].dup_2gram_frac, r[3].dup_3gram_frac) == (0.0, 0.0)
    assert (r[4].n_words, r[4].top_word_count, r[4].max_word_run) == (0, 0, 0)
    assert (r[4].top_word_frac, r[4].dup_2gram_frac) == (0.0, 0.0)

    # 100 TB shape: one narrow projection — no shuffle, no Python
    explained = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained
    assert "EvalPython" not in explained


def test_boilerplate_ngrams(spark):
    from osm_cut_spark.operators.textstats import boilerplate_ngrams

    df = spark.createDataFrame(
        [
            (1, "all rights reserved by acme corp and friends"),
            (2, "contact us today all rights reserved by acme corp"),
            (3, "all rights reserved by acme but different tail"),
            (4, "short doc"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = [(r.ngram, r.tf, r.df) for r in boilerplate_ngrams(df, n=5, min_df=2).collect()]
    # the shared 5-gram head appears in all three long docs
    assert rows[0] == ("all rights reserved by acme", 3, 3)
    # the 6-word continuation appears in docs 1 and 2 only
    assert ("rights reserved by acme corp", 2, 2) in rows
    assert all(r[2] >= 2 for r in rows)
    # doc 4 (2 words) contributes nothing, and no df-1 n-grams leak in
    assert all("different" not in r[0] and "short" not in r[0] for r in rows)
    # replayable (md5-h64) path selects the same set when k is not binding
    rows_r = [
        (r.ngram, r.tf, r.df)
        for r in boilerplate_ngrams(df, n=5, min_df=2, replayable=True).collect()
    ]
    assert sorted(rows) == sorted(rows_r)


def test_boilerplate_ngrams_slim_exchange(spark):
    """100 TB shape: every Exchange in the boilerplate plan partitions on
    8-byte longs — the n-gram STRING never rides a shuffle (it is hashed
    before the count-distinct aggregate and resolved for only the k
    winners afterwards, behind a broadcast semi-join)."""
    import re

    from osm_cut_spark.operators.textstats import boilerplate_ngrams

    df = spark.createDataFrame(
        [(i, f"w{i} all rights reserved by acme corp tail{i % 3}") for i in range(40)],
        "doc_id LONG, text STRING",
    )
    out = boilerplate_ngrams(df, n=5, min_df=2, k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no per-row Python anywhere, and the string column is absent from
    # every hash-partitioning key (the n-gram text only ever appears as
    # the tiny post-semi-join min() payload, bounded by k)
    assert "EvalPython" not in plan
    for part in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "ngram" not in part, part
    # correctness unchanged by the slim plan
    rows = out.collect()
    assert (rows[0].ngram, rows[0].df) == ("all rights reserved by acme", 40)
    # AQE final plan: the top-k aggregate subtree appearing on both sides
    # of the text-resolve join is REUSED, not recomputed — the big shuffle
    # is written once per action (reuse only materializes in the final
    # adaptive plan, hence the assert runs post-collect)
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final or "ReusedSubquery" in final, final[:4000]


def test_quality_and_lang(spark, docs):
    from osm_cut_spark.operators.textstats import lang_id, quality_score

    q = quality_score(docs).collect()
    assert all(0 <= r.quality <= 100 for r in q)
    l = lang_id(docs).collect()
    assert {r.lang_family for r in l} <= {"latin", "cyrillic", "cjk", "unknown"}


def test_fingerprint_deterministic(spark, docs):
    from osm_cut_spark.operators.textstats import fingerprint

    a = {r.doc_id: (r.full_hash, tuple(r.window_hashes)) for r in fingerprint(docs).collect()}
    b = {r.doc_id: (r.full_hash, tuple(r.window_hashes)) for r in fingerprint(docs).collect()}
    assert a == b
    assert all(len(v[1]) == 8 for v in a.values())


def test_dedup_plan_stays_jvm(spark, docs):
    """Dedup hot paths must not drop into Python eval."""
    from osm_cut_spark.operators.dedup import minhash_lsh_pairs

    plan = minhash_lsh_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_minhash_plan_shape(spark, docs):
    """Round-7 plan guarantees: the LSH candidate subtree is computed once
    (persisted — InMemoryTableScan on every reuse), the exact-Jaccard
    verify recomputes shingles only behind candidate-pruning LeftSemi
    joins (late materialization), the shingle explode is the outer form
    (no size()>0 predicate pushed below the spread exchange to re-expand
    the staged tokenizer), and no window is used anywhere (bucket capping
    is an aggregate, not a per-row count-over)."""
    from osm_cut_spark.operators.dedup import minhash_lsh_pairs, simhash_dup_pairs

    out = minhash_lsh_pairs(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # candidate pair set cached, reused by the verify joins + id pruning
    assert "InMemoryTableScan" in plan
    # both verify shingle rebuilds are candidate-pruned semi-joins
    assert plan.count("LeftSemi") >= 2, plan
    # the gram explode must be outer (no pushable size() filter) and no
    # Filter on the scan may carry a higher-order tokenize expression
    assert ", true, [_s" in plan, "gram explode is not the outer form"
    import re

    for m in re.finditer(r"DataFilters: \[([^\]]*)\]", plan):
        assert "lambdafunction" not in m.group(1), m.group(1)
    splan = simhash_dup_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in splan
    # single-scan groupBy pair expansion: the bit-count aggregation and the
    # chunk expansion run off ONE docs scan
    assert splan.count("Scan parquet") == 1, splan.count("Scan parquet")


def test_clean_corpus_chain(spark):
    from osm_cut_spark.operators.corpus import clean_corpus

    good = "the quick brown fox jumps over the lazy dog and runs to the old barn again"
    near = good.replace("lazy", "sleepy")
    rows = [
        (1, good),                      # survives (representative of {1,2,4})
        (2, good),                      # exact dup of 1 -> dropped
        (4, near),                      # near dup of 1 -> dropped
        (3, "привет мир " * 10),  # cyrillic -> lang filter drops
        (5, "!!! ??? 123 ,,, ..."),      # zero alpha/stopwords -> quality 1 -> dropped
        (6, "an entirely different story about mountains rivers and the sea beyond them all"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id for r in clean_corpus(df, min_quality=10, jaccard_threshold=0.3,
                                          n_perm=16, bands=8).collect()}
    assert got == {1, 6}


def test_keep_best_argmax_survivor(spark):
    """Canonical selection: the HIGHEST-quality cluster member survives
    (not the min-id label), ties break to the lowest id, and singletons
    pass through as their own cluster."""
    from osm_cut_spark.operators.corpus import keep_best

    base = "the quick brown fox jumps over the lazy dog and runs to the old barn"
    rich = base + " while the other animals watch from the tall grass near the river"
    rows = [
        (1, base),   # cluster {1, 2, 4}: near-dups of each other
        (2, base.replace("lazy", "sleepy")),
        (4, rich.replace("quick", "swift")),  # not in cluster (diverged text)
        (7, "an entirely different story about mountains rivers and the sea beyond"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r.cluster_id: (r.doc_id, r.n_members)
        for r in keep_best(df, jaccard_threshold=0.3, n_perm=16, bands=8).collect()
    }
    # every cluster yields exactly one survivor; singletons keep themselves
    assert set(got) >= {7}
    assert got[7] == (7, 1)
    # total members across clusters == corpus size (partition, no loss)
    assert sum(n for _, n in got.values()) == len(rows)

    # explicit-pair path: force {1,2,4} into one cluster and check argmax
    pairs = spark.createDataFrame([(1, 2), (2, 4)], "id_a LONG, id_b LONG")
    got2 = {r.cluster_id: (r.doc_id, r.quality, r.n_members)
            for r in keep_best(df, pairs=pairs).collect()}
    assert set(got2) == {1, 7}
    surv, q, n = got2[1]
    assert n == 3
    # doc 4 has strictly more tokens/alpha -> higher quality -> survives
    assert surv == 4

    # tie-break: identical texts have identical quality -> min id survives
    tie = spark.createDataFrame([(10, base), (11, base)], "doc_id LONG, text STRING")
    tpairs = spark.createDataFrame([(10, 11)], "id_a LONG, id_b LONG")
    tgot = keep_best(tie, pairs=tpairs).collect()
    assert len(tgot) == 1 and tgot[0].doc_id == 10 and tgot[0].n_members == 2


def test_dup_clusters_nonconvergence_raises(spark):
    import pytest
    from osm_cut_spark.operators.dedup import dup_clusters

    # a 6-hop chain cannot converge in 2 rounds of one-hop propagation
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a LONG, id_b LONG"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(chain, max_iters=2)
    # non-strict mode returns the partial labeling instead
    got = dup_clusters(chain, max_iters=2, strict=False).collect()
    assert len(got) == 8


def test_dup_clusters_rejects_zero_iters(spark):
    import pytest
    from osm_cut_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([(1, 2)], "id_a LONG, id_b LONG")
    with pytest.raises(ValueError, match="max_iters"):
        dup_clusters(pairs, max_iters=0)


def test_simhash_identical_corpus_bounded(spark):
    """Degenerate boilerplate corpus: n identical docs must NOT pay O(n^2)
    bit_count work — identical hashes collapse to one (sh, ids) group per
    bucket, and the (inherently quadratic-SIZED) hamming-0 output expands
    once globally, from block 0 only.  3000 identical docs -> C(3000,2)
    exact pairs in bounded time (the pre-fix shape stalled here)."""
    from osm_cut_spark.operators.dedup import simhash_dup_pairs

    n = 3000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("same boilerplate text repeated for every document " * 3).alias("text"),
    )
    assert simhash_dup_pairs(docs, max_hamming=3).count() == n * (n - 1) // 2


def test_simhash_max_bucket_cap(spark):
    """max_bucket bounds DISTINCT hashes per bucket: all-identical groups
    (xs size 1) always survive; cross-hash buckets over the cap drop."""
    from osm_cut_spark.operators.dedup import simhash_dup_pairs

    base = " ".join(f"word{i}" for i in range(120))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, base)], "doc_id LONG, text STRING"
    )
    got = {(r.id_a, r.id_b) for r in simhash_dup_pairs(df, max_hamming=3, max_bucket=1).collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_simhash_capped_within_pairs_all_blocks(spark):
    """Capped mode emits within-group (hamming-0) pairs from EVERY
    surviving block (so a dropped block-0 bucket no longer loses them
    irrevocably); the terminal dropDuplicates must still yield each pair
    exactly once, and a non-dropping cap must equal exact mode."""
    from osm_cut_spark.operators.dedup import simhash_dup_pairs

    texts = [" ".join(f"w{i}_{j}" for j in range(40)) for i in range(6)]
    rows = [(k, texts[k % 6]) for k in range(18)]  # 6 identical-groups of 3
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    exact = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_dup_pairs(df, max_hamming=3).collect()
    )
    capped = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_dup_pairs(df, max_hamming=3, max_bucket=1000).collect()
    )
    assert capped == exact
    assert len({(a, b) for a, b, _ in capped}) == len(capped)


def test_minhash_lsh_join_cross_corpus(spark):
    """Contamination join: hits only cross (corpus x benchmark) pairs."""
    from osm_cut_spark.operators.dedup import minhash_lsh_join

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok30", "tokX")
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different short text here")],
        "doc_id LONG, text STRING",
    )
    bench = spark.createDataFrame(
        [(101, near), (102, "nothing in common with anything at all")],
        "doc_id LONG, text STRING",
    )
    got = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_join(corpus, bench, jaccard_threshold=0.3).collect()
    }
    assert (1, 101) in got
    # ids always come from (corpus, bench) respectively — never within-side
    assert all(a in (1, 2) and b in (101, 102) for a, b in got)
    assert (2, 102) not in got


def test_decontaminate_quarantines_overlaps(spark):
    from osm_cut_spark.operators.corpus import decontaminate

    base = " ".join(f"tok{i}" for i in range(60))
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different short text here")],
        "doc_id LONG, text STRING",
    )
    bench = spark.createDataFrame(
        [(101, base.replace("tok30", "tokX"))], "doc_id LONG, text STRING"
    )
    kept = {r.doc_id for r in decontaminate(corpus, bench, jaccard_threshold=0.3).collect()}
    assert kept == {2}


def test_vocab_topk(spark):
    from osm_cut_spark.operators.textstats import vocab_topk

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b b"), (3, "z")], "doc_id LONG, text STRING"
    )
    rows = [(r.token, r.tf, r.df) for r in vocab_topk(df, k=2).collect()]
    assert rows == [("a", 3, 2), ("b", 3, 2)]  # tf tie broken by token


def test_minhash_caps_observable(spark):
    """Every capped LSH operator surfaces dropped-bucket counts through a
    lazy metrics DataFrame (no silent approximation): minhash_lsh_pairs,
    minhash_lsh_join, simhash_dup_pairs."""
    from osm_cut_spark.operators.dedup import (
        minhash_lsh_join,
        minhash_lsh_pairs,
        simhash_dup_pairs,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(i, base) for i in range(12)], "doc_id LONG, text STRING"
    )
    m = {}
    minhash_lsh_pairs(docs, max_bucket=3, metrics=m).collect()
    assert m["dropped_buckets"].first()[0] > 0  # 12 identical docs >> cap 3
    m2 = {}
    minhash_lsh_pairs(docs, max_bucket=1000, metrics=m2).collect()
    assert m2["dropped_buckets"].first()[0] == 0

    m3 = {}
    minhash_lsh_join(docs, docs, max_bucket_pairs=4, metrics=m3).collect()
    assert m3["dropped_buckets"].first()[0] > 0  # 12x12 product >> 4

    # simhash: cap 1 drops every bucket holding >= 2 DISTINCT hashes
    texts = [(i, " ".join(f"w{i}_{j}" for j in range(30))) for i in range(6)]
    sdocs = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    m4 = {}
    simhash_dup_pairs(sdocs, max_hamming=30, max_bucket=1, metrics=m4).collect()
    assert m4["dropped_buckets"].first()[0] > 0


def test_asof_join_semantics(spark):
    """Point-in-time join: inclusive vs strict at equal timestamps,
    duplicate-timestamp tiebreak (largest id wins), no-match nulls."""
    from osm_cut_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(101, 1, 5), (102, 1, 10), (103, 1, 20), (104, 9, 7)],
        "qid BIGINT, user_id BIGINT, t BIGINT",
    )
    right = spark.createDataFrame(
        [(1, 1, 10, 1.0), (2, 1, 15, 2.0), (4, 3, 10, 41.0), (5, 3, 10, 42.0)],
        "event_id BIGINT, user_id BIGINT, t BIGINT, value DOUBLE",
    )
    got = {
        r.qid: (r.asof_event_id, r.asof_value)
        for r in asof_join(
            left, right, "user_id", "t", ["event_id", "value"], "event_id"
        ).collect()
    }
    assert got == {
        101: (None, None),     # nothing at or before t=5
        102: (1, 1.0),         # inclusive: R1 at the same t=10 is visible
        103: (2, 2.0),         # latest prior
        104: (None, None),     # user 9 has no right rows at all
    }

    strict = {
        r.qid: r.asof_event_id
        for r in asof_join(
            left, right, "user_id", "t", ["event_id"], "event_id", strict=True
        ).collect()
    }
    assert strict[102] is None  # strict: equal-t right row not visible
    assert strict[103] == 2     # R2@15 strictly precedes t=20

    # duplicate (key, t) right rows: the larger tiebreak id wins, atomically
    l3 = spark.createDataFrame([(201, 3, 10)], "qid BIGINT, user_id BIGINT, t BIGINT")
    (row,) = asof_join(
        l3, right, "user_id", "t", ["event_id", "value"], "event_id"
    ).collect()
    assert (row.asof_event_id, row.asof_value) == (5, 42.0)


def test_asof_join_plan_single_exchange_no_join(spark):
    """asof_join is a union + window, NOT a range join: exactly one
    shuffle (hash by key), one Window, zero join operators, zero Python —
    the pair-explosion-free shape that survives both sides being huge."""
    import __spark_entry__ as e

    df = e.queries()["asof_join"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_lookback_agg_strict_past_and_plan(spark):
    """Rolling look-back window: strict past (current second excluded,
    so same-second rows never leak), window boundary inclusive at
    t - window_sec; plan = one exchange + one Window, no join/Python."""
    from datetime import datetime, timezone

    from osm_cut_spark.operators.asof import lookback_agg

    def ts(s):
        return datetime.fromtimestamp(1_700_000_000 + s, tz=timezone.utc).replace(tzinfo=None)

    ev = spark.createDataFrame(
        [
            (1, 1, ts(0), 1.0),
            (2, 1, ts(0), 2.0),     # same second as event 1
            (3, 1, ts(10), 4.0),    # sees events at sec 0 only
            (4, 1, ts(3610), 8.0),  # sec 10 is exactly 3600 back -> included
            (5, 2, ts(10), 16.0),   # other key: isolated
        ],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    got = {
        r.event_id: (r.n_lookback, r.sum_lookback)
        for r in lookback_agg(ev, "user_id", "ts", "value", 3600).collect()
    }
    assert got[1] == (0, None)      # same-second sibling NOT visible
    assert got[2] == (0, None)
    assert got[3] == (2, 3.0)       # both sec-0 events
    assert got[4] == (1, 4.0)       # only sec 10 (sec 0 aged out)
    assert got[5] == (0, None)

    plan = (
        lookback_agg(ev, "user_id", "ts", "value", 3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan and "EvalPython" not in plan
