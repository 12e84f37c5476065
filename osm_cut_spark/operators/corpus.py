"""Composed corpus-cleanup pipeline — the canonical pretraining prep flow
as ONE operator, built from the engine's own pieces:

    language filter -> quality filter -> exact dedup (md5 clusters, min-id
    survivor) -> near-dup dedup (MinHash-LSH pairs -> connected components,
    min-id representative survives)

Every stage is individually oracle-checked elsewhere; this operator proves
they COMPOSE (the ``clean_corpus`` driver query replays the whole chain in
one DuckDB statement).  All stages are linear scans + bucketed joins — the
pipeline inherits the scale posture of its parts (no all-pairs anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from osm_cut_spark.operators.dedup import (
    dup_clusters,
    exact_dedup,
    minhash_lsh_join,
    minhash_lsh_pairs,
)
from osm_cut_spark.operators.textstats import lang_id, quality_score


def clean_corpus(
    docs: DataFrame,
    min_quality: int = 40,
    lang_families: tuple[str, ...] = ("latin",),
    jaccard_threshold: float = 0.5,
    n_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    replayable: bool = False,
) -> DataFrame:
    """Surviving documents after the full cleanup chain.

    Returns (doc_id, lang_family, quality) for every document that
    (a) matches the language families, (b) meets the quality floor,
    (c) is its exact-duplicate cluster's min-id survivor, and
    (d) is not a dropped member of a near-dup cluster (the min-id
    representative of each connected component survives).
    """
    q = quality_score(docs, id_col, text_col).select(id_col, "quality")
    lang = lang_id(docs, id_col, text_col).select(id_col, "lang_family")
    base = (
        docs.join(q, id_col)
        .join(lang, id_col)
        .filter(F.col("lang_family").isin(list(lang_families)) & (F.col("quality") >= min_quality))
    )

    exact_keep = exact_dedup(base, id_col, text_col).select(F.col("keep_id").alias(id_col))
    s0 = base.join(exact_keep, id_col, "left_semi")

    pairs = minhash_lsh_pairs(
        s0,
        id_col=id_col,
        text_col=text_col,
        n_perm=n_perm,
        bands=bands,
        shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
        replayable=replayable,
    )
    clusters = dup_clusters(pairs)
    dropped = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return s0.join(dropped, id_col, "left_anti").select(id_col, "lang_family", "quality")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    jaccard_threshold: float = 0.5,
    n_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    replayable: bool = False,
) -> DataFrame:
    """Corpus minus every document that near-duplicates a benchmark
    document — the quarantine step after ``minhash_lsh_join`` finds
    train/eval overlaps.  Returns the surviving corpus ids (anti-join on
    the contamination hits; linear + bucketed, never all-pairs)."""
    hits = minhash_lsh_join(
        corpus,
        benchmark,
        id_col=id_col,
        text_col=text_col,
        n_perm=n_perm,
        bands=bands,
        shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
        replayable=replayable,
    ).select(F.col("id_a").alias(id_col))
    return corpus.join(hits, id_col, "left_anti").select(id_col)
