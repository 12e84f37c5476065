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


def keep_best(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    jaccard_threshold: float = 0.5,
    n_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    replayable: bool = False,
) -> DataFrame:
    """Canonical-document selection after near-dup clustering: per cluster,
    the HIGHEST-quality member survives (deterministic tie-break: lowest
    id), singletons survive as their own cluster — the "which duplicate do
    we keep" step every pretraining cleanup runs after ``dup_clusters``
    (where min-id is the right *label*, it is rarely the right *survivor*).
    Reference-side analog: the final member projection keeps exactly one
    canonical object per selected entity (osm_process_complete.erl:253-257).

    Returns (cluster_id, doc_id, quality, n_members) — one row per cluster,
    doc_id = the surviving member.

    100 TB shape: quality is a narrow per-row projection; membership comes
    from ``dup_clusters`` (bounded label propagation over the SMALL pair
    set); the argmax is ONE partial-agg-friendly ``max(struct(quality,
    -id))`` aggregation keyed on cluster_id — no window sort, no
    per-cluster shuffle beyond the single groupBy.

    ``pairs``: prebuilt near-dup pairs (id_a, id_b); defaults to
    ``minhash_lsh_pairs(docs, ...)`` with the given LSH parameters.
    """
    if pairs is None:
        pairs = minhash_lsh_pairs(
            docs,
            id_col=id_col,
            text_col=text_col,
            n_perm=n_perm,
            bands=bands,
            shingle_n=shingle_n,
            jaccard_threshold=jaccard_threshold,
            replayable=replayable,
        )
    clusters = dup_clusters(pairs).withColumnRenamed("doc_id", id_col)
    q = quality_score(docs, id_col, text_col).select(id_col, "quality")
    membered = q.join(clusters, id_col, "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    # lexicographic struct max = argmax quality, ties -> max(-id) = min id
    return (
        membered.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(F.col("quality"), (-F.col(id_col)).alias("_negid"))
            ).alias("_b"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "cluster_id",
            (-F.col("_b._negid")).alias(id_col),
            F.col("_b.quality").alias("quality"),
            "n_members",
        )
    )


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
