"""Corpus sampling and sequence packing for training-data pipelines.

Two operations every large-scale pretraining pipeline needs that the
reference has no analog for (new capability, SURVEY.md §2.8 family):

* **Deterministic (stratified) sampling** — keep a fixed percentage of
  documents chosen by a hash of the document id, NOT by RNG: the same
  corpus always yields the same sample (resumable jobs, reproducible
  ablations), adding data never flips earlier keep/drop decisions, and
  the md5-derived hash replays exactly in the DuckDB oracle.
  ``stratified_sample`` varies the rate per language family (downsample
  the dominant language, keep the tail).
* **Sequence packing** — assign documents to fixed token-budget bins in
  global id order (``bin = floor(exclusive_prefix_tokens / budget)``),
  the sharding step that turns a cleaned corpus into trainer-sized
  chunks.  The semantics are a GLOBAL running sum, but the plan is not a
  single-partition window: a distributed prefix sum (range partition →
  per-partition totals, a driver-side exclusive scan over the handful of
  totals → per-partition window cumsum + offset) keeps every stage
  parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from osm_cut_spark.operators.dedup import h64_md5
from osm_cut_spark.operators.textstats import lang_id


def _keep_hash(id_col: str, salt: str):
    """Replayable per-document draw in [0, 100): md5-derived hash of the
    id string (+ salt for independent draws), mod 100.  DuckDB twin:
    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || salt),1,15) AS BIGINT) % 100."""
    return F.pmod(
        h64_md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), F.lit(100)
    )


def deterministic_sample(
    docs: DataFrame, keep_pct: int = 10, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ``keep_pct`` percent of documents by hashed id (no RNG).

    Stable under reprocessing and under corpus growth; different ``salt``
    values give independent draws.  Returns the sampled ids.
    """
    if not (0 <= keep_pct <= 100):
        raise ValueError("keep_pct must be in [0, 100]")
    return docs.filter(_keep_hash(id_col, salt) < F.lit(keep_pct)).select(id_col)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    default_pct: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Per-language-family sampling rates (percent), hashed-id draws.

    ``rates`` maps lang_id families (latin/cyrillic/cjk/unknown) to keep
    percentages; unlisted families keep ``default_pct``.  The standard
    corpus-balancing move: downsample the dominant family, keep the rest.
    Returns (id, lang_family).
    """
    for fam, pct in rates.items():
        if not (0 <= pct <= 100):
            raise ValueError(f"rate for {fam!r} must be in [0, 100]")
    lang = lang_id(docs, id_col, text_col).select(id_col, "lang_family")
    pct_col = F.lit(default_pct)
    for fam, pct in sorted(rates.items()):
        pct_col = F.when(F.col("lang_family") == fam, F.lit(pct)).otherwise(pct_col)
    # lang already carries exactly one row per doc id (it is derived from
    # docs itself) — filter it directly instead of a redundant self-join.
    return lang.filter(_keep_hash(id_col, salt) < pct_col).select(id_col, "lang_family")


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """Token-offset binning in global id order: (id, n_tokens, bin) with
    ``bin = floor(exclusive_prefix(n_tokens) / budget)`` — documents
    stream into fixed token-budget training shards deterministically.

    Physical plan (the scale-safe prefix sum — a naive single
    ``Window.orderBy`` would funnel the whole corpus through one task):

    1. range-partition by id and sort within partitions (global order =
       partition order ++ in-partition order), localCheckpoint so both
       consumers below see the SAME partition boundaries;
    2. per-partition token totals -> driver (one row per partition — a
       few hundred longs), exclusive scan there;
    3. in-partition window cumsum + the partition's offset (a literal
       map) -> global exclusive prefix, all partitions in parallel.

    The result is independent of the partition count (asserted in tests).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    from osm_cut_spark.session import spread_scan

    # tokenize runs BEFORE the range exchange (so the exchange carries one
    # long per row, not text) — spread an underpartitioned scan first or
    # that map-side tokenize serializes on the source's 1-2 tasks
    docs = spread_scan(docs, id_col)
    spark = docs.sparkSession
    # null text counts as 0 tokens (a null here would poison the driver-side
    # prefix scan and silently drop rows from partition totals)
    toks = F.coalesce(
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")),
        F.lit(0),
    )
    nparts = partitions or max(spark.sparkContext.defaultParallelism, 8)
    t = (
        docs.select(F.col(id_col), toks.alias("n_tokens"))
        .repartitionByRange(nparts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        # pin the (sampled, otherwise re-evaluation-dependent) range
        # boundaries: totals and the final projection MUST agree on them
        .localCheckpoint(eager=True)
    )
    totals = {
        r._pid: r.tot
        for r in t.groupBy("_pid").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    offs, acc = {}, 0
    for pid in sorted(totals):
        offs[pid] = acc
        acc += totals[pid]
    if not offs:
        return t.select(id_col, "n_tokens", F.lit(0).cast("long").alias("bin")).limit(0)
    off_map = F.create_map(
        *[lit for pid in sorted(offs) for lit in (F.lit(pid), F.lit(offs[pid]))]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.element_at(off_map, F.col("_pid")) + F.coalesce(
        F.sum("n_tokens").over(w), F.lit(0)
    )
    return t.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.floor(off / F.lit(budget)).cast("long").alias("bin"),
    )
