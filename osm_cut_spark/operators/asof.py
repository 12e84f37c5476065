"""Point-in-time (as-of) join.

For each left row, attach the most recent right row with
``right.time <= left.time`` (or strictly ``<`` with ``strict=True``)
within the same key — the standard feature-attachment join of
training-data pipelines (join each example to the latest prior state of
its user/document/source) and the temporal analog of the reference's
"latest visible object wins" output discipline.

Spark-first plan: NOT a range join (which explodes candidate pairs and
needs a cartesian-ish range predicate).  Both sides are tagged and
UNIONED, then ONE window per key ordered by (time, side-priority,
tiebreak) carries the last right payload forward (``F.last`` with
ignorenulls over an unbounded-preceding frame).  Physically that is a
single hash shuffle on the key + an in-partition sort — the same shape
as any windowed aggregation, linear in |left| + |right|, no pair
expansion, broadcast-free (both sides may be huge).  Per-key row counts
are the only skew concern (same contract as sessionize).

The right payload travels as ONE struct column, so the matched columns
are row-atomic by construction (independent per-column ignore-null
lasts could mix rows when a payload column is legitimately NULL).

Determinism: ties inside a key sort by (time, _pri, tiebreak) — all
non-null, identical in the DuckDB oracle's window ORDER BY, so both
engines pick the same row even with duplicate timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_LEFT_TB = 1 << 62  # left rows sort after any real right-row tiebreak


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    time_col: str,
    value_cols: list[str],
    tiebreak_col: str,
    strict: bool = False,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``value_cols`` of the latest
    matching right row (NULLs when no right row precedes it).

    ``tiebreak_col`` (a non-null INTEGRAL right column, e.g. an event id)
    makes duplicate (key, time) right rows resolve deterministically: the
    largest tiebreak wins.  Non-integral tiebreaks are rejected up front —
    the old silent cast-to-long turned e.g. a string id into NULL for
    every right row, making the pick among duplicate (key, time) rows
    nondeterministic instead of failing fast (round-6 ADVICE).  Rows with
    NULL ``time_col`` are excluded on both sides (their ordering is
    engine-specific).
    """
    tb_type = dict(right.dtypes).get(tiebreak_col)
    if tb_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"tiebreak_col {tiebreak_col!r} must be an integral column "
            f"(got {tb_type}); hash non-numeric tiebreaks to a long first "
            "(e.g. xxhash64) to keep the duplicate-(key, time) pick "
            "deterministic"
        )
    lcols = left.columns
    # side priority at equal time: inclusive -> right (0) visible to left
    # (1); strict -> right sorts after left (2) and is not visible
    r_pri = 2 if strict else 0
    l = (
        left.filter(F.col(time_col).isNotNull())
        .select(
            F.col(key_col).alias("_k"),
            F.col(time_col).alias("_t"),
            F.lit(1).alias("_pri"),
            F.lit(_LEFT_TB).alias("_tb"),
            F.struct(*lcols).alias("_lrow"),
            F.lit(None).cast(
                "struct<" + ", ".join(f"{c}: {dict(right.dtypes)[c]}" for c in value_cols) + ">"
            ).alias("_rrow"),
        )
    )
    r = (
        right.filter(F.col(time_col).isNotNull())
        .select(
            F.col(key_col).alias("_k"),
            F.col(time_col).alias("_t"),
            F.lit(r_pri).alias("_pri"),
            F.col(tiebreak_col).cast("long").alias("_tb"),
            F.lit(None).cast(
                "struct<" + ", ".join(f"{c}: {t}" for c, t in left.dtypes) + ">"
            ).alias("_lrow"),
            F.struct(*value_cols).alias("_rrow"),
        )
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_pri", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_m", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_pri") == 1)
    )
    out = [F.col(f"_lrow.{c}").alias(c) for c in lcols]
    out += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in value_cols]
    return matched.select(*out)


def lookback_agg(
    events: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    window_sec: int,
) -> DataFrame:
    """Rolling look-back features: for every event, the count and sum of
    the same key's ``value_col`` over the STRICT past ``window_sec``
    seconds — i.e. rows with order-key in [t - window_sec, t - 1], which
    excludes the current row AND any row sharing its exact second
    (leakage-free by construction: a feature computed at time t never
    sees t itself).

    Spark-first plan: a native RANGE frame over unix seconds — one hash
    shuffle on the key + in-partition sort, no self-join, no pair
    expansion (the naive formulation is a range self-join that explodes
    with events-per-window).  Sliding-frame aggregation is O(n) per key.
    Appends ``n_lookback`` / ``sum_lookback``; rows with NULL time are
    excluded (engine-specific ordering).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_timestamp(F.col(time_col)))
        .rangeBetween(-int(window_sec), -1)
    )
    return (
        events.filter(F.col(time_col).isNotNull())
        .withColumn("n_lookback", F.count(F.lit(1)).over(w))
        .withColumn("sum_lookback", F.sum(value_col).over(w))
    )
