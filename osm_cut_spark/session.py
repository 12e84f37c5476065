"""SparkSession factory with engine-tuned defaults.

Centralizes every config knob the engine depends on so tests, the driver
contract (__spark_entry__.py) and bench.py all run under identical
semantics: AQE (runtime re-planning + skew-join backstop), Arrow-batched
Python exchange, UTC session time (for DuckDB oracle comparison), and a
shuffle-partition count sized to the local core count rather than the
200-partition default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "osm_cut_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster the master/conf come from spark-submit and these local-mode
    settings are inert.
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cpus = int(env) if env else (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, int(cpus) * 2)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # local mode: the driver JVM hosts every executor thread — size the
        # heap to the thread count or 32 threads thrash GC inside 8g
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", f"{max(8, min(32, int(cpus)))}g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread_scan(df, key_col: str | None = None, min_factor: int = 2, target_factor: int = 2):
    """Scale-adaptive read-side parallelism (optimization-guide §2.5,
    "input skew: one huge unsplittable file ... repartition immediately
    after the read").

    When the planned partition count of ``df`` is far below the session's
    core count — the tiny-file / single-row-group corpus case, where every
    narrow per-row stage would otherwise run on 1-2 cores — repartition to
    ``target_factor * cores``.  A well-partitioned source (the 100 TB
    deployment, where scans plan orders of magnitude more splits than
    cores) passes through untouched, so this is adaptive, not a local-mode
    constant: the trigger condition compares the *input's* parallelism to
    the *session's*, both of which scale.

    ``key_col`` selects hash partitioning (no sort-before-repartition
    pass, deterministic under retries); without it a round-robin
    repartition is used.  The ``.rdd`` partition probe only plans the
    scan — no job is launched.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if nparts * min_factor <= cores:
        n = cores * target_factor
        return df.repartition(n, F.col(key_col)) if key_col else df.repartition(n)
    return df


def observed_metrics(observation, *names: str) -> dict[str, int | float | None]:
    """Read metrics from a pyspark ``Observation`` after an action.

    Works around a defect in this PySpark build where ``Observation.get``
    dies converting the JVM result (``toPyRow`` assertion: the Scala side
    returns a ``Map[String, Any]``, not a Row).  Reads the map directly
    over py4j instead — same blocking semantics as ``get`` (the JVM call
    waits for the action's QueryExecution listener).

    AQE caveat (measured in this build): a CollectMetrics node BELOW a
    shuffle-exchange boundary loses its metrics under AQE (the map comes
    back empty) — only observe at the TOP of a plan, or on plans with no
    exchange above the observed node.  Operators that need mid-plan
    observability (the capped LSH family) therefore expose lazy metrics
    DataFrames instead.
    """
    jmap = observation._jo.get()
    return {n: jmap.apply(n) for n in names}
