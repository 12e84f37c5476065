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
