"""Structured Streaming surface.

The reference is a single-pass streaming program with bounded-queue
backpressure but no event-time semantics (SURVEY.md §2.6).  Correctness
of the cut never needs streaming — batch passes replace the mode machine —
so the streaming layer provides the two things a 100 TB deployment
actually wants:

* ``stream_extract`` — incremental ingestion: new document files landing
  in a directory are cut microbatch-by-microbatch via ``foreachBatch``;
  node selections append to an IceLite table (snapshot per microbatch =
  resumable, exactly-once per epoch via the epoch id property) — the
  streaming analog of the reference's one-pass pipeline;
* ``windowed_event_counts`` — watermarked event-time windowed aggregation
  over the events stream (late data handled by the watermark), the
  standard Structured Streaming pattern the reference has no answer to.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from osm_cut_spark.functions.cells import CellCover
from osm_cut_spark.functions.geometry import PreparedPolygon
from osm_cut_spark.operators import extract as X
from osm_cut_spark.operators import ingest
from osm_cut_spark.sources.docs import DOC_SCHEMA
from osm_cut_spark.sources.icelite import IceLiteTable


def stream_extract(
    spark: SparkSession,
    docs_dir: str | Path,
    poly: PreparedPolygon,
    out_root: str | Path,
    cover: CellCover | None = None,
    checkpoint_dir: str | Path | None = None,
):
    """Start a streaming query cutting node spans from arriving doc files.

    Returns the StreamingQuery; drive synchronously in tests with
    ``q.processAllAvailable()``.  Each microbatch commits one IceLite
    snapshot tagged with the epoch id, so a restarted query (same Spark
    checkpoint dir) never double-commits an epoch.
    """
    if cover is None:
        cover = X.auto_cover(poly)
    out_tbl = IceLiteTable(Path(out_root) / "nodes_stream")
    ckpt = str(checkpoint_dir or (Path(out_root) / "_stream_checkpoint"))

    def process_batch(batch_df: DataFrame, epoch_id: int):
        done = {
            s["properties"].get("epoch") for s in out_tbl.snapshots()
        }
        if epoch_id in done:
            return  # exactly-once per epoch on restart
        narrow = ingest.parse_elements_narrow(batch_df)
        nodes = narrow.filter(F.col("kind") == "node").select(
            "id", "lon", "lat", "doc_id", "offset"
        )
        sel = X.select_nodes(spark, nodes, poly, cover)
        out_tbl.append(sel, properties={"epoch": epoch_id})

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(str(docs_dir))
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked event-time windowed counts (works on batch or stream)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
