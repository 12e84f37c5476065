"""Structured Streaming surface.

The reference is a single-pass streaming program with bounded-queue
backpressure but no event-time semantics (SURVEY.md §2.6).  Correctness
of the cut never needs streaming — batch passes replace the mode machine —
so the streaming layer provides the two things a 100 TB deployment
actually wants:

* ``stream_extract_full`` — the FULL incremental cut: each microbatch
  appends node/way/completion selections and refreshes the relation
  selection over the accumulated relation table, per-table per-epoch
  IceLite commits (exactly-once under replay) — the streaming analog of
  the reference's one-pass pipeline for ALL element kinds
  (osm_process_complete.erl:86-190); ``read_incremental_cut`` exposes
  the consolidated phased keys in finish_extract's output-join shape;
* ``stream_extract`` — the simpler nodes-only variant (selection
  monitoring without way/relation maintenance);
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


def _append_once(tbl: IceLiteTable, df: DataFrame, epoch_id: int) -> None:
    """Append tagged with the epoch id, skipping if this table already
    committed the epoch — per-table exactly-once under microbatch replay
    (a restarted query re-runs the last epoch with the same id and data)."""
    if any(s["properties"].get("epoch") == epoch_id for s in tbl.snapshots()):
        return
    tbl.append(df, properties={"epoch": epoch_id})


def stream_extract_full(
    spark: SparkSession,
    docs_dir: str | Path,
    poly: PreparedPolygon,
    out_root: str | Path,
    complete: bool = True,
    cover: CellCover | None = None,
    checkpoint_dir: str | Path | None = None,
    max_files_per_trigger: int = 4,
    broadcast_max_keys: int = 50_000_000,
):
    """Full incremental cut: nodes, completion nodes, ways AND relations
    maintained per microbatch — the streaming analog of the reference's
    one-pass pipeline (osm_process_complete.erl:86-190), not just the node
    stage.

    Per epoch (batch = newly arrived document files, assumed to follow
    document stream order like the batch engine: a way's nodes and a
    relation's members do not arrive after it):

    * batch nodes -> PIP selection, APPENDED to ``nodes_sel`` (and the raw
      batch nodes to ``nodes_all`` in complete mode — completion lookups
      need the full accumulated node table);
    * batch ways -> semi-join against the ACCUMULATED selected-node ids
      (including this batch's), APPENDED to ``ways_sel`` with kept_nds
      (complete: full list; non-complete: the selected intersection —
      both stream-stable, so per-epoch commits are final);
    * complete mode: completion nodes of this batch's ways fetched from
      the accumulated node table, anti-joined against everything already
      selected/committed, APPENDED to ``comp_sel``;
    * relations: batch relations APPENDED to ``rels_all``, then the
      relation selection + member projection is REFRESHED over the whole
      accumulated relation table (relation selections are NOT
      epoch-stable: a parent relation can be pulled in by a member that
      arrives later, and complete-mode kept_m grows with the final set) —
      the refreshed (doc_id, offset, id, kept_m) OVERWRITES ``rels_sel``.
      The relation graph is <<1% of elements (SURVEY.md §2), so the
      per-epoch refresh is O(relations), not O(data).

    Every table commit is tagged with the epoch id and skipped on replay,
    so a restarted query (same Spark checkpoint dir) is exactly-once per
    table per epoch; ``rels_sel`` is refreshed last and doubles as the
    epoch completion marker.  Read the consolidated phased output with
    ``read_incremental_cut``.
    """
    if cover is None:
        cover = X.auto_cover(poly)
    root = Path(out_root)
    nodes_sel_tbl = IceLiteTable(root / "nodes_sel")
    nodes_all_tbl = IceLiteTable(root / "nodes_all")
    ways_sel_tbl = IceLiteTable(root / "ways_sel")
    comp_sel_tbl = IceLiteTable(root / "comp_sel")
    rels_all_tbl = IceLiteTable(root / "rels_all")
    rels_sel_tbl = IceLiteTable(root / "rels_sel")
    ckpt = str(checkpoint_dir or (root / "_stream_checkpoint"))

    def process_batch(batch_df: DataFrame, epoch_id: int):
        if any(
            s["properties"].get("epoch") == epoch_id for s in rels_sel_tbl.snapshots()
        ):
            return  # epoch fully committed before a restart
        narrow = ingest.parse_elements_narrow(batch_df).persist()
        try:
            nodes_b = narrow.filter(F.col("kind") == "node").select(
                "id", "lon", "lat", "doc_id", "offset"
            )
            ways_b = narrow.filter(F.col("kind") == "way").select(
                "id", "nds", "doc_id", "offset"
            )
            rels_b = narrow.filter(F.col("kind") == "relation").select(
                "id", "members", "doc_id", "offset"
            )

            sel_b = X.select_nodes(spark, nodes_b, poly, cover)
            _append_once(nodes_sel_tbl, sel_b.select("doc_id", "offset", "id"), epoch_id)
            if complete:
                _append_once(nodes_all_tbl, nodes_b, epoch_id)
            _append_once(rels_all_tbl, rels_b, epoch_id)

            sel_node_ids = (
                nodes_sel_tbl.read(spark).select(F.col("id").alias("node_id")).distinct()
            )
            ways_sel_b = X.select_ways(ways_b, sel_node_ids, complete)
            _append_once(
                ways_sel_tbl,
                ways_sel_b.select("doc_id", "offset", "id", "kept_nds"),
                epoch_id,
            )

            comp_ids = None
            if complete:
                comp_b = X.completion_nodes(
                    ways_sel_b, nodes_all_tbl.read(spark), sel_node_ids
                )
                if comp_sel_tbl.exists():
                    prev = comp_sel_tbl.read(spark).select(F.col("id").alias("node_id"))
                    comp_b = comp_b.join(
                        prev, comp_b.id == prev.node_id, "left_anti"
                    )
                _append_once(comp_sel_tbl, comp_b.select("doc_id", "offset", "id"), epoch_id)
                comp_ids = (
                    comp_sel_tbl.read(spark).select(F.col("id").alias("node_id")).distinct()
                )

            way_ids = (
                ways_sel_tbl.read(spark).select(F.col("id").alias("way_id")).distinct()
            )
            keys = X.base_key_df(sel_node_ids, comp_ids, way_ids).persist()
            n_keys = keys.count()
            rels_all = rels_all_tbl.read(spark)
            rel_out = X.relation_outputs(
                rels_all,
                keys,
                complete,
                broadcast_keys=n_keys
                <= X.broadcast_key_cap(spark, broadcast_max_keys),
            )
            refreshed = rel_out.join(
                rels_all.select("doc_id", "offset", "id"), ["doc_id", "offset"]
            ).select("doc_id", "offset", "id", "kept_m")
            rels_sel_tbl.overwrite(refreshed, properties={"epoch": epoch_id})
            keys.unpersist()
        finally:
            narrow.unpersist()

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(str(docs_dir))
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )


def read_incremental_cut(spark: SparkSession, out_root: str | Path) -> DataFrame:
    """Consolidated phased selection keys maintained by stream_extract_full:
    (phase, kind, id, doc_id, offset, kept_nds, kept_m) — the same shape
    finish_extract feeds its output join, so the wide span materialization
    composes unchanged on top of the streamed selections."""
    root = Path(out_root)
    null_nds = F.lit(None).cast("array<bigint>").alias("kept_nds")
    null_m = F.lit(None).cast("array<struct<type:string,ref:bigint>>").alias("kept_m")

    def keyed(tbl_name: str, phase: int, kind: str, extra: dict) -> DataFrame | None:
        tbl = IceLiteTable(root / tbl_name)
        if not tbl.exists():
            return None
        df = tbl.read(spark)
        return df.select(
            F.lit(phase).alias("phase"),
            F.lit(kind).alias("kind"),
            "id",
            "doc_id",
            "offset",
            extra.get("kept_nds", null_nds),
            extra.get("kept_m", null_m),
        )

    parts = [
        keyed("nodes_sel", X.PHASE_NODE, "node", {}),
        keyed("comp_sel", X.PHASE_COMPLETION, "node", {}),
        keyed("ways_sel", X.PHASE_WAY, "way", {"kept_nds": F.col("kept_nds")}),
        keyed(
            "rels_sel",
            X.PHASE_RELATION,
            "relation",
            {"kept_m": F.col("kept_m").cast("array<struct<type:string,ref:bigint>>")},
        ),
    ]
    parts = [p for p in parts if p is not None]
    if not parts:
        raise FileNotFoundError(f"no incremental-cut tables under {root}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
