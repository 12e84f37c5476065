"""stream_extract_full: the FULL incremental cut (nodes, completion
nodes, ways, relations) maintained per microbatch — the streaming analog
of osm_process_complete.erl:86-190, not just the node stage.

Golden: two-batch arrival of the reference fixture (nodes in batch 0,
ways + relations in batch 1) must reproduce the 8-element complete-mode
golden, including kept node lists and kept member sets; a restarted
query on the same checkpoint must not duplicate or change anything.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import pytest

from osm_cut_spark.functions.cells import polygon_cell_cover
from osm_cut_spark.operators.extract import extract
from osm_cut_spark.sources.docs import doc_rows_to_spark, elements_to_doc_rows
from osm_cut_spark.sources.osm_xml import load_osm_xml
from osm_cut_spark.sources.poly import compile_poly

FIXTURE_OSM = "/root/reference/test/processor_SUITE_data/osm/1.osm"
FIXTURE_POLY = "/root/reference/test/processor_SUITE_data/poly/simple.poly"


def _emit_file(df, stage_dir: Path, src: Path, name: str, mtime: float) -> None:
    """Write one single-file parquet batch into the stream source dir with a
    controlled mtime (the file source processes oldest-first)."""
    df.coalesce(1).write.mode("overwrite").parquet(str(stage_dir / name))
    part = next((stage_dir / name).glob("part-*.parquet"))
    dst = src / f"{name}.parquet"
    shutil.copy(part, dst)
    os.utime(dst, (mtime, mtime))


def test_stream_extract_full_two_batch_golden_and_restart(spark, tmp_path):
    from osm_cut_spark.sources.icelite import IceLiteTable
    from osm_cut_spark.streaming.ingest_stream import (
        read_incremental_cut,
        stream_extract_full,
    )

    els = load_osm_xml(FIXTURE_OSM)
    poly = compile_poly(FIXTURE_POLY)
    cover = polygon_cell_cover(poly)
    rows = elements_to_doc_rows(els, 3)  # 12 elements -> 4 docs of 3
    assert len(rows) == 4

    src = tmp_path / "docs_in"
    src.mkdir()
    stage = tmp_path / "stage"
    now = 1_700_000_000.0
    # batch 0 = the node documents, batch 1 = the way/relation documents
    _emit_file(doc_rows_to_spark(spark, rows[:2]), stage, src, "b0", now)
    _emit_file(doc_rows_to_spark(spark, rows[2:]), stage, src, "b1", now + 10)

    out = tmp_path / "cut_out"
    q = stream_extract_full(
        spark, src, poly, out, complete=True, cover=cover, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # one epoch per file, committed exactly once per table
    epochs = [
        s["properties"]["epoch"] for s in IceLiteTable(out / "nodes_sel").snapshots()
    ]
    assert len(epochs) == len(set(epochs)) == 2

    inc = read_incremental_cut(spark, out)
    got = sorted((r.phase, r.kind, r.id) for r in inc.collect())

    docs_all = doc_rows_to_spark(spark, rows)
    batch = extract(spark, docs_all, poly, complete=True, cover=cover)
    want = sorted((r.phase, r.kind, r.id) for r in batch.elements().collect())
    batch.release()
    assert got == want
    assert [(k, i) for _, k, i in got] == [
        ("node", 1),
        ("node", 2),
        ("node", 3),
        ("node", 4),  # completion
        ("way", 1),
        ("relation", 1),
        ("relation", 2),
        ("relation", 4),  # closure
    ]

    # kept node list (complete mode keeps the FULL list) and member sets
    ways = {r.id: list(r.kept_nds) for r in inc.filter("phase = 2").collect()}
    assert ways == {1: [1, 2, 3, 4, 1]}
    rels = {
        r.id: sorted((m.type, m.ref) for m in r.kept_m)
        for r in inc.filter("phase = 3").collect()
    }
    assert rels == {1: [("way", 1)], 2: [("node", 4)], 4: [("relation", 2)]}

    # restart on the same checkpoint: nothing reprocessed, nothing duplicated
    q2 = stream_extract_full(
        spark, src, poly, out, complete=True, cover=cover, max_files_per_trigger=1
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    inc2 = read_incremental_cut(spark, out)
    assert sorted((r.phase, r.kind, r.id) for r in inc2.collect()) == got
    epochs2 = [
        s["properties"]["epoch"] for s in IceLiteTable(out / "nodes_sel").snapshots()
    ]
    assert epochs2 == epochs


def test_stream_extract_full_non_complete(spark, tmp_path):
    """Non-complete mode streams too: stream-order relation selection and
    projected (intersection) kept node lists, equal to the batch engine."""
    from osm_cut_spark.streaming.ingest_stream import (
        read_incremental_cut,
        stream_extract_full,
    )

    els = load_osm_xml(FIXTURE_OSM)
    poly = compile_poly(FIXTURE_POLY)
    cover = polygon_cell_cover(poly)
    rows = elements_to_doc_rows(els, 3)

    src = tmp_path / "docs_in"
    src.mkdir()
    stage = tmp_path / "stage"
    now = 1_700_000_000.0
    _emit_file(doc_rows_to_spark(spark, rows[:2]), stage, src, "b0", now)
    _emit_file(doc_rows_to_spark(spark, rows[2:]), stage, src, "b1", now + 10)

    out = tmp_path / "cut_out_nc"
    q = stream_extract_full(
        spark, src, poly, out, complete=False, cover=cover, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    inc = read_incremental_cut(spark, out)
    got = sorted((r.phase, r.kind, r.id) for r in inc.collect())
    docs_all = doc_rows_to_spark(spark, rows)
    batch = extract(spark, docs_all, poly, complete=False, cover=cover)
    want = sorted((r.phase, r.kind, r.id) for r in batch.elements().collect())
    batch.release()
    assert got == want
    ways = {r.id: list(r.kept_nds) for r in inc.filter("phase = 2").collect()}
    assert ways == {1: [1, 2, 3, 1]}  # projected intersection, original order
