#!/usr/bin/env python
"""One-off r07 probe: time the extract() action chain cumulatively
(narrow fill -> selection fill -> keys fill -> closure -> rel_out -> output)
so the per-action overhead is visible.  Not part of the bench contract.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import bench as B
import __spark_entry__ as entry
from osm_cut_spark.functions.geometry import prepare_polygon
from osm_cut_spark.operators import ingest
from osm_cut_spark.operators.extract import (
    auto_cover, base_key_df, broadcast_key_cap, completion_nodes,
    make_point_selector, relation_closure_complete, relation_outputs,
    select_ways,
)
from osm_cut_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

spark = get_session(app_name="osm_cut_chain", cpus=CPUS)
sf = B.sf_of(SF_DIR)
path, n_docs = B.docs_parquet(spark, sf)
docs = spark.read.parquet(path)
docs.limit(10).count()
poly = prepare_polygon([("include", entry.TRIANGLE)])
cover = auto_cover(poly)
selector = make_point_selector(spark, poly, cover)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def chain(upto: int, complete: bool = True):
    t = {}
    t0 = time.perf_counter()

    def mark(name):
        t[name] = round(time.perf_counter() - t0, 3)

    caches = []
    narrow = ingest.parse_elements_narrow(docs, True).persist()
    caches.append(narrow)
    narrow.count()
    mark("1_narrow_fill")
    if upto >= 2:
        nodes = narrow.filter(F.col("kind") == "node").select("id", "lon", "lat", "doc_id", "offset")
        ways = narrow.filter(F.col("kind") == "way").select("id", "nds", "doc_id", "offset")
        relations = narrow.filter(F.col("kind") == "relation").select("id", "members", "doc_id", "offset")
        nodes_sel = selector(nodes.filter(F.col("id").isNotNull())).persist()
        caches.append(nodes_sel)
        nodes_sel.count()
        mark("2_nodes_sel_fill")
    if upto >= 3:
        sel_node_ids = nodes_sel.select(F.col("id").alias("node_id")).distinct().persist()
        ways_sel = select_ways(ways, sel_node_ids, complete).persist()
        way_ids = ways_sel.select(F.col("id").alias("way_id")).distinct().persist()
        caches += [sel_node_ids, ways_sel, way_ids]
        comp_ids = None
        if complete:
            comp = completion_nodes(ways_sel, nodes, sel_node_ids).persist()
            comp_ids = comp.select(F.col("id").alias("node_id")).distinct().persist()
            caches += [comp, comp_ids]
        keys = base_key_df(sel_node_ids, comp_ids, way_ids).persist()
        caches.append(keys)
        n_keys = keys.count()
        mark("3_keys_fill")
    if upto == 4:
        bcast = n_keys <= broadcast_key_cap(spark, 50_000_000)
        sel_rel, seeds = relation_closure_complete(relations, keys, caches=caches, broadcast_keys=bcast)
        noop(sel_rel)
        mark("4_closure_noop")
    if upto == 5:
        bcast = n_keys <= broadcast_key_cap(spark, 50_000_000)
        rel_out = relation_outputs(relations, keys, complete, caches=caches, broadcast_keys=bcast)
        noop(rel_out)
        mark("5_rel_out_noop")
    for c in caches:
        try:
            c.unpersist()
        except Exception:
            pass
    return t


for upto in (1, 2, 3, 4, 5):
    results = []
    for _ in range(REPS):
        results.append(chain(upto))
    best = min(results, key=lambda d: max(d.values()))
    print(f"upto={upto}: {best}", flush=True)
