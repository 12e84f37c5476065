#!/usr/bin/env python
"""Round-7 optimization measurement harness (bench.py stays FROZEN).

Modes:
  --plans OUTDIR SUFFIX      dump .explain("formatted") for every bench query
                             to OUTDIR/<query>_<SUFFIX>.txt
  --time q1,q2,...           noop-timed warm reps (SPARK_GRAFT_BENCH_REPS,
                             default 3 + 1 warmup) for a subset of queries at
                             $SPARK_GRAFT_SF_DIR; prints one JSON line
  --isolate-dedup            stage-by-stage timing of the dedup family
                             internals (shingle scan, hashing, sig, bucket,
                             pair gen, verify) at $SPARK_GRAFT_SF_DIR

Query names match bench.py (incl. extract_complete / extract_noncomplete /
extract_documents_out / extract_documents_out_grouped and the production
contamination / lsh_knn_join / knn_join variants).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def _bench_query_builders(spark):
    """Return {name: zero-arg builder -> DataFrame-or-action} mirroring
    bench.py's run_once query set (extract actions return None; they run
    their own noop internally)."""
    import bench as B
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from osm_cut_spark.functions.geometry import prepare_polygon
    from osm_cut_spark.operators.extract import auto_cover, extract, make_point_selector

    sf = B.sf_of(SF_DIR)
    path, _ = B.docs_parquet(spark, sf)
    docs = spark.read.parquet(path)
    poly = prepare_polygon([("include", entry.TRIANGLE)])
    cover = auto_cover(poly)
    selector = make_point_selector(spark, poly, cover)
    qs = entry.queries()

    def run_extract(complete, out, grouped=False):
        res = extract(spark, docs, poly, complete=complete, cover=cover,
                      doc_grouped_output=grouped, selector=selector)
        noop(res.elements() if out == "elements" else res.documents())
        res.release()

    def bench_contamination():
        from osm_cut_spark.operators.dedup import minhash_lsh_join

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        return minhash_lsh_join(
            d.filter(F.col("doc_id") % 7 != 0),
            d.filter(F.col("doc_id") % 7 == 0),
            jaccard_threshold=0.3, n_perm=16, bands=8,
        )

    def bench_lsh_knn_join():
        from osm_cut_spark.operators.simsearch import lsh_knn_join

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        return lsh_knn_join(
            spark,
            emb.filter(F.col("vec_id") >= 5),
            emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "qid"),
            k=5, n_planes=32, n_bands=16, dim=64,
        )

    def bench_knn_join():
        from osm_cut_spark.operators.knn import knn_join

        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        pts = li.select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pt_id"),
            ((F.col("l_orderkey") % 1500) / 100.0).alias("x"),
            ((F.col("l_partkey") % 1100) / 100.0).alias("y"),
        )
        q = pts.limit(200).select(F.col("pt_id").alias("qid"), "x", "y")
        return knn_join(spark, pts, q, k=5, res=10, radius=2,
                        id_col="pt_id", q_id_col="qid", lon_col="x", lat_col="y")

    builders = {}
    builders["extract_complete"] = lambda: run_extract(True, "elements")
    builders["extract_noncomplete"] = lambda: run_extract(False, "elements")
    builders["extract_documents_out"] = lambda: run_extract(False, "documents")
    builders["extract_documents_out_grouped"] = lambda: run_extract(False, "documents", True)
    for name in [
        "pip_node_filter", "way_semijoin", "completion_refs", "relation_closure",
        "knn_cosine", "window_topk", "exact_dedup", "minhash_pairs",
        "simhash_pairs", "token_stats", "repetition_stats", "boilerplate_ngrams",
        "raster_vector_join", "pack_sequences", "asof_join", "lookback_agg",
    ]:
        builders[name] = (lambda n=name: qs[n](spark, SF_DIR))
    builders["contamination"] = bench_contamination
    builders["lsh_knn_join"] = bench_lsh_knn_join
    builders["knn_join"] = bench_knn_join
    return builders


def plans_main(outdir: str, suffix: str):
    from osm_cut_spark.session import get_session

    spark = get_session(app_name="osm_cut_plans", cpus=CPUS)
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    builders = _bench_query_builders(spark)
    import bench as B
    import __spark_entry__ as entry
    from osm_cut_spark.functions.geometry import prepare_polygon
    from osm_cut_spark.operators.extract import auto_cover, extract, make_point_selector

    sf = B.sf_of(SF_DIR)
    path, _ = B.docs_parquet(spark, sf)
    docs = spark.read.parquet(path)
    poly = prepare_polygon([("include", entry.TRIANGLE)])
    cover = auto_cover(poly)
    selector = make_point_selector(spark, poly, cover)

    def extract_df(complete, out_kind, grouped=False):
        res = extract(spark, docs, poly, complete=complete, cover=cover,
                      doc_grouped_output=grouped, selector=selector)
        return res.elements() if out_kind == "elements" else res.documents()

    plan_dfs = {
        "extract_complete": lambda: extract_df(True, "elements"),
        "extract_noncomplete": lambda: extract_df(False, "elements"),
        "extract_documents_out": lambda: extract_df(False, "documents"),
        "extract_documents_out_grouped": lambda: extract_df(False, "documents", True),
    }
    for name, fn in builders.items():
        if name.startswith("extract_"):
            fn = plan_dfs[name]
        try:
            df = fn()
            if df is None:
                continue
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            (out / f"{name}_{suffix}.txt").write_text(txt)
            print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
        except Exception as e:  # pragma: no cover
            print(f"PLAN FAIL {name}: {e}")


def time_main(names: list[str]):
    from osm_cut_spark.session import get_session

    spark = get_session(app_name="osm_cut_bench_extra", cpus=CPUS)
    builders = _bench_query_builders(spark)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10).count()
    out = {}
    for name in names:
        fn = builders[name]
        walls = []
        for _ in range(REPS + 1):
            t0 = time.perf_counter()
            r = fn()
            if r is not None:
                noop(r)
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min_warm": min(walls[1:]), "reps": walls}
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))


def isolate_extract_main():
    """Stage-by-stage cost of the flagship extract at $SPARK_GRAFT_SF_DIR's
    synthetic docs table: wide scan, narrow parse, selection phases, output
    join, document regroup — so the per-rep wall decomposes into the
    operator that actually owns it."""
    from pyspark.sql import functions as F

    import bench as B
    import __spark_entry__ as entry
    from osm_cut_spark.functions.geometry import prepare_polygon
    from osm_cut_spark.operators import ingest
    from osm_cut_spark.operators.extract import (
        auto_cover, extract, finish_extract, make_point_selector, select_ways,
    )
    from osm_cut_spark.session import get_session

    spark = get_session(app_name="osm_cut_isolate_extract", cpus=CPUS)
    sf = B.sf_of(SF_DIR)
    path, n_docs = B.docs_parquet(spark, sf)
    docs = spark.read.parquet(path)
    docs.limit(10).count()
    poly = prepare_polygon([("include", entry.TRIANGLE)])
    cover = auto_cover(poly)
    selector = make_point_selector(spark, poly, cover)

    stages = {}

    def timed(name, mk):
        walls = []
        for _ in range(REPS + 1):
            t0 = time.perf_counter()
            r = mk()
            if r is not None:
                noop(r)
            walls.append(round(time.perf_counter() - t0, 3))
        stages[name] = {"min_warm": min(walls[1:]), "reps": walls}
        print(f"{name}: {stages[name]}", file=sys.stderr)

    timed("wide_scan_only", lambda: docs)
    timed("narrow_parse", lambda: ingest.parse_elements_narrow(docs))
    timed("explode_elements_wide", lambda: ingest.explode_elements(docs))
    timed("passthrough_parse", lambda: ingest.parse_passthrough_spans(docs))

    def selection_only():
        narrow = ingest.parse_elements_narrow(docs).persist()
        narrow.count()
        nodes = narrow.filter(F.col("kind") == "node").select(
            "id", "lon", "lat", "doc_id", "offset")
        sel = selector(nodes.filter(F.col("id").isNotNull()))
        noop(sel)
        narrow.unpersist()

    def ways_sel_only(complete):
        narrow = ingest.parse_elements_narrow(docs).persist()
        narrow.count()
        nodes = narrow.filter(F.col("kind") == "node").select(
            "id", "lon", "lat", "doc_id", "offset")
        ways = narrow.filter(F.col("kind") == "way").select(
            "id", "nds", "doc_id", "offset")
        sel = selector(nodes.filter(F.col("id").isNotNull())).persist()
        sel.count()
        ids = sel.select(F.col("id").alias("node_id")).distinct()
        noop(select_ways(ways, ids, complete))
        sel.unpersist(); narrow.unpersist()

    timed("selection_nodes", selection_only)
    timed("plus_ways_sel_complete", lambda: ways_sel_only(True))

    def full(complete, out, grouped=False):
        res = extract(spark, docs, poly, complete=complete, cover=cover,
                      doc_grouped_output=grouped, selector=selector)
        noop(res.elements() if out == "elements" else res.documents())
        res.release()

    # selection through relations but output = slim keys only (no wide join):
    def no_output(complete):
        res = extract(spark, docs, poly, complete=complete, cover=cover,
                      selector=selector)
        noop(res.all_elements.select("doc_id", "offset", "phase"))
        res.release()

    timed("extract_complete_slimout", lambda: no_output(True))
    timed("extract_noncomplete_slimout", lambda: no_output(False))
    timed("extract_complete_full", lambda: full(True, "elements"))
    timed("extract_noncomplete_full", lambda: full(False, "elements"))
    timed("extract_documents_out_full", lambda: full(False, "documents"))
    timed("extract_documents_grouped_full", lambda: full(False, "documents", True))
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "n_docs": n_docs,
                      "stages": stages}))


def isolate_dedup_main():
    """Stage-by-stage cost of the dedup family on the sf documents table."""
    from pyspark.sql import functions as F

    from osm_cut_spark.operators import dedup as D
    from osm_cut_spark.session import get_session

    spark = get_session(app_name="osm_cut_isolate", cpus=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.limit(10).count()
    n_perm, bands = 16, 8
    rpb = n_perm // bands

    stages = {}

    def timed(name, mk):
        walls = []
        for _ in range(REPS + 1):
            t0 = time.perf_counter()
            noop(mk())
            walls.append(round(time.perf_counter() - t0, 3))
        stages[name] = {"min_warm": min(walls[1:]), "reps": walls}
        print(f"{name}: {stages[name]}", file=sys.stderr)

    def sh_df():
        return docs.select(F.col("doc_id").alias("_id"), D.shingles(3).alias("sh"))

    def hs_df(replayable):
        return sh_df().select("_id", D.base_hashes(F.col("sh"), replayable).alias("hs"))

    def sig_df(replayable):
        return hs_df(replayable).select(
            "_id", D.minhash_sig_from_hashes(F.col("hs"), n_perm).alias("sig"))

    def banded_df(replayable):
        return sig_df(replayable).select(
            "_id", F.explode(D.band_buckets(F.col("sig"), bands, rpb, replayable)).alias("bucket"))

    # tokenization / shingling / hashing ladder (replayable = md5 oracle hash)
    timed("scan_text_only", lambda: docs.select("doc_id", F.length("text")))
    timed("tokens_only", lambda: docs.select("doc_id", D.normalize_tokens().alias("t")))
    timed("shingles_only", sh_df)
    timed("hashes_md5", lambda: hs_df(True))
    timed("hashes_xx", lambda: hs_df(False))
    timed("sig_md5", lambda: sig_df(True))
    timed("banded_md5", lambda: banded_df(True))
    timed("minhash_pairs_full_md5", lambda: D.minhash_lsh_pairs(
        docs, jaccard_threshold=0.3, n_perm=16, bands=8, replayable=True))
    timed("minhash_pairs_full_xx", lambda: D.minhash_lsh_pairs(
        docs, jaccard_threshold=0.3, n_perm=16, bands=8, replayable=False))

    # simhash ladder
    timed("grams1_md5_hashes", lambda: docs.select(
        F.col("doc_id").alias("_id"),
        F.transform(D._gram_col("text", 2), lambda t: D.h64_md5(t)).alias("hashes")))
    timed("simhash_docs_md5", lambda: D.simhash_docs(docs, replayable=True))
    timed("simhash_pairs_full_md5", lambda: D.simhash_dup_pairs(
        docs, max_hamming=6, replayable=True))

    # contamination (production xxhash) ladder
    def contam():
        return D.minhash_lsh_join(
            docs.filter(F.col("doc_id") % 7 != 0),
            docs.filter(F.col("doc_id") % 7 == 0),
            jaccard_threshold=0.3, n_perm=16, bands=8)

    timed("contamination_full_xx", contam)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "stages": stages}))


TEMPORAL_EVENTS = int(os.environ.get("SPARK_GRAFT_TEMPORAL_EVENTS", "2000000"))


def _temporal_events_path() -> str:
    """Generate-once a large synthetic event table for the temporal-family
    scaling campaign: TEMPORAL_EVENTS rows over ~EVENTS/100 keys (so window
    partitions hold ~100 rows), JVM-generated, deterministic."""
    from pathlib import Path as P

    import bench as B

    path = B.CACHE_ROOT / f"temporal_events_n{TEMPORAL_EVENTS}.parquet"
    if not path.exists():
        from pyspark.sql import functions as F

        from osm_cut_spark.session import get_session

        spark = get_session(app_name="osm_cut_temporal_gen", cpus=CPUS)
        n_keys = max(1000, TEMPORAL_EVENTS // 100)
        (
            spark.range(TEMPORAL_EVENTS)
            .repartition(64)
            .select(
                F.col("id").alias("event_id"),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_keys)).alias("user_id"),
                F.timestamp_seconds(
                    F.lit(1_600_000_000) + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(86_400 * 30))
                ).alias("ts"),
                (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000)) / 100.0).alias("amount"),
            )
            .write.mode("overwrite")
            .parquet(str(path))
        )
    return str(path)


def temporal_worker_main(events_path: str):
    """Subprocess worker: min-of-N warm reps of asof_join + lookback_agg on
    the big event table (the window-sort shuffle profile — one hash
    exchange + in-partition sort per query, no broadcast side)."""
    from pyspark.sql import functions as F

    from osm_cut_spark.operators.asof import asof_join, lookback_agg
    from osm_cut_spark.session import get_session

    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    spark = get_session(app_name="osm_cut_temporal_scaling", cpus=CPUS)
    ev = spark.read.parquet(events_path)
    # right side = every 10th event as a "state update" stream
    st = ev.filter(F.col("event_id") % 10 == 0).select(
        "user_id", "ts", F.col("amount").alias("state_val"), "event_id"
    )
    ev.limit(10).count()

    jobs = {
        "asof_join": lambda: noop(
            asof_join(ev, st, "user_id", "ts", ["state_val", "event_id"], "event_id")
        ),
        "lookback_agg": lambda: noop(
            lookback_agg(ev, "user_id", "ts", "amount", window_sec=3600)
        ),
    }
    out = {}
    for name, fn in jobs.items():
        times = []
        for _ in range(reps + 1):
            t0 = time.perf_counter()
            fn()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = times
    print(json.dumps({"cpus": CPUS, "n_events": TEMPORAL_EVENTS, "reps_sec": out}))


def temporal_scaling_main():
    """Temporal-family scaling campaign (round-6 VERDICT #7): asof_join +
    lookback_agg at two parallelism levels in fresh JVMs on the SAME cached
    events — the window-sort shuffle profile, distinct from both the
    broadcast-heavy flagship and the banded dedup family."""
    import subprocess

    cores = [
        int(c) for c in os.environ.get("SPARK_GRAFT_SCALING_CORES", "8,32").split(",")
    ]
    path = _temporal_events_path()
    out = {}
    for cpus in cores:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, __file__, "--temporal-worker", path],
            env=env, capture_output=True, text=True, timeout=7200,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"temporal worker at {cpus} cores produced no JSON")
        out[cpus] = json.loads(lines[-1])
    lo, hi = cores[0], cores[-1]
    effs, walls, reps_all = {}, {}, {}
    for q in out[lo]["reps_sec"]:
        t_lo = min(out[lo]["reps_sec"][q][1:])
        t_hi = min(out[hi]["reps_sec"][q][1:])
        effs[q] = round((t_lo / t_hi) / (hi / lo), 3)
        walls[f"{q}_cores{lo}_sec"] = t_lo
        walls[f"{q}_cores{hi}_sec"] = t_hi
        reps_all[q] = {str(c): out[c]["reps_sec"][q] for c in cores}
    print(json.dumps({
        "metric": f"temporal_scaling_efficiency_{lo}_to_{hi}_cores",
        "value": effs.get("asof_join"),
        "unit": "ratio",
        "queries": walls,
        "efficiency": effs,
        "reps": reps_all,
        "n_events": TEMPORAL_EVENTS,
    }))


if __name__ == "__main__":
    if "--plans" in sys.argv:
        i = sys.argv.index("--plans")
        plans_main(sys.argv[i + 1], sys.argv[i + 2])
    elif "--time" in sys.argv:
        time_main(sys.argv[sys.argv.index("--time") + 1].split(","))
    elif "--isolate-dedup" in sys.argv:
        isolate_dedup_main()
    elif "--isolate-extract" in sys.argv:
        isolate_extract_main()
    elif "--temporal-scaling" in sys.argv:
        temporal_scaling_main()
    elif "--temporal-worker" in sys.argv:
        temporal_worker_main(sys.argv[sys.argv.index("--temporal-worker") + 1])
    else:
        print(__doc__)
