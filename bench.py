#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline = the flagship polygon-cut extraction (complete + non-complete)
over a deterministic synthetic interleaved-docs table sized by sf, plus
the operator queries (PIP filter, semi-join, kNN, dedup, text stats) on
the driver-provided sf tables.

``--scaling`` re-runs the flagship at two parallelism levels (N=8 vs
4N=32 cores by default) in separate JVMs on the SAME cached input and
reports throughput + scaling efficiency (the sandbox stand-in for the
north rule's N vs 4N executor requirement); results also land in
BENCH/BASELINE.md via tools/update_baseline.py.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE_ROOT = Path(os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/osm_cut_bench_cache"))

DOCS_PER_SF = 200_000  # sf 1.0 => 200k docs (~1.6M nodes); sf 0.1 => 20k docs


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def docs_parquet(spark, sf: float) -> tuple[str, int]:
    """Generate-once-and-cache the synthetic docs table for this sf."""
    n_docs = max(200, int(DOCS_PER_SF * sf))
    path = CACHE_ROOT / f"docs_sf{sf}_n{n_docs}.parquet"
    if not path.exists():
        from osm_cut_spark.sources.docs import synthetic_docs_distributed

        df = synthetic_docs_distributed(spark, n_docs, partitions=max(CPUS, 8))
        df.write.mode("overwrite").parquet(str(path))
    return str(path), n_docs


def run_once(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry
    from osm_cut_spark.functions.geometry import prepare_polygon
    from osm_cut_spark.operators.extract import (
        auto_cover,
        extract,
        make_point_selector,
    )

    sf = sf_of(sf_dir)
    path, n_docs = docs_parquet(spark, sf)
    docs = spark.read.parquet(path)
    poly = prepare_polygon([("include", entry.TRIANGLE)])
    # per-polygon setup (cover + edge index + verdict broadcast) is built
    # ONCE per session — the bench measures steady-state routing, matching
    # how a multi-cut/streaming deployment amortizes it
    cover = auto_cover(poly)
    selector = make_point_selector(spark, poly, cover)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    rep_walls: dict[str, list[float]] = {}
    # min-of-N warm in-JVM reps per query: rep0 pays JIT/codegen/Python-
    # worker warmup on this noisy host (documented 3.5x single-shot
    # variance — see .claude/skills/verify/SKILL.md), so it is timed but
    # excluded; the recorded number is the min of the warm reps, the same
    # discipline flagship_main already uses.
    # 3 warm reps (not 2): warm-rep walls keep descending through rep ~4
    # on this host (C2 long tail — the r5 focused extract run read
    # 27.7/21.1/18.9 for its first three warm reps), so min-of-3 sits
    # measurably closer to steady state at ~1 extra minute of bench wall
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def timed(name, fn):
        # the FULL per-rep wall array (rep0 = warmup included) is published
        # alongside the min so a noisy host window is diagnosable from the
        # artifact alone (BENCH_r05 published 7-13x phantom regressions
        # that only builder-side same-code reruns could adjudicate)
        times = []
        for _ in range(reps + 1):  # +1 throwaway warmup rep
            t0 = time.perf_counter()
            fn()
            times.append(round(time.perf_counter() - t0, 3))
        rep_walls[name] = times
        timings[name] = round(min(times[1:]), 3)

    # warm the JVM/Arrow paths once with a tiny slice
    docs.limit(10).count()

    qs = entry.queries()

    # host-window drift sentinel: the SAME cheap query re-timed at the
    # start / middle / end of the run (2 raw walls each, no min) — if the
    # host degrades mid-run, the drift is visible inside the artifact
    sentinel: dict[str, list[float]] = {}

    def probe_sentinel(point: str):
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            noop(qs["token_stats"](spark, sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
        sentinel[point] = walls

    probe_sentinel("start")

    def run_extract(complete: bool, out: str, grouped: bool = False):
        res = extract(
            spark, docs, poly, complete=complete, cover=cover,
            doc_grouped_output=grouped, selector=selector,
        )
        noop(res.elements() if out == "elements" else res.documents())
        res.release()  # drop selection caches between runs (no accumulation)

    timed("extract_complete", lambda: run_extract(True, "elements"))
    timed("extract_noncomplete", lambda: run_extract(False, "elements"))
    timed("extract_documents_out", lambda: run_extract(False, "documents"))
    timed("extract_documents_out_grouped", lambda: run_extract(False, "documents", True))

    probe_sentinel("mid")

    for name in [
        "pip_node_filter",
        "way_semijoin",
        "completion_refs",
        "relation_closure",
        "knn_cosine",
        "window_topk",
        "exact_dedup",
        "minhash_pairs",
        "simhash_pairs",
        "token_stats",
        "repetition_stats",
        "boilerplate_ngrams",
        "raster_vector_join",
        "pack_sequences",
        "asof_join",
        "lookback_agg",
    ]:
        timed(name, lambda n=name: noop(qs[n](spark, sf_dir)))

    # contamination / batch-ANN benched on their PRODUCTION hash paths
    # (xxhash64 / Arrow matmul UDF) — the entry-query variants swap in the
    # md5-replayable or sequential-fold shapes purely for the oracle
    def bench_contamination():
        from pyspark.sql import functions as F

        from osm_cut_spark.operators.dedup import minhash_lsh_join

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        noop(
            minhash_lsh_join(
                d.filter(F.col("doc_id") % 7 != 0),
                d.filter(F.col("doc_id") % 7 == 0),
                jaccard_threshold=0.3,
                n_perm=16,
                bands=8,
            )
        )

    def bench_lsh_knn_join():
        from pyspark.sql import functions as F

        from osm_cut_spark.operators.simsearch import lsh_knn_join

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        noop(
            lsh_knn_join(
                spark,
                emb.filter(F.col("vec_id") >= 5),
                emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "qid"),
                k=5,
                n_planes=32,
                n_bands=16,
                dim=64,
            )
        )

    timed("contamination", bench_contamination)
    timed("lsh_knn_join", bench_lsh_knn_join)

    # knn_join at realistic spatial selectivity (res 10 ~ 0.35deg cells,
    # 5x5 disk); the entry-query variant uses a grid-covering disk purely
    # as the oracle exactness proof and would measure a brute-force join
    def bench_knn_join():
        from pyspark.sql import functions as F

        from osm_cut_spark.operators.knn import knn_join

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pts = li.select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pt_id"),
            ((F.col("l_orderkey") % 1500) / 100.0).alias("x"),
            ((F.col("l_partkey") % 1100) / 100.0).alias("y"),
        )
        q = pts.limit(200).select(
            F.col("pt_id").alias("qid"), F.col("x"), F.col("y")
        )
        noop(
            knn_join(spark, pts, q, k=5, res=10, radius=2,
                     id_col="pt_id", q_id_col="qid", lon_col="x", lat_col="y")
        )

    timed("knn_join", bench_knn_join)

    probe_sentinel("end")

    headline = timings["extract_complete"]
    return {
        "metric": "polygon_cut_extract_complete_wall",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "reps": rep_walls,
        "sentinel": {"query": "token_stats", **sentinel},
        "sf": sf,
        "n_docs": n_docs,
        "cpus": CPUS,
        "throughput_docs_per_sec": round(n_docs / headline, 1) if headline else None,
    }


SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "400000"))
STAR_VERTICES = int(os.environ.get("SPARK_GRAFT_STAR_VERTICES", "1000"))


def main():
    if "--scaling" in sys.argv:
        return scaling_main()
    if "--flagship" in sys.argv:
        return flagship_main(sys.argv[sys.argv.index("--flagship") + 1])
    if "--bucketed" in sys.argv:
        return bucketed_main()
    if "--dedup-scaling" in sys.argv:
        return dedup_scaling_main()
    if "--stream-dedup" in sys.argv:
        return stream_dedup_main()
    if "--dedup-worker" in sys.argv:
        return dedup_worker_main(sys.argv[sys.argv.index("--dedup-worker") + 1])
    from osm_cut_spark.session import get_session

    spark = get_session(app_name="osm_cut_bench", cpus=CPUS)
    result = run_once(spark, SF_DIR)
    print(json.dumps(result))


def _scaling_docs_path(spark=None) -> str:
    """Generate-once the large scaling input with the distributed (JVM)
    generator; cached parquet keyed by size."""
    path = CACHE_ROOT / f"scaling_docs_n{SCALING_DOCS}.parquet"
    if not path.exists():
        from osm_cut_spark.session import get_session
        from osm_cut_spark.sources.docs import synthetic_docs_distributed

        spark = spark or get_session(app_name="osm_cut_gen", cpus=CPUS)
        synthetic_docs_distributed(spark, SCALING_DOCS, partitions=64).write.mode(
            "overwrite"
        ).parquet(str(path))
    return str(path)


def flagship_main(docs_path: str):
    """Subprocess worker: min-of-N warm in-JVM reps of the flagship cut
    (rep0 pays JIT/codegen/Python-worker warmup on this noisy host — see
    .claude/skills/verify/SKILL.md — so it is timed but excluded)."""
    from osm_cut_spark.functions.geometry import prepare_polygon, star_polygon
    from osm_cut_spark.operators.extract import (
        auto_cover,
        extract,
        make_point_selector,
    )
    from osm_cut_spark.session import get_session

    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    spark = get_session(app_name="osm_cut_scaling", cpus=CPUS)
    docs = spark.read.parquet(docs_path)
    poly = prepare_polygon([("include", star_polygon(STAR_VERTICES))])
    cover = auto_cover(poly)
    selector = make_point_selector(spark, poly, cover)
    docs.limit(10).count()  # warm the scan path
    times = []
    for _ in range(reps + 1):  # +1 throwaway warmup rep
        t0 = time.perf_counter()
        res = extract(spark, docs, poly, complete=True, cover=cover, selector=selector)
        res.elements().write.format("noop").mode("overwrite").save()
        res.release()
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "wall_sec": min(times[1:]),
                "reps_sec": times,
                "cpus": CPUS,
                # count from the data, not the scaling env default
                "n_docs": docs.count(),
            }
        )
    )


def bucketed_main():
    """Measure the doc-grouped documents-out flagship on a doc_id-BUCKETED
    docs table vs the same data unbucketed — the end-to-end wall for the
    zero-wide-shuffle claim the plan test
    (test_doc_grouped_output_bucketed_no_wide_shuffle) pins structurally.
    The bucketed table build is one-time and excluded from the timings
    (at a 100 TB deployment the table already lives bucketed)."""
    from osm_cut_spark.functions.geometry import prepare_polygon, star_polygon
    from osm_cut_spark.operators.extract import (
        auto_cover,
        extract,
        make_point_selector,
    )
    from osm_cut_spark.session import get_session

    path = _scaling_docs_path()
    spark = get_session(
        app_name="osm_cut_bucketed",
        cpus=CPUS,
        extra_conf={"spark.sql.warehouse.dir": str(CACHE_ROOT / "warehouse")},
    )
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
    poly = prepare_polygon([("include", star_polygon(STAR_VERTICES))])
    cover = auto_cover(poly)
    selector = make_point_selector(spark, poly, cover)
    tbl = f"osm_cut_docs_bucketed_{SCALING_DOCS}"
    build = 0.0
    if not spark.catalog.tableExists(tbl):
        t0 = time.perf_counter()
        (
            spark.read.parquet(path)
            .write.bucketBy(64, "doc_id")
            .sortBy("doc_id")
            .option("path", str(CACHE_ROOT / tbl))
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        build = round(time.perf_counter() - t0, 3)

    def run(docs_df):
        docs_df.limit(10).count()
        times = []
        for _ in range(reps + 1):  # +1 throwaway warmup rep
            t0 = time.perf_counter()
            res = extract(
                spark, docs_df, poly, complete=False, cover=cover,
                doc_grouped_output=True, selector=selector,
            )
            res.documents().write.format("noop").mode("overwrite").save()
            res.release()
            times.append(round(time.perf_counter() - t0, 3))
        return times

    tb = run(spark.table(tbl))
    tu = run(spark.read.parquet(path))
    print(
        json.dumps(
            {
                "metric": "bucketed_docs_grouped_documents_out_wall",
                "value": min(tb[1:]),
                "unit": "sec",
                "queries": {"bucketed_sec": min(tb[1:]), "unbucketed_sec": min(tu[1:])},
                "reps": {"bucketed": tb, "unbucketed": tu},
                "n_docs": SCALING_DOCS,
                "cpus": CPUS,
                "star_vertices": STAR_VERTICES,
                "bucket_build_sec": build,
            }
        )
    )


DEDUP_DOCS = int(os.environ.get("SPARK_GRAFT_DEDUP_DOCS", "1000000"))


def _dedup_docs_path() -> str:
    """Generate-once a large synthetic TEXT corpus for the dedup-family
    scaling campaign: ~40-token word-salad docs, fully JVM-generated
    (spark.range + hash expressions, no Python), with ~5% near-dup pairs
    (doc_id % 20 == 1 shares its base text with doc_id - 1 plus one extra
    token) so the LSH banded exchanges carry realistic bucket collisions."""
    path = CACHE_ROOT / f"dedup_docs_n{DEDUP_DOCS}.parquet"
    if not path.exists():
        from pyspark.sql import functions as F

        from osm_cut_spark.session import get_session

        spark = get_session(app_name="osm_cut_dedup_gen", cpus=CPUS)
        base = F.when(
            F.col("doc_id") % 20 == 1, F.col("doc_id") - 1
        ).otherwise(F.col("doc_id"))
        text = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(base * 41 + i), F.lit(30000)).cast("string"),
                ),
            ),
        )
        tail = F.when(
            F.col("doc_id") % 20 == 1,
            F.concat(F.lit(" x"), F.col("doc_id").cast("string")),
        ).otherwise(F.lit(""))
        (
            spark.range(DEDUP_DOCS)
            .select(F.col("id").alias("doc_id"))
            .repartition(64)
            .withColumn("text", F.concat(text, tail))
            .write.mode("overwrite")
            .parquet(str(path))
        )
    return str(path)


def dedup_worker_main(docs_path: str):
    """Subprocess worker: min-of-N warm in-JVM reps of the dedup family
    (minhash_pairs + cross-corpus contamination join) on the big text
    corpus — the banded-exchange shuffle profile, no broadcast side."""
    from pyspark.sql import functions as F

    from osm_cut_spark.operators.dedup import minhash_lsh_join, minhash_lsh_pairs
    from osm_cut_spark.session import get_session

    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    spark = get_session(app_name="osm_cut_dedup_scaling", cpus=CPUS)
    docs = spark.read.parquet(docs_path)
    docs.limit(10).count()  # warm the scan path

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    jobs = {
        "minhash_pairs": lambda: noop(
            minhash_lsh_pairs(docs, n_perm=32, bands=8, jaccard_threshold=0.5)
        ),
        "contamination": lambda: noop(
            minhash_lsh_join(
                docs.filter(F.col("doc_id") % 7 != 0),
                docs.filter(F.col("doc_id") % 7 == 0),
                n_perm=16,
                bands=8,
                jaccard_threshold=0.3,
            )
        ),
    }
    out = {}
    for name, fn in jobs.items():
        times = []
        for _ in range(reps + 1):  # +1 throwaway warmup rep
            t0 = time.perf_counter()
            fn()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = times
    print(json.dumps({"cpus": CPUS, "n_docs": DEDUP_DOCS, "reps_sec": out}))


def dedup_scaling_main():
    """Dedup-family scaling campaign: the worker at two parallelism levels
    (default 8 vs 32 cores, override SPARK_GRAFT_SCALING_CORES) in fresh
    JVMs on the SAME cached corpus; reports per-query efficiency."""
    cores = [
        int(c) for c in os.environ.get("SPARK_GRAFT_SCALING_CORES", "8,32").split(",")
    ]
    path = _dedup_docs_path()
    out = {}
    for cpus in cores:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, __file__, "--dedup-worker", path],
            env=env,
            capture_output=True,
            text=True,
            timeout=7200,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"dedup worker at {cpus} cores produced no JSON")
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
    print(
        json.dumps(
            {
                "metric": f"dedup_scaling_efficiency_{lo}_to_{hi}_cores",
                "value": effs.get("minhash_pairs"),
                "unit": "ratio",
                "queries": walls,
                "efficiency": effs,
                "reps": reps_all,
                "n_docs": DEDUP_DOCS,
            }
        )
    )


STREAM_DEDUP_EPOCHS = int(os.environ.get("SPARK_GRAFT_STREAM_DEDUP_EPOCHS", "30"))
STREAM_DEDUP_BATCH = int(os.environ.get("SPARK_GRAFT_STREAM_DEDUP_BATCH", "2000"))


def stream_dedup_main():
    """Per-epoch wall of incremental streaming dedup while the kept-doc
    index grows ~N_EPOCHS x: drives _dedup_epoch directly (the epoch
    maintenance cost, no stream-source machinery) over consecutive
    slices of the cached dedup corpus, compacting on the production
    cadence.  Flat early-vs-late walls = per-epoch cost does not grow
    with the accumulated corpus (the claim the 12-epoch pytest pins
    structurally, quantified)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from osm_cut_spark.session import get_session
    from osm_cut_spark.sources.icelite import IceLiteTable
    from osm_cut_spark.streaming.dedup_stream import _dedup_epoch

    spark = get_session(app_name="osm_cut_stream_dedup_bench", cpus=CPUS)
    docs = spark.read.parquet(_dedup_docs_path())
    root = Path(tempfile.mkdtemp(prefix="stream_dedup_bench_"))
    tbls = [
        IceLiteTable(root / n)
        for n in ("dedup_index", "kept_sigs", "kept_docs", "dropped_docs")
    ]
    compact_every = 8
    walls = []
    try:
        for e in range(STREAM_DEDUP_EPOCHS):
            lo, hi = e * STREAM_DEDUP_BATCH, (e + 1) * STREAM_DEDUP_BATCH
            batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            t0 = time.perf_counter()
            _dedup_epoch(
                spark, batch, e, *tbls,
                id_col="doc_id", text_col="text", n_perm=32, bands=8,
                shingle_n=3, sig_match_frac=0.5, max_bucket=1000,
            )
            if (e + 1) % compact_every == 0:
                for t in tbls:
                    if t.exists() and len(t.current_snapshot()["data_dirs"]) > 1:
                        t.compact(spark, properties={"epoch": f"compact-{e}"})
                    if t.exists():
                        t.expire_snapshots(keep_last=4)
            walls.append(round(time.perf_counter() - t0, 3))
        kept = tbls[2].read(spark).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    k = 5
    first, last = walls[1 : 1 + k], walls[-k:]
    print(
        json.dumps(
            {
                "metric": "stream_dedup_epoch_wall_last5_mean",
                "value": round(sum(last) / k, 3),
                "unit": "sec",
                "queries": {
                    "epoch_first5_mean": round(sum(first) / k, 3),
                    "epoch_last5_mean": round(sum(last) / k, 3),
                },
                "walls": walls,
                "n_epochs": STREAM_DEDUP_EPOCHS,
                "batch_docs": STREAM_DEDUP_BATCH,
                "kept_docs_final": kept,
                "cpus": CPUS,
            }
        )
    )


def scaling_main():
    """Run the flagship at two parallelism levels (default N=8 vs 4N=32
    cores, override with SPARK_GRAFT_SCALING_CORES="a,b") in fresh JVMs on
    the SAME input — the sandbox stand-in for the north rule's N vs 4N
    executors.  Each level reports min-of-N warm in-JVM reps."""
    cores = [
        int(c) for c in os.environ.get("SPARK_GRAFT_SCALING_CORES", "8,32").split(",")
    ]
    path = _scaling_docs_path()
    out = {}
    for cpus in cores:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, __file__, "--flagship", path],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"flagship run at {cpus} cores produced no JSON")
        out[cpus] = json.loads(lines[-1])
    lo, hi = cores[0], cores[-1]
    t_lo, t_hi = out[lo]["wall_sec"], out[hi]["wall_sec"]
    thr_lo, thr_hi = SCALING_DOCS / t_lo, SCALING_DOCS / t_hi
    eff = (thr_hi / thr_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"scaling_efficiency_{lo}_to_{hi}_cores",
                "value": round(eff, 3),
                "unit": "ratio",
                "queries": {f"cores{c}_sec": out[c]["wall_sec"] for c in cores},
                "reps": {str(c): out[c]["reps_sec"] for c in cores},
                "sf": sf_of(SF_DIR),
                "n_docs": SCALING_DOCS,
                "star_vertices": STAR_VERTICES,
                "throughput_docs_per_sec": {
                    f"cores{c}": round(SCALING_DOCS / out[c]["wall_sec"], 1) for c in cores
                },
            }
        )
    )


if __name__ == "__main__":
    main()
