"""kNN search operators.

Two layers, per the north star:

* ``knn_bruteforce`` — exact top-k cosine against one query vector,
  JVM-side (zip_with + aggregate fold, whole-stage codegen; sequential
  fold order matches DuckDB's list functions so oracle comparison is
  bit-stable).  The baseline and the oracle-checkable path.
* ``knn_points`` — spatial kNN over (lon, lat) node tables using the cell
  index: candidates from expanding cell disks (cell_disk, the geotree-less
  analog of H3 grid_disk), exact distance refine + window top-k.  Scales:
  the candidate join is an equi join on cell_id; ring expansion bounds the
  candidate set instead of a full cross product.

The reference has no kNN operator (SURVEY.md §2.8) — this is new
capability mandated by BASELINE.json.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

from osm_cut_spark.functions.cells import cell_disk, lonlat_to_cell, lonlat_to_grid, xy_to_cell



def const_partition(col_name: str):
    """Non-foldable always-zero partition key for post-limit(k) rank
    windows: the frame is <= k rows, so single-partition evaluation is the
    plan we WANT — but an EMPTY partition spec makes WindowExec warn on
    every run, and literal keys get constant-folded back to empty, so
    partition on a per-row expression that always evaluates to zero."""
    return F.pmod(F.xxhash64(col_name), F.lit(1))

def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(vec_col, query_vec: list[float]):
    """Cosine similarity column vs a literal query vector (JVM fold)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    a = F.transform(F.col(vec_col) if isinstance(vec_col, str) else vec_col, lambda x: x.cast("double"))
    return (_dot(a, q) / (_norm(a) * _norm(q))).alias("sim")


def knn_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity; deterministic tie-break on id.

    Returns (rank, <id_col>, sim). The global top-k is a TakeOrdered (no
    full sort materialization) — scales to any table size.
    """
    w = Window.partitionBy(const_partition(id_col)).orderBy(F.desc("sim"), F.col(id_col))
    return (
        embeddings.select(F.col(id_col), cosine_sim(vec_col, query_vec))
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", id_col, "sim")
    )


def knn_points(
    spark: SparkSession,
    points: DataFrame,
    query_lon: float,
    query_lat: float,
    k: int = 5,
    res: int = 7,
    max_rings: int = 8,
    id_col: str = "id",
) -> DataFrame:
    """Spatial kNN over a point table via cell-disk candidate expansion.

    Assumes ``points`` carries a ``cell_r{res}`` column (add one with
    extract.make_cell_udf).  Expands the Chebyshev disk around the query
    cell until >= k candidates are found (or ``max_rings``), then refines
    with exact planar distance + top-k.  Correct whenever the k-th
    neighbor lies within the expanded disk; callers can raise
    ``max_rings`` for sparse regions (planar-distance heuristic
    documented).  Returns FEWER than k rows when the table holds fewer
    than k points inside the maximum disk.  For many queries use
    ``knn_join`` (one equi-join, no per-query driver loop).

    The expansion radius is chosen with ONE aggregation job — per-ring
    candidate counts (ring = Chebyshev grid distance from the query
    cell, computed natively) cumulated on the driver — instead of the
    former per-ring ``limit(k).count()`` loop (up to ``max_rings``
    driver round-trips).  The final candidate filter still runs on the
    ``cell_r{res}`` column (``isin`` over the disk), so cell-partitioned
    layouts keep their partition pruning.
    """
    from osm_cut_spark.functions.cells_sql import _grid_col
    from osm_cut_spark.functions.cells import LAT_MAX, LAT_MIN, LON_MAX, LON_MIN

    if max_rings < 1:
        raise ValueError("max_rings must be >= 1")
    qcell = int(lonlat_to_cell(np.array([query_lon]), np.array([query_lat]), res)[0])
    qix, qiy = lonlat_to_grid(np.array([query_lon]), np.array([query_lat]), res)
    qix, qiy = int(qix[0]), int(qiy[0])
    cell_col = f"cell_r{res}"
    ring = F.greatest(
        F.abs(_grid_col(F.col("lon"), LON_MIN, LON_MAX, res) - F.lit(qix)),
        F.abs(_grid_col(F.col("lat"), LAT_MIN, LAT_MAX, res) - F.lit(qiy)),
    )
    counts = {
        r.ring: r.n
        for r in points.filter(ring <= max_rings)
        .groupBy(ring.alias("ring"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # minimum radius 1: the one-ring margin the original expansion always
    # kept (a k-full query cell can still miss a nearer cross-cell point)
    radius, cum = max_rings, counts.get(0, 0)
    for r in range(1, max_rings + 1):
        cum += counts.get(r, 0)
        if cum >= k:
            radius = r
            break
    disk = [int(c) for c in cell_disk(qcell, radius)]
    cand = points.filter(F.col(cell_col).isin(disk))
    dist = F.sqrt(
        (F.col("lon") - F.lit(query_lon)) ** 2 + (F.col("lat") - F.lit(query_lat)) ** 2
    ).alias("dist")
    w = Window.partitionBy(const_partition(id_col)).orderBy(F.asc("dist"), F.col(id_col))
    return (
        cand.select(F.col(id_col), "lon", "lat", dist)
        .orderBy(F.asc("dist"), F.col(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", id_col, "lon", "lat", "dist")
    )


def make_disk_udf(spark: SparkSession, res: int, radius: int):
    """Vectorized pandas UDF: (lon, lat) -> Chebyshev disk cell ids at
    ``res`` (one broadcasting batch; edge cells clip, so dedupe the array
    with array_distinct before exploding)."""
    offs = np.arange(-radius, radius + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs)
    dx, dy = dx.ravel(), dy.ravel()

    @F.pandas_udf(ArrayType(LongType()))
    def disk(lon: pd.Series, lat: pd.Series) -> pd.Series:
        x = lon.to_numpy(dtype=np.float64)
        y = lat.to_numpy(dtype=np.float64)
        ix, iy = lonlat_to_grid(x, y, res)
        n = np.int64(1) << np.int64(res)
        gx = np.clip(ix[:, None] + dx[None, :], 0, n - 1)
        gy = np.clip(iy[:, None] + dy[None, :], 0, n - 1)
        cells = xy_to_cell(gx, gy, res)
        return pd.Series(list(cells))

    return disk


def knn_join(
    spark: SparkSession,
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    res: int = 7,
    radius: int = 2,
    id_col: str = "id",
    q_id_col: str = "qid",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Batch kNN join: each query row gets its k nearest points.

    The distributed form of the kNN lookup (replaces ``knn_points``'s
    per-query driver loop when there are many queries): every query
    explodes its Chebyshev cell disk at ``res``; candidates come from ONE
    equi-join on the cell id (both sides shuffle-partitioned by cell — no
    cross product, AQE handles hot cells); exact squared-distance refine;
    per-query window top-k.  Correct whenever each query's k-th neighbor
    lies within its disk — pick (res, radius) so the disk spans the search
    horizon; radius covering the whole grid degrades gracefully to exact
    brute force.

    Returns (qid, id, rn) with rn in [1, k] ordered by planar distance,
    ties broken on point id.  Queries whose disk holds fewer than k points
    return fewer rows.
    """
    disk = make_disk_udf(spark, res, radius)
    q = queries.select(
        F.col(q_id_col).alias("_qid"),
        F.col(lon_col).alias("_qx"),
        F.col(lat_col).alias("_qy"),
        F.explode(F.array_distinct(disk(F.col(lon_col), F.col(lat_col)))).alias("_cell"),
    )
    from osm_cut_spark.functions.cells_sql import cell_col

    pts = points.select(
        F.col(id_col).alias("_pid"),
        F.col(lon_col).alias("_px"),
        F.col(lat_col).alias("_py"),
        cell_col(F.col(lon_col), F.col(lat_col), res).alias("_cell"),
    )
    dx = F.col("_px") - F.col("_qx")
    dy = F.col("_py") - F.col("_qy")
    d2 = (dx * dx + dy * dy).alias("_d2")
    w = Window.partitionBy("_qid").orderBy(F.asc("_d2"), F.asc("_pid"))
    return (
        q.join(pts, "_cell")
        .select("_qid", "_pid", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("_qid").alias(q_id_col),
            F.col("_pid").alias(id_col),
            F.col("rn"),
        )
    )
