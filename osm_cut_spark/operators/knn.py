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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from osm_cut_spark.functions.cells import cell_disk, lonlat_to_cell


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
    w = Window.orderBy(F.desc("sim"), F.col(id_col))
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
    ``max_rings`` for sparse regions (planar-distance heuristic documented).
    """
    import numpy as np

    qcell = int(lonlat_to_cell(np.array([query_lon]), np.array([query_lat]), res)[0])
    cell_col = f"cell_r{res}"
    for radius in range(1, max_rings + 1):
        disk = [int(c) for c in cell_disk(qcell, radius)]
        cand = points.filter(F.col(cell_col).isin(disk))
        if cand.limit(k).count() >= k:
            break
    dist = F.sqrt(
        (F.col("lon") - F.lit(query_lon)) ** 2 + (F.col("lat") - F.lit(query_lat)) ** 2
    ).alias("dist")
    w = Window.orderBy(F.asc("dist"), F.col(id_col))
    return (
        cand.select(F.col(id_col), "lon", "lat", dist)
        .orderBy(F.asc("dist"), F.col(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", id_col, "lon", "lat", "dist")
    )
