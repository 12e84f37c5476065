"""Raster-tile <-> vector-way joins with explicit skew handling.

North-star capability (no counterpart in the reference, SURVEY.md §2.8):
join a raster tile table keyed by cell id against vector ways whose
geometry touches those cells.

* way->cell assignment: way node refs joined to node coords, coords
  assigned to cells by the vectorized cell UDF, distinct (way, cell)
  pairs — an equi-joinable "vector coverage" table;
* the tile join is a plain cell-keyed equi join, but dense metro cells
  are pathologically hot; ``salted_join`` splits hot keys explicitly:
  a cheap count sketch finds keys above ``hot_threshold``, the large side
  gets a deterministic salt in [0, k) per hot key, the small side is
  replicated k times — bounded fan-out, uniform buckets.  AQE skew-join
  stays enabled as a backstop for skew the sketch missed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from osm_cut_spark.functions.cells_sql import cell_col


def way_cell_coverage(
    spark: SparkSession,
    ways: DataFrame,
    nodes: DataFrame,
    res: int = 7,
) -> DataFrame:
    """(way_id, cell_id) pairs: every cell containing a node of the way."""
    node_cells = nodes.select(
        F.col("id").alias("node_id"),
        cell_col(F.col("lon"), F.col("lat"), res).alias("cell_id"),
    )
    refs = ways.select(F.col("id").alias("way_id"), F.explode("nds").alias("node_id"))
    return refs.join(node_cells, "node_id").select("way_id", "cell_id").distinct()


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_threshold: int = 100_000,
    salt_target: int = 50_000,
    how: str = "inner",
    row_id: str | None = None,
) -> DataFrame:
    """Equi join with explicit hot-key salting.

    ``big`` is the skewed side; ``small`` is replicated per salt.  Keys
    with big-side counts under ``hot_threshold`` keep salt 0 (no
    replication).  Returns the joined frame (salt columns dropped).

    The salt must be deterministic across task retries (a partition-local
    row id is not), so it is a hash of row content: pass ``row_id`` — a
    column that distinguishes rows sharing a hot key — when one exists
    (hashing one column is also cheaper than hashing the whole row).
    Without ``row_id`` the salt hashes ALL big-side columns, which means
    byte-identical duplicate rows land on the SAME salt: on a
    duplicate-heavy corpus the mitigation degrades toward no-op —
    deduplicate first or provide a ``row_id``.

    Only ``inner``/``left`` joins are supported: replicating the small
    side would emit unmatched small-side rows once per salt under
    right/full semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports how='inner'|'left', got {how!r}")
    spark = big.sparkSession
    hot = (
        big.groupBy(key)
        .count()
        .filter(F.col("count") > hot_threshold)
        .withColumn("n_salt", F.ceil(F.col("count") / salt_target).cast("int"))
        .select(key, "n_salt")
    )
    # hot map is tiny by construction (few dense metro cells) -> broadcast
    hot_b = F.broadcast(hot)

    ident = [F.col(row_id)] if row_id else [F.col(c) for c in big.columns]
    big_s = (
        big.join(hot_b, key, "left")
        .withColumn("n_salt", F.coalesce(F.col("n_salt"), F.lit(1)))
        .withColumn(
            "_salt",
            # rows on non-hot keys (n_salt 1) skip the row hash entirely
            F.when(
                F.col("n_salt") > 1, F.pmod(F.xxhash64(*ident), F.col("n_salt"))
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("n_salt")
    )
    small_s = (
        small.join(hot_b, key, "left")
        .withColumn("n_salt", F.coalesce(F.col("n_salt"), F.lit(1)))
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.col("n_salt") - 1)))
        .withColumn("_salt", F.col("_salt").cast("int"))
        .drop("n_salt")
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")


def raster_vector_join(
    spark: SparkSession,
    tiles: DataFrame,
    ways: DataFrame,
    nodes: DataFrame,
    res: int = 7,
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Join raster tiles(cell_id, ...) to the ways covering each cell.

    Returns one row per (cell_id, way_id) with tile columns; aggregate
    downstream as needed.  Skew-safe via salted_join.
    """
    cov = way_cell_coverage(spark, ways, nodes, res)
    # (way_id, cell_id) rows are distinct, so way_id disambiguates within
    # any hot cell
    return salted_join(cov, tiles, "cell_id", hot_threshold=hot_threshold, row_id="way_id")


def synthetic_tiles(
    spark: SparkSession,
    bbox: tuple[float, float, float, float] = (-2.0, -2.0, 14.0, 9.0),
    res: int = 7,
    seed: int = 42,
) -> DataFrame:
    """Deterministic raster tile table over a bbox: one tile per cell with
    an opaque binary payload + typed metadata (the multimodal column
    pattern: binary blob, metadata columns)."""
    import numpy as np

    from osm_cut_spark.functions.cells import cell_to_bbox, lonlat_to_grid, xy_to_cell

    x0, y0, x1, y1 = bbox
    ix0, iy0 = lonlat_to_grid(np.array([x0]), np.array([y0]), res)
    ix1, iy1 = lonlat_to_grid(np.array([x1]), np.array([y1]), res)
    xs = np.arange(ix0[0], ix1[0] + 1)
    ys = np.arange(iy0[0], iy1[0] + 1)
    gx, gy = np.meshgrid(xs, ys)
    cells = xy_to_cell(gx.ravel(), gy.ravel(), res)
    lon0, lat0, lon1, lat1 = cell_to_bbox(cells)
    rng = np.random.default_rng(seed)
    rows = [
        (
            int(c),
            float(a),
            float(b),
            float(cc),
            float(d),
            bytes(rng.integers(0, 256, 64, dtype=np.uint8)),
        )
        for c, a, b, cc, d in zip(cells, lon0, lat0, lon1, lat1)
    ]
    return spark.createDataFrame(
        rows, "cell_id LONG, lon_min DOUBLE, lat_min DOUBLE, lon_max DOUBLE, lat_max DOUBLE, payload BINARY"
    )
