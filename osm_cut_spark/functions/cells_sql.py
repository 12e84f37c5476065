"""Native (Catalyst Column) twins of the cells.py kernels.

The cell id of a point is pure integer arithmetic — quantize to a 2^res
grid, Morton-interleave the grid coordinates, set a marker bit
(cells.py:73-113).  Expressed as built-in Spark expressions it runs inside
whole-stage codegen, so cell assignment costs no Arrow transfer at all:
kNN/raster cell keys and the extract pipeline's cover routing stay
JVM-side, and ONLY boundary-cell points ever reach the pandas PIP kernel.

Bit-exactness contract: every arithmetic step mirrors the numpy kernel
operation-for-operation (same IEEE-754 double ops in the same order; the
pre-multiply clamp in _grid_col/lonlat_to_grid keeps the double->long cast
in-range so truncation agrees for ANY finite input), pinned by
tests/test_cells.py::test_native_cell_col_matches_numpy_bit_exact over
grid-edge points, ±1 ULP probes, random points, out-of-range extremes and
the null/NaN -1 sentinel.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from osm_cut_spark.functions.cells import LAT_MAX, LAT_MIN, LON_MAX, LON_MIN, MAX_RES


def _spread_byte(b: int) -> int:
    """Interleave the 8 bits of a byte with zeros (scalar, for the table)."""
    out = 0
    for i in range(8):
        out |= ((b >> i) & 1) << (2 * i)
    return out


# 256-entry constant-folded lookup table: spread-bits of each byte value.
# A shift-mask cascade here would reference its input TWICE per step, so
# the Catalyst expression tree doubles per step (2^5 x per coordinate) and
# CollapseProject then inlines that blown-up tree into every downstream
# use (each cover-level join key) — measured ~25x slower than the Arrow
# UDF it was meant to replace.  Two O(1) element_at probes keep the tree
# a few dozen nodes and firmly inside whole-stage codegen.
_SPREAD_TABLE = [_spread_byte(b) for b in range(256)]


def _spread_bits_col(v: Column) -> Column:
    """Native twin of cells._spread_bits: a 0 between each of the low 16
    bits, via byte-table lookups (see _SPREAD_TABLE note)."""
    t = F.array(*[F.lit(x) for x in _SPREAD_TABLE])
    lo = F.element_at(t, (v.bitwiseAND(F.lit(0xFF)) + F.lit(1)).cast("int"))
    hi = F.element_at(
        t, (F.shiftrightunsigned(v, 8).bitwiseAND(F.lit(0xFF)) + F.lit(1)).cast("int")
    )
    return lo.cast("long").bitwiseOR(F.shiftleft(hi.cast("long"), 16))


def _grid_col(coord: Column, lo: float, hi: float, res: int) -> Column:
    """Quantize one coordinate to [0, 2^res) exactly like lonlat_to_grid:
    u = clamp((c - lo) / (hi - lo), 0, 1); clip(trunc(u * n)).

    The pre-multiply clamp keeps u * n inside int64 for ANY finite input,
    where Spark's double->long cast saturates but numpy's astype wraps —
    without it the two engines disagree for |coord| ≳ 1e18 (reachable on
    knn/raster paths that have no bbox prune in front of cell_col).

    NaN caveat: the least/greatest clamp maps NaN to 1.0 (Spark orders NaN
    above every double), i.e. grid cell n-1, while the numpy twin's
    np.clip PROPAGATES NaN into an undefined int64 cast — the bit-exact
    contract holds for FINITE inputs only.  Safe today solely because
    every caller reaches this helper behind ``cell_col``'s NaN/null -> -1
    sentinel guard; a direct caller must add its own NaN handling."""
    n = 1 << res
    u = (coord.cast("double") - F.lit(lo)) / F.lit(hi - lo)
    u = F.least(F.greatest(u, F.lit(0.0)), F.lit(1.0))
    raw = (u * F.lit(float(n))).cast("long")  # cast truncates toward zero, as astype does
    return F.least(F.greatest(raw, F.lit(0).cast("long")), F.lit(n - 1).cast("long"))


def cell_col(lon: Column, lat: Column, res: int) -> Column:
    """Native twin of lonlat_to_cell: (lon, lat) -> marker-bit Morton cell id
    at resolution ``res``; null/NaN coordinates map to -1 (the same contract
    the pandas cell UDF had, so -1 never equi-joins a real cell)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    ix = _grid_col(lon, LON_MIN, LON_MAX, res)
    iy = _grid_col(lat, LAT_MIN, LAT_MAX, res)
    morton = _spread_bits_col(ix).bitwiseOR(F.shiftleft(_spread_bits_col(iy), 1))
    cell = morton.bitwiseOR(F.lit(1 << (2 * res)))
    bad = (
        lon.isNull()
        | lat.isNull()
        | F.isnan(lon.cast("double"))
        | F.isnan(lat.cast("double"))
    )
    return F.when(bad, F.lit(-1).cast("long")).otherwise(cell.cast("long"))


def cell_parent_col(cell: Column, steps: int) -> Column:
    """Native twin of cell_parent: ancestor ``steps`` resolutions up.

    Valid cell ids are positive (marker bit), so an unsigned shift matches
    the numpy arithmetic shift; the -1 null sentinel stays negative via a
    guard so it keeps never matching any real cell.
    """
    if steps == 0:
        return cell
    return F.when(cell < 0, cell).otherwise(F.shiftrightunsigned(cell, 2 * steps))
