"""Geometry kernel tests — ports every probe of the reference geometry suite.

Probe lists come from /root/reference/test/poligon_compiler_SUITE.erl:108-172
(square, convex triangle, self-intersecting non-convex quad, thin OSM
triangle with on-edge / on-vertex / near-boundary probes).  Each polygon is
checked in BOTH ring orientations, like check_polygon (erl:99-104).
"""

from __future__ import annotations

import numpy as np
import pytest

from osm_cut_spark.functions.geometry import (
    PreparedPolygon,
    prepare_polygon,
    prepare_ring,
    segments_intersect_rect,
)

SQUARE = [(0, 0), (10, 0), (10, 10), (0, 10)]
SQUARE_PROBES = [
    ((5, 5), True),
    ((0, 0), True),
    ((10, 5), True),
    ((-5, 0), False),
    ((15, 5), False),
    ((5, -5), False),
    ((5, 15), False),
]

CONVEX = [(0, 0), (10, 0), (10, 10)]
CONVEX_PROBES = [
    ((0, 0), True),
    ((5, 5), True),
    ((3, 3), True),
    ((0, 10), False),
    ((3, 7), False),
]

NON_CONVEX = [(-5, 0), (5, 0), (-5, 10), (5, 10)]
NON_CONVEX_PROBES = [
    ((0, 0), True),  # on edge
    ((0, 5), True),  # on self-intersection point
    ((1, 3), True),  # inside
    ((1, 5), False),
    ((10, 7), False),
]

OSM_TRIANGLE = [(0, 0), (5, 0), (10, 5)]
OSM_PROBES = [
    ((0, 0), True),  # on vertex
    ((5, 0), True),  # on vertex
    ((10, 5), True),  # on vertex
    ((10, 10), False),
    ((0, 10), False),
    ((9, 0), False),  # collinear with bottom edge but beyond it
    ((9.75, 4.9), False),
    ((9.8, 4.9), True),  # exactly on hypotenuse y = x/2
    ((9.85, 4.9), True),
    ((9.9, 4.9), True),  # exactly on edge y = x - 5
    ((9.95, 4.9), False),
    ((10, 4.9), False),
    ((10, 0), False),
    ((15, 5), False),
    ((0.3, 0.1), True),
    ((0.3, 0.4), False),
    ((5, 0.01), True),
    ((5.1, 0.01), False),
    ((4.7, 0.01), True),
]

CASES = [
    ("square", SQUARE, SQUARE_PROBES),
    ("convex", CONVEX, CONVEX_PROBES),
    ("non_convex", NON_CONVEX, NON_CONVEX_PROBES),
    ("osm_triangle", OSM_TRIANGLE, OSM_PROBES),
]


@pytest.mark.parametrize("name,ring,probes", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("reverse", [False, True], ids=["fwd", "rev"])
def test_reference_probes(name, ring, probes, reverse):
    pts = list(reversed(ring)) if reverse else list(ring)
    poly = prepare_polygon([("include", pts)])
    xs = np.array([p[0][0] for p in probes], dtype=np.float64)
    ys = np.array([p[0][1] for p in probes], dtype=np.float64)
    got = poly.contains(xs, ys)
    expected = np.array([p[1] for p in probes])
    mismatches = [
        (probes[i][0], bool(got[i]), bool(expected[i]))
        for i in range(len(probes))
        if got[i] != expected[i]
    ]
    assert not mismatches, f"{name}: (point, got, want) = {mismatches}"


def test_exclude_ring_composition():
    """include big square, exclude inner square — erl compile/1 semantics."""
    poly = prepare_polygon(
        [
            ("include", [(0, 0), (10, 0), (10, 10), (0, 10)]),
            ("exclude", [(4, 4), (6, 4), (6, 6), (4, 6)]),
        ]
    )
    assert poly.contains_point(1, 1)
    assert not poly.contains_point(5, 5)  # in the hole
    assert not poly.contains_point(4, 4)  # ON the exclude ring -> excluded
    assert poly.contains_point(3.9, 3.9)
    assert not poly.contains_point(11, 5)


def test_multiple_include_rings():
    poly = prepare_polygon(
        [
            ("include", [(0, 0), (2, 0), (2, 2), (0, 2)]),
            ("include", [(10, 10), (12, 10), (12, 12), (10, 12)]),
        ]
    )
    assert poly.contains_point(1, 1)
    assert poly.contains_point(11, 11)
    assert not poly.contains_point(5, 5)


def test_bbox():
    poly = prepare_polygon([("include", OSM_TRIANGLE)])
    assert poly.bbox == (0.0, 10.0, 0.0, 5.0)


def test_auto_close_matches_explicit_close():
    open_ring = prepare_polygon([("include", OSM_TRIANGLE)])
    closed_ring = prepare_polygon([("include", OSM_TRIANGLE + [OSM_TRIANGLE[0]])])
    xs = np.linspace(-1, 11, 200)
    ys = np.linspace(-1, 6, 200)
    gx, gy = np.meshgrid(xs, ys)
    a = open_ring.contains(gx.ravel(), gy.ravel())
    b = closed_ring.contains(gx.ravel(), gy.ravel())
    assert np.array_equal(a, b)


def test_large_batch_chunking():
    """Chunked path (many points) agrees with pointwise results."""
    poly = prepare_polygon([("include", OSM_TRIANGLE)])
    rng = np.random.default_rng(42)
    xs = rng.uniform(-2, 12, 50_000)
    ys = rng.uniform(-2, 7, 50_000)
    got = poly.contains(xs, ys)
    # spot-check 500 points individually
    idx = rng.choice(50_000, 500, replace=False)
    for i in idx:
        assert bool(got[i]) == poly.contains_point(float(xs[i]), float(ys[i]))


def test_segments_intersect_rect():
    ring = prepare_ring(OSM_TRIANGLE)
    assert segments_intersect_rect(ring, 4, -1, 6, 1)  # crosses bottom edge
    assert not segments_intersect_rect(ring, 1, 2, 2, 3)  # fully inside, no edge
    assert not segments_intersect_rect(ring, 20, 20, 30, 30)  # far away
    assert segments_intersect_rect(ring, 9, 4, 11, 6)  # around vertex (10,5)


def test_orientation_independence_dense_grid():
    for _, ring, _ in CASES:
        fwd = prepare_polygon([("include", ring)])
        rev = prepare_polygon([("include", list(reversed(ring)))])
        xs = np.linspace(-6, 16, 120)
        ys = np.linspace(-6, 16, 120)
        gx, gy = np.meshgrid(xs, ys)
        assert np.array_equal(
            fwd.contains(gx.ravel(), gy.ravel()), rev.contains(gx.ravel(), gy.ravel())
        )
