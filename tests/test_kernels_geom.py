"""Geometry kernel tests — ports of the reference's geometry test matrix.

Reference cases: ``pygeoapi/tests/test_process_data.py:35-44`` (make_valid),
``:75-92`` (GeometryCollection conversion).
"""

import numpy as np
import pytest

from laji_pygeoapi_spark.kernels import geom, wkb


def test_validity_matrix_matches_reference():
    valid_line = wkb.linestring([(0, 0), (1, 1)])
    valid_point = wkb.point(2, 2)
    bowtie = wkb.polygon([(0, 0), (2, 0), (0, 2), (2, 2), (0, 0)])
    overlap_mp = wkb.multipolygon([
        [[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]],
        [[(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)]],
    ])
    bad_hole = wkb.polygon([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
                           holes=[[(2, 2), (6, 2), (6, 6), (2, 6), (2, 2)]])
    geoms = [valid_line, valid_point, bowtie, overlap_mp, bad_hole]
    validity = [geom.is_valid(g) for g in geoms]
    assert validity == [True, True, False, False, False]
    # reference golden: exactly 3 repaired, all valid afterwards
    fixed = [g if v else geom.make_valid(g) for g, v in zip(geoms, validity)]
    assert sum(1 for v in validity if not v) == 3
    assert all(geom.is_valid(f) for f in fixed)


def test_bowtie_split_produces_two_triangles():
    bowtie = wkb.polygon([(0, 0), (2, 0), (0, 2), (2, 2), (0, 0)])
    fixed = geom.make_valid(bowtie)
    assert fixed[0] == "MultiPolygon"
    areas = sorted(abs(geom.ring_area(r[0])) for r in fixed[1])
    assert len(areas) == 2
    assert areas == pytest.approx([1.0, 1.0])  # two unit triangles


def test_geometry_collection_conversion_matrix():
    point = wkb.point(1, 1)
    line = wkb.linestring([(0, 0), (1, 1)])
    poly = wkb.polygon([(0, 0), (1, 0), (1, 1), (0, 1)])
    cases = [
        wkb.collection([point, line]),   # mixed -> buffered MultiPolygon
        wkb.collection([poly]),          # single member -> unwrapped
        wkb.collection([point, poly]),   # mixed -> MultiPolygon
        None,
        poly,                            # not a collection -> untouched
    ]
    expected = ["MultiPolygon", "Polygon", "MultiPolygon", None, "Polygon"]
    count = 0
    for case, exp in zip(cases, expected):
        out, converted = geom.convert_geometry_collection(case, 0.5)
        count += converted
        assert (out[0] if out else None) == exp
    assert count == 3


def test_homogeneous_collection_variants():
    l1 = wkb.linestring([(0, 0), (1, 1)])
    l2 = wkb.linestring([(2, 2), (3, 3)])
    out, _ = geom.convert_geometry_collection(wkb.collection([l1, l2]))
    assert out[0] == "MultiLineString" and len(out[1]) == 2
    p1, p2 = wkb.point(0, 0), wkb.point(1, 1)
    out, _ = geom.convert_geometry_collection(wkb.collection([p1, p2]))
    assert out[0] == "MultiPoint" and len(out[1]) == 2
    poly = wkb.polygon([(0, 0), (1, 0), (1, 1)])
    out, _ = geom.convert_geometry_collection(wkb.collection([poly, poly]))
    assert out[0] == "MultiPolygon" and len(out[1]) == 2


def test_points_in_polygon_with_hole():
    donut = wkb.polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                        holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]])
    px = np.array([5.0, 2.0, 11.0, 5.0])
    py = np.array([5.0, 2.0, 5.0, 4.5])
    got = geom.points_in_polygon(px, py, donut)
    assert got.tolist() == [False, True, False, False]


def test_points_in_multipolygon():
    mp = wkb.multipolygon([
        [[(0, 0), (2, 0), (2, 2), (0, 2)]],
        [[(5, 5), (7, 5), (7, 7), (5, 7)]],
    ])
    px = np.array([1.0, 6.0, 3.5])
    py = np.array([1.0, 6.0, 3.5])
    assert geom.points_in_polygon(px, py, mp).tolist() == [True, True, False]


def test_wkb_roundtrip_all_kinds():
    geoms = [
        wkb.point(1.5, -2.5),
        wkb.linestring([(0, 0), (1, 1), (2, 0)]),
        wkb.polygon([(0, 0), (4, 0), (4, 4), (0, 4)], holes=[[(1, 1), (2, 1), (2, 2), (1, 2)]]),
        wkb.multipoint([(0, 0), (1, 1)]),
        wkb.multilinestring([[(0, 0), (1, 1)], [(2, 2), (3, 3)]]),
        wkb.multipolygon([[[(0, 0), (1, 0), (1, 1)]], [[(5, 5), (6, 5), (6, 6)]]]),
        wkb.collection([wkb.point(9, 9), wkb.linestring([(0, 0), (1, 0)])]),
    ]
    for g in geoms:
        back = wkb.loads(wkb.dumps(g))
        assert back[0] == g[0]
        assert wkb.bounds(back) == pytest.approx(wkb.bounds(g))


def test_geom_kind_routing():
    # reference to_db geometry-type routing (edit_db.py:279-283)
    assert wkb.geom_kind(wkb.point(0, 0)) == "point"
    assert wkb.geom_kind(wkb.multipoint([(0, 0)])) == "point"
    assert wkb.geom_kind(wkb.linestring([(0, 0), (1, 1)])) == "line"
    assert wkb.geom_kind(wkb.multilinestring([[(0, 0), (1, 1)]])) == "line"
    assert wkb.geom_kind(wkb.polygon([(0, 0), (1, 0), (1, 1)])) == "polygon"
    assert wkb.geom_kind(wkb.multipolygon([[[(0, 0), (1, 0), (1, 1)]]])) == "polygon"
    assert wkb.geom_kind(wkb.collection([wkb.point(0, 0)])) == "other"


def test_centroid_and_bounds():
    sq = wkb.polygon([(0, 0), (2, 0), (2, 2), (0, 2)])
    assert wkb.centroid(sq) == pytest.approx((1.0, 1.0))
    assert wkb.bounds(sq) == (0.0, 0.0, 2.0, 2.0)


def test_union_exact_shared_edge_cases():
    """Round-2: exact boundary-trace union replaces the convex-hull
    fallback — shared edges, partial edges, T-joins, containment, hole
    creation, and grid dissolves all come out exact."""
    def sq(x0, y0, s=1.0):
        return wkb.polygon([(x0, y0), (x0+s, y0), (x0+s, y0+s), (x0, y0+s)])
    cases = [
        (geom.union(sq(0, 0), sq(1, 0)), "Polygon", 2.0),           # full edge
        (geom.union(sq(0, 0), sq(1, 0.5)), "Polygon", 2.0),         # partial edge
        (geom.union(sq(0, 0), sq(1, 1)), "MultiPolygon", 2.0),      # corner touch
        (geom.union(sq(0, 0, 3), sq(1, 1, 0.5)), "Polygon", 9.0),   # containment
        (geom.union(sq(0, 0), sq(0.5, 0.5)), "Polygon", 1.75),      # proper overlap
        (geom.union(sq(0, 0, 2), sq(2, 0.5, 1)), "Polygon", 5.0),   # T-join
    ]
    for u, kind, area in cases:
        assert u[0] == kind and abs(geom._geom_area(u) - area) < 1e-9, (u[0], geom._geom_area(u))
    # enclosed-hole creation: C-shape + closing cap -> polygon WITH a hole
    c_shape = wkb.polygon([(0, 0), (3, 0), (3, 1), (1, 1), (1, 2), (3, 2), (3, 3), (0, 3)])
    cap = wkb.polygon([(3, 0), (4, 0), (4, 3), (3, 3)])
    u = geom.union(c_shape, cap)
    assert u[0] == "Polygon" and len(u[1]) == 2
    assert abs(geom._geom_area(u) - 10.0) < 1e-9
    # grid dissolve through _union_many (shapely unary_union semantics)
    grid = geom._union_many([sq(0, 0), sq(1, 0), sq(0, 1), sq(1, 1)])
    assert grid[0] == "Polygon" and abs(geom._geom_area(grid) - 4.0) < 1e-9


def test_difference_exact_cases():
    """Round-2: difference via the exact boundary trace — edge-sharing,
    interior punches and grazing contacts come out exact."""
    def sq(x0, y0, s=1.0):
        return wkb.polygon([(x0, y0), (x0+s, y0), (x0+s, y0+s), (x0, y0+s)])
    assert geom.difference(sq(0, 0), sq(0, 0)) is None              # identical
    assert geom.difference(sq(1, 1, 0.5), sq(0, 0, 3)) is None      # a inside b
    cases = [
        (geom.difference(sq(0, 0), sq(1, 0)), 1.0),        # adjacent neighbor
        (geom.difference(sq(0, 0, 3), sq(1, 1, 1)), 8.0),  # interior punch -> hole
        (geom.difference(sq(0, 0), sq(0.5, 0.5)), 0.75),   # proper overlap
        (geom.difference(sq(0, 0, 2), sq(1, 0.5, 1)), 3.0),  # edge-touching interior bite
        (geom.difference(sq(0, 0, 2), sq(2, 0.5, 1)), 4.0),  # outside, shared edge
        (geom.difference(sq(0, 0), sq(5, 5)), 1.0),        # disjoint
    ]
    for d, area in cases:
        assert d is not None and abs(geom._geom_area(d) - area) < 1e-9, \
            (d and d[0], d and geom._geom_area(d), area)
    # the interior punch really is shell + hole
    punched = geom.difference(sq(0, 0, 3), sq(1, 1, 1))
    assert punched[0] == "Polygon" and len(punched[1]) == 2


def test_intersection_exact_cases():
    def sq(x0, y0, s=1.0):
        return wkb.polygon([(x0, y0), (x0+s, y0), (x0+s, y0+s), (x0, y0+s)])
    assert geom.intersection(sq(0, 0), sq(1, 0)) is None        # edge touch: empty
    assert geom.intersection(sq(0, 0), sq(5, 5)) is None        # disjoint
    cases = [
        (geom.intersection(sq(0, 0), sq(0, 0)), 1.0),           # identical
        (geom.intersection(sq(0, 0), sq(0.5, 0.5)), 0.25),      # proper overlap
        (geom.intersection(sq(0, 0, 3), sq(1, 1, 1)), 1.0),     # b inside a
        (geom.intersection(sq(1, 1, 1), sq(0, 0, 3)), 1.0),     # a inside b
        (geom.intersection(sq(0, 0, 2), sq(1, -0.5, 1)), 0.5),  # partial crossing
        (geom.intersection(sq(0, 0, 2), sq(1, 0.5, 1)), 1.0),   # interior bite w/ shared edge
    ]
    for g, area in cases:
        assert g is not None and abs(abs(geom._geom_area(g)) - area) < 1e-9, \
            (g and g[0], g and geom._geom_area(g), area)


def test_simplify_ring_douglas_peucker():
    """Collinear vertices drop at tol=0+; deviations above tol survive;
    every dropped vertex is within tol of the simplified outline; rings
    stay closed and valid."""
    import numpy as np
    from laji_pygeoapi_spark.kernels import geom as G
    # square with collinear edge midpoints -> exactly the 4 corners survive
    sq = np.array([[0, 0], [1, 0], [2, 0], [2, 1], [2, 2], [1, 2],
                   [0, 2], [0, 1], [0, 0]], dtype=float)
    out = G.simplify_ring(sq, 0.01)
    assert [tuple(p) for p in out] == [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    # a bump above tol survives, below tol is flattened
    bump = np.array([[0, 0], [1, 0.3], [2, 0], [2, 2], [0, 2], [0, 0]])
    assert len(G.simplify_ring(bump, 0.1)) == len(bump)
    assert len(G.simplify_ring(bump, 0.5)) == 5
    # random star ring: every ORIGINAL vertex within tol of the kept chords
    rng = np.random.RandomState(7)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 80))
    rad = 10 + rng.uniform(-0.4, 0.4, 80)
    ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    ring = np.vstack([ring, ring[:1]])
    tol = 0.6
    simp = G.simplify_ring(ring, tol)
    assert simp[0].tolist() == simp[-1].tolist()  # closed
    assert 4 <= len(simp) < len(ring)

    def seg_dist(p, a, b):
        ab = b - a
        l2 = ab @ ab
        t = np.clip(((p - a) @ ab) / l2, 0, 1) if l2 else 0.0
        return float(np.hypot(*(p - (a + t * ab))))
    for p in ring:
        d = min(seg_dist(p, simp[i], simp[i + 1]) for i in range(len(simp) - 1))
        assert d <= tol * 1.5 + 1e-9, d


def test_vectorize_tiles_simplify(spark):
    """simplify_tol shrinks ring vertex counts without changing the
    polygon set or moving any boundary by more than the tolerance."""
    import numpy as np
    import pyspark.sql.functions as F
    from laji_pygeoapi_spark.kernels import codec, wkb as W
    from laji_pygeoapi_spark.operators.tiling import vectorize_tiles
    # one synthetic tile: a filled diamond (mask edges are staircases —
    # exactly what simplification collapses)
    size = 64
    yy, xx = np.mgrid[0:size, 0:size]
    mask = (np.abs(xx - 32) + np.abs(yy - 32)) < 20
    img = np.zeros((size, size, 3), dtype=np.uint8)
    img[mask] = 200
    png = codec.encode(img, "png")
    tiles = spark.createDataFrame([(9, 290, 148, bytearray(png))],
                                  "zoom: int, x: long, y: long, tile_png: binary")
    plain = vectorize_tiles(tiles).collect()
    simp = vectorize_tiles(tiles, simplify_tol=0.75).collect()
    assert len(plain) == len(simp) == 1
    n_plain = len(W.loads(bytes(plain[0]["wkb"]))[1][0])
    n_simp = len(W.loads(bytes(simp[0]["wkb"]))[1][0])
    assert n_simp < n_plain / 2, (n_plain, n_simp)
