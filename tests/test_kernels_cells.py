"""Cell-index kernel tests: hex grid (H3-analog), S2, slippy tiles, haversine."""

import math

import numpy as np
import pytest

from laji_pygeoapi_spark.kernels import cells

LON = np.array([24.94, 25.0, 27.7, -122.4, 0.0])
LAT = np.array([60.17, 60.2, 62.6, 37.77, 0.0])


def test_hex_center_roundtrip_and_containment():
    for res in (5, 7, 9):
        c = cells.hex_cell(LON, LAT, res)
        clon, clat = cells.hex_center(c)
        assert (cells.hex_cell(clon, clat, res) == c).all()
        size = 11.0 / math.sqrt(7.0) ** res
        d = np.hypot(clon - LON, clat - LAT)
        assert (d <= size * 1.001).all()


def test_hex_aperture7_scaling():
    # each finer resolution has ~7x more distinct cells over the same area
    rng = np.random.RandomState(42)
    lon = rng.uniform(24, 26, 20000)
    lat = rng.uniform(60, 61, 20000)
    n5 = len(np.unique(cells.hex_cell(lon, lat, 5)))
    n6 = len(np.unique(cells.hex_cell(lon, lat, 6)))
    assert 4.0 < n6 / n5 < 10.0


def test_hex_kring_counts():
    c = cells.hex_cell(np.array([24.94]), np.array([60.17]), 8)
    for k in (1, 2, 3):
        ring = cells.hex_kring(c, k)
        assert ring.shape == (1, 3 * k * k + 3 * k + 1)
        assert len(set(ring[0].tolist())) == ring.shape[1]
        assert c[0] in ring[0]


def test_hex_kring_covers_neighbors():
    # every point within one hex size of the center is inside the 1-ring
    c = cells.hex_cell(np.array([25.0]), np.array([61.0]), 7)
    size = 11.0 / math.sqrt(7.0) ** 7
    ring = set(cells.hex_kring(c, 1)[0].tolist())
    ang = np.linspace(0, 2 * np.pi, 32)
    px = 25.0 + size * np.cos(ang)
    py = 61.0 + size * np.sin(ang)
    got = cells.hex_cell(px, py, 7)
    assert set(got.tolist()).issubset(ring)


def test_hex_parent_resolution():
    c9 = cells.hex_cell(LON, LAT, 9)
    p5 = cells.hex_parent(c9, 5)
    res, _, _ = cells.hex_unpack(p5)
    assert (res == 5).all()
    # parent center within parent hex of child center
    clon, clat = cells.hex_center(c9)
    plon, plat = cells.hex_center(p5)
    size5 = 11.0 / math.sqrt(7.0) ** 5
    assert (np.hypot(plon - clon, plat - clat) <= size5 * 1.01).all()


def test_hex_bbox_cover_is_superset():
    cover = set(cells.hex_cells_in_bbox(24.0, 60.0, 26.0, 61.0, 6).tolist())
    rng = np.random.RandomState(7)
    lon = rng.uniform(24.0, 26.0, 500)
    lat = rng.uniform(60.0, 61.0, 500)
    inside = set(cells.hex_cell(lon, lat, 6).tolist())
    assert inside.issubset(cover)


def test_s2_known_leaf_golden():
    # (0N, 0E) leaf cell id per the public S2 implementations
    got = cells.s2_cell(np.array([0.0]), np.array([0.0]), 30)
    assert got[0] == 1152921504606846977


def test_s2_levels_and_parents():
    s30 = cells.s2_cell(LON, LAT, 30)
    s10 = cells.s2_cell(LON, LAT, 10)
    assert (cells.s2_level(s30) == 30).all()
    assert (cells.s2_level(s10) == 10).all()
    assert (cells.s2_parent(s30, 10) == s10).all()
    # nearby points share coarse cells, far points don't
    s5 = cells.s2_cell(LON[:2], LAT[:2], 5)
    assert s5[0] == s5[1]
    far = cells.s2_cell(LON[[0, 3]], LAT[[0, 3]], 5)
    assert far[0] != far[1]


def test_mercator_tile_golden():
    # independent formula cross-check (OSM slippy-map spec)
    lon, lat, z = 13.37, 52.51, 17
    n = 2 ** z
    xt_exp = int((lon + 180.0) / 360.0 * n)
    lat_rad = math.radians(lat)
    yt_exp = int((1.0 - math.log(math.tan(lat_rad) + 1 / math.cos(lat_rad)) / math.pi) / 2.0 * n)
    xt, yt = cells.mercator_tile(np.array([lon]), np.array([lat]), z)
    assert (xt[0], yt[0]) == (xt_exp, yt_exp)
    # tile_bounds inverts tile: the point is inside its own tile bounds
    w, s, e, nn = cells.tile_bounds(z, int(xt[0]), int(yt[0]))
    assert w <= lon <= e and s <= lat <= nn


def test_haversine_known_distance():
    # Helsinki -> Turku ~= 151 km
    d = cells.haversine_m(24.9384, 60.1699, 22.2666, 60.4518)
    assert d == pytest.approx(151_000, rel=0.02)
    assert cells.haversine_m(25.0, 60.0, 25.0, 60.0) == 0.0


def test_hex_aperture7_exact_seven_children():
    """True aperture-7 rotation (round-2): every parent hex contains the
    centers of EXACTLY 7 child cells — 1 aligned at the parent center plus
    a ring of 6 (H3's nesting invariant, previously only approximate)."""
    import numpy as np
    rng = np.random.RandomState(3)
    lon = 19.0 + rng.rand(200) * 12.0
    lat = 59.5 + rng.rand(200) * 10.0
    for res in (4, 7):
        parents = np.unique(cells.hex_cell(lon, lat, res))
        # enumerate candidate children: k-ring 2 around the child cell at
        # the parent center covers all possible children
        plon, plat = cells.hex_center(parents)
        seed_child = cells.hex_cell(plon, plat, res + 1)
        cand = cells.hex_kring(seed_child, 2)          # (n, 19)
        clon, clat = cells.hex_center(cand.ravel())
        owner = cells.hex_cell(clon, clat, res)        # parent of each center
        counts = (owner.reshape(cand.shape) ==
                  np.asarray(parents)[:, None]).sum(axis=1)
        assert (counts == 7).all(), counts
        # the center child is exactly aligned with the parent center
        slon, slat = cells.hex_center(seed_child)
        assert np.allclose(slon, plon, atol=1e-9) and np.allclose(slat, plat, atol=1e-9)


def test_hex_polyfill_complete_and_tighter():
    """Polyfill covers every interior point's cell and beats the bbox cover
    on a wedge polygon."""
    import numpy as np
    from laji_pygeoapi_spark.kernels import geom as G, wkb as W
    tri = W.polygon([(21.0, 59.6), (29.0, 59.6), (25.0, 63.5)])
    full = cells.hex_cells_in_bbox(21.0, 59.6, 29.0, 63.5, 4)
    fill = cells.hex_polyfill(tri, 4)
    assert len(fill) < 0.7 * len(full)
    rng = np.random.RandomState(0)
    xs = rng.uniform(21, 29, 2000)
    ys = rng.uniform(59.6, 63.5, 2000)
    inside = G.points_in_polygon(xs, ys, tri)
    cc = cells.hex_cell(xs[inside], ys[inside], 4)
    assert np.isin(cc, fill).all()
