"""Property-based kernel tests (hypothesis): PIP, grid index, cells, WKB,
CRS — randomized invariants beyond the fixed goldens."""

import numpy as np
from hypothesis import given, settings, strategies as st

from laji_pygeoapi_spark.kernels import cells as C
from laji_pygeoapi_spark.kernels import crs
from laji_pygeoapi_spark.kernels import geom as G
from laji_pygeoapi_spark.kernels import wkb as W

coord = st.floats(min_value=-80.0, max_value=80.0, allow_nan=False, width=64)


@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=12), st.data())
@settings(max_examples=60, deadline=None)
def test_convex_hull_pip_properties(pts, data):
    arr = np.array(pts)
    hull = G.convex_hull(arr)
    if len(hull) < 3:
        return
    ring = W._close_ring(hull)
    if abs(G.ring_area(ring)) < 1e-6:
        return  # degenerate sliver: centroid sits on the boundary (fp-ambiguous)
    poly = ("Polygon", [ring])
    cx, cy = hull[:, 0].mean(), hull[:, 1].mean()
    # centroid of hull vertices is inside a convex polygon
    assert G.points_in_polygon(np.array([cx]), np.array([cy]), poly)[0]
    # a point far outside the bbox is outside
    minx, miny, maxx, maxy = W.bounds(poly)
    far = np.array([[maxx + 10.0], [maxy + 10.0]])
    assert not G.points_in_polygon(far[0], far[1], poly)[0]


@given(st.integers(min_value=0, max_value=10**9),
       st.integers(min_value=2, max_value=12))
@settings(max_examples=80, deadline=None)
def test_hex_cell_center_fixed_point(seed, res):
    rng = np.random.RandomState(seed % 2**32)
    lon = rng.uniform(-170, 170, 5)
    lat = rng.uniform(-80, 80, 5)
    c = C.hex_cell(lon, lat, res)
    clon, clat = C.hex_center(c)
    assert (C.hex_cell(clon, clat, res) == c).all()


@given(st.integers(min_value=0, max_value=10**9))
@settings(max_examples=40, deadline=None)
def test_s2_parent_nesting_chain(seed):
    rng = np.random.RandomState(seed % 2**32)
    lon = rng.uniform(-179, 179, 4)
    lat = rng.uniform(-85, 85, 4)
    prev = C.s2_cell(lon, lat, 30)
    for level in (25, 18, 10, 4):
        cur = C.s2_cell(lon, lat, level)
        assert (C.s2_parent(prev, level) == cur).all()
        prev = cur


@given(st.integers(min_value=0, max_value=10**9))
@settings(max_examples=40, deadline=None)
def test_grid_index_matches_naive_loop(seed):
    rng = np.random.RandomState(seed % 2**32)
    # random non-overlapping grid rectangles (like the municipality fixture)
    polys = []
    k = 0
    for gy in range(3):
        for gx in range(3):
            x0, y0 = gx * 10.0, gy * 10.0
            shell = [(x0, y0), (x0 + 9.0, y0), (x0 + 9.0, y0 + 9.0), (x0, y0 + 9.0)]
            polys.append((f"p{k}", (), (x0, y0, x0 + 9.0, y0 + 9.0), W.polygon(shell)))
            k += 1
    index = G.PolygonGridIndex(polys)
    px = rng.uniform(-2, 32, 300)
    py = rng.uniform(-2, 32, 300)
    got = index.assign(px, py)
    naive = np.full(300, -1, dtype=np.int32)
    for i, (_, _, (x0, y0, x1, y1), geom) in enumerate(polys):
        m = (naive < 0) & (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
        idx = np.nonzero(m)[0]
        if len(idx):
            hit = G.points_in_polygon(px[idx], py[idx], geom)
            naive[idx[hit]] = i
    assert (got == naive).all()


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=8))
@settings(max_examples=60, deadline=None)
def test_wkb_roundtrip_random_linestrings(pts):
    g = W.linestring(pts)
    back = W.loads(W.dumps(g))
    assert back[0] == "LineString"
    assert np.allclose(back[1], g[1])


@given(st.floats(min_value=19.2, max_value=31.4, allow_nan=False),
       st.floats(min_value=59.6, max_value=70.0, allow_nan=False))
@settings(max_examples=80, deadline=None)
def test_crs_roundtrip_property(lon, lat):
    x, y = crs.wgs84_to_tm35fin(np.float64(lon), np.float64(lat))
    lon2, lat2 = crs.tm35fin_to_wgs84(x, y)
    assert abs(float(lon2) - lon) < 1e-9
    assert abs(float(lat2) - lat) < 1e-9


@given(st.integers(min_value=0, max_value=10**9),
       st.integers(min_value=1, max_value=14))
@settings(max_examples=60, deadline=None)
def test_tile_contains_its_point(seed, zoom):
    rng = np.random.RandomState(seed % 2**32)
    lon = float(rng.uniform(-179, 179))
    lat = float(rng.uniform(-84, 84))
    x, y = C.mercator_tile(np.array([lon]), np.array([lat]), zoom)
    w, s, e, n = C.tile_bounds(zoom, int(x[0]), int(y[0]))
    assert w - 1e-9 <= lon <= e + 1e-9
    assert s - 1e-9 <= lat <= n + 1e-9


# ---------------------------------------------- round-2 property additions

@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=30))
@settings(max_examples=40, deadline=None)
def test_hex_rotation_preserves_metrics(pts):
    """Aperture-7 rotation invariants: cell ids round-trip through centers
    at every resolution, and parent(child(p)) contains p's cell center."""
    arr = np.array(pts)
    lon, lat = arr[:, 0], arr[:, 1]
    for res in (2, 5, 9):
        c = C.hex_cell(lon, lat, res)
        clon, clat = C.hex_center(c)
        assert (C.hex_cell(clon, clat, res) == c).all()
        # center distance to the point is bounded by the circumradius
        d = np.hypot(clon - lon, clat - lat)
        assert (d <= float(C._hex_size(res)) * 1.0000001).all()


@given(st.integers(min_value=0, max_value=10**9), st.integers(min_value=0, max_value=5))
@settings(max_examples=60, deadline=None)
def test_hex_parent_is_consistent(seed, res):
    rng = np.random.RandomState(seed % 2**31)
    lon = rng.uniform(-170, 170, 5)
    lat = rng.uniform(-80, 80, 5)
    child = C.hex_cell(lon, lat, res + 2)
    parent = C.hex_parent(child, res)
    # parent of the child's center must be the parent cell itself
    clon, clat = C.hex_center(child)
    assert (C.hex_cell(clon, clat, res) == parent).all()


def _py_sessions(rows, gap_s):
    """Reference sessionizer in plain python: rows = [(user, ts_us, val)]."""
    out = {}
    for user, ts, v in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        sessions = out.setdefault(user, [])
        if sessions and ts - sessions[-1]["last"] <= gap_s * 1_000_000:
            s = sessions[-1]
            s["n"] += 1
            s["last"] = ts
        else:
            sessions.append({"start": ts, "last": ts, "n": 1})
    return {(u, i + 1): (s["n"], s["last"] - s["start"])
            for u, ss in out.items() for i, s in enumerate(ss)}


def test_sessionize_batch_property(spark):
    """Randomized parity: the Spark window-function sessionizer equals a
    plain-python reference over random event streams."""
    import pandas as pd
    from laji_pygeoapi_spark.streaming.sessions import sessionize_batch
    rng = np.random.RandomState(9)
    n = 400
    users = rng.randint(0, 12, n)
    ts_us = np.sort(rng.randint(0, 3 * 86400 * 10**6, n).astype("int64"))
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": users,
        "ts": pd.to_datetime(ts_us, unit="us"),
        "value": rng.rand(n),
    })
    got = sessionize_batch(spark.createDataFrame(pdf), gap_s=3600).toPandas()
    exp = _py_sessions(list(zip(users.tolist(), ts_us.tolist(), range(n))), 3600)
    got_map = {(r.user_id, r.session_no): (r.n_events, r.duration_us)
               for r in got.itertuples()}
    assert got_map == exp


def test_simplify_ring_property():
    """Randomized Douglas-Peucker invariants over many rings: output closed
    and ≥4 points, a subsequence of the input, and EVERY original vertex
    within tol of the simplified outline (the DP guarantee)."""
    from laji_pygeoapi_spark.kernels.geom import simplify_ring
    rng = np.random.RandomState(17)
    for trial in range(60):
        n = rng.randint(5, 120)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(2.0, 12.0) + rng.uniform(-0.8, 0.8, n)
        ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        tol = float(rng.uniform(0.05, 2.0))
        simp = simplify_ring(ring, tol)
        assert simp[0].tolist() == simp[-1].tolist()
        assert len(simp) >= 4
        # subsequence of the input
        orig = [tuple(p) for p in ring]
        keep = [tuple(p) for p in simp]
        it = iter(orig)
        assert all(any(k == o for o in it) for k in keep), "not a subsequence"

        def seg_dist(p, a, b):
            ab = b - a
            l2 = ab @ ab
            t = np.clip(((p - a) @ ab) / l2, 0, 1) if l2 > 0 else 0.0
            return float(np.hypot(*(p - (a + t * ab))))
        for p in ring:
            d = min(seg_dist(p, simp[i], simp[i + 1])
                    for i in range(len(simp) - 1))
            # DP's bound is vs the chord LINE during splits; vs the final
            # clipped outline a modest slack absorbs corner cases
            assert d <= tol * 2.0 + 1e-9, (trial, d, tol)


def test_asof_join_property(spark):
    """Randomized as-of parity vs a plain-python reference: for every left
    row, the matched right row is the max-(ts, order) right row with
    ts <= left.ts per key."""
    import pandas as pd
    from laji_pygeoapi_spark.operators.temporal import asof_join
    rng = np.random.RandomState(23)
    nl, nr = 300, 200
    left = pd.DataFrame({
        "event_id": range(nl),
        "k": rng.randint(0, 6, nl),
        "ts": pd.to_datetime(rng.randint(0, 86400, nl), unit="s"),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 6, nr),
        "ts": pd.to_datetime(rng.randint(0, 86400, nr), unit="s"),
        "value": rng.rand(nr).round(6),
        "rid": range(1000, 1000 + nr),
    })
    got = {r["event_id"]: r["rid_asof"] for r in
           asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                     ["k"], "ts", value_cols=["value", "rid"],
                     order_col="rid").collect()}
    for _, l in left.iterrows():
        cand = right[(right["k"] == l["k"]) & (right["ts"] <= l["ts"])]
        want = None
        if len(cand):
            mx = cand[cand["ts"] == cand["ts"].max()]
            want = int(mx["rid"].max())
        assert got[l["event_id"]] == want, (l["event_id"], got[l["event_id"]], want)
