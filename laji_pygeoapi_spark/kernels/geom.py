"""Computational-geometry kernel (pure numpy) — the engine's shapely stand-in.

Implements exactly the geometry semantics the reference uses:

* validity test + repair       (reference ``process_data.py:25-39`` via shapely
  ``is_valid`` / ``make_valid``): bowtie ring split, overlapping-multipolygon
  union, hole-outside-shell difference;
* GeometryCollection -> Multi* / dissolved MultiPolygon conversion matrix
  (reference ``process_data.py:132-181``);
* point/line buffering (n-gon circles / capsules) used by that conversion;
* vectorized point-in-polygon (even-odd ray casting) — the core of the
  broadcast spatial join that replaces PostGIS GIST lookups
  (reference ``edit_db.py:307-311``).

Boolean ops (round 2): polygon UNION is an exact boundary trace over the
full segment arrangement (proper crossings + collinear/shared edges +
vertex touches + containment + hole creation — regression matrix in
tests/test_kernels_geom.py); a Greiner–Hormann-style clipper remains for
intersection/difference.  Raster->vector: exact binary-mask polygonization
(boundary-edge stitching, GDAL-polygonize analog).
"""

from __future__ import annotations

import numpy as np

from . import wkb

_EPS = 1e-12


# ------------------------------------------------------------------ basics

def ring_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = np.roll(ring[:-1], -1, axis=0).T
    return float((x * y1 - x1 * y).sum() / 2.0)


def _seg_intersection(p1, p2, p3, p4):
    """Proper intersection point of segments p1p2 and p3p4, or None."""
    d1 = p2 - p1
    d2 = p4 - p3
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(denom) < _EPS:
        return None
    t = ((p3[0] - p1[0]) * d2[1] - (p3[1] - p1[1]) * d2[0]) / denom
    u = ((p3[0] - p1[0]) * d1[1] - (p3[1] - p1[1]) * d1[0]) / denom
    if -_EPS < t < 1 + _EPS and -_EPS < u < 1 + _EPS:
        if _EPS < t < 1 - _EPS or _EPS < u < 1 - _EPS:  # not merely endpoint touch
            return p1 + t * d1
    return None


def ring_self_intersections(ring: np.ndarray):
    """Proper self-intersection points of a closed ring (O(n^2), rings are small)."""
    pts = []
    n = len(ring) - 1
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue  # adjacent edges share endpoints
            p = _seg_intersection(ring[i], ring[i + 1], ring[j], ring[j + 1])
            if p is not None:
                pts.append(p)
    return pts


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting of many points against one ring."""
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px = px[:, None]
    py = py[:, None]
    cond = ((y0 > py) != (y1 > py))
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    crossings = (cond & (px < xint)).sum(axis=1)
    return (crossings % 2).astype(bool)


def points_in_polygon(px: np.ndarray, py: np.ndarray, geom) -> np.ndarray:
    """Even-odd containment over all rings — handles holes and MultiPolygon."""
    kind, payload = geom
    rings = payload if kind == "Polygon" else [r for rings in payload for r in rings]
    inside = np.zeros(len(px), dtype=np.int64)
    minx, miny, maxx, maxy = wkb.bounds(geom)
    mask = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
    if not mask.any():
        return mask
    idx = np.nonzero(mask)[0]
    for ring in rings:
        inside[idx] += points_in_ring(px[idx], py[idx], ring).astype(np.int64)
    return (inside % 2).astype(bool)


def point_in_polygon(x: float, y: float, geom) -> bool:
    return bool(points_in_polygon(np.array([x]), np.array([y]), geom)[0])


# ------------------------------------------------------------------ validity

def is_valid(geom) -> bool:
    """Validity subset matching the reference's test matrix
    (``tests/test_process_data.py:35-44``)."""
    if geom is None:
        return True
    kind, payload = geom
    if kind == "Polygon":
        return _polygon_valid(payload)
    if kind == "MultiPolygon":
        for rings in payload:
            if not _polygon_valid(rings):
                return False
        # overlapping component polygons -> invalid
        for i in range(len(payload)):
            for j in range(i + 1, len(payload)):
                if _polys_overlap(payload[i], payload[j]):
                    return False
        return True
    if kind == "GeometryCollection":
        return all(is_valid(g) for g in payload)
    return True


def _polygon_valid(rings) -> bool:
    for ring in rings:
        if len(ring) < 4:
            return False
        if ring_self_intersections(ring):
            return False
    shell = rings[0]
    for hole in rings[1:]:
        # every hole vertex must be inside (or on) the shell
        inside = points_in_ring(hole[:-1, 0], hole[:-1, 1], shell)
        if not inside.all():
            return False
    return True


def _polys_overlap(rings_a, rings_b) -> bool:
    a, b = ("Polygon", rings_a), ("Polygon", rings_b)
    ax0, ay0, ax1, ay1 = wkb.bounds(a)
    bx0, by0, bx1, by1 = wkb.bounds(b)
    if ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0:
        return False
    # interior sample test: any vertex of one strictly inside the other
    for rs, other in ((rings_a, b), (rings_b, a)):
        v = rs[0][:-1]
        strict = points_in_polygon(v[:, 0], v[:, 1], other)
        on_edge = np.array([_on_boundary(p, other) for p in v])
        if (strict & ~on_edge).any():
            return True
    # proper edge crossings
    for e1 in _edges(rings_a[0]):
        for e2 in _edges(rings_b[0]):
            if _seg_intersection(*e1, *e2) is not None:
                return True
    return False


def _edges(ring):
    return [(ring[i], ring[i + 1]) for i in range(len(ring) - 1)]


def _on_boundary(p, geom) -> bool:
    kind, payload = geom
    rings = payload if kind == "Polygon" else [r for rr in payload for r in rr]
    for ring in rings:
        d = ring[1:] - ring[:-1]
        w = p[None, :] - ring[:-1]
        cross = d[:, 0] * w[:, 1] - d[:, 1] * w[:, 0]
        dot = d[:, 0] * w[:, 0] + d[:, 1] * w[:, 1]
        ll = (d * d).sum(axis=1)
        on = (np.abs(cross) < 1e-9) & (dot > -1e-9) & (dot < ll + 1e-9)
        if on.any():
            return True
    return False


# ------------------------------------------------------------------ repair

def make_valid(geom):
    """Repair semantics matching shapely.make_valid for the reference's cases:

    * self-intersecting (bowtie) ring  -> split at crossing nodes into simple
      sub-rings -> MultiPolygon of positive-area parts;
    * MultiPolygon with overlapping parts -> iterative union;
    * hole escaping its shell -> shell minus hole (difference).
    """
    if geom is None or is_valid(geom):
        return geom
    kind, payload = geom
    if kind == "Polygon":
        return _repair_polygon(payload)
    if kind == "MultiPolygon":
        parts = []
        for rings in payload:
            fixed = ("Polygon", rings) if _polygon_valid(rings) else _repair_polygon(rings)
            parts.extend(_as_polygon_list(fixed))
        merged = _union_many([("Polygon", p) for p in parts])
        return merged
    if kind == "GeometryCollection":
        return ("GeometryCollection", [make_valid(g) for g in payload])
    return geom


def _as_polygon_list(geom):
    if geom is None:
        return []
    if geom[0] == "Polygon":
        return [geom[1]]
    if geom[0] == "MultiPolygon":
        return list(geom[1])
    return []


def _repair_polygon(rings):
    shell = rings[0]
    shell_parts = _split_self_intersecting_ring(shell)
    if len(rings) > 1:
        # subtract each (clipped) hole from each shell part
        result = [("Polygon", [p]) for p in shell_parts]
        for hole in rings[1:]:
            hole_parts = _split_self_intersecting_ring(hole)
            for hp in hole_parts:
                result = [piece for poly in result for piece in
                          _as_list(difference(poly, ("Polygon", [hp])))]
        return _collect_polys(result)
    if len(shell_parts) == 1:
        return ("Polygon", [shell_parts[0]])
    return ("MultiPolygon", [[p] for p in shell_parts])


def _as_list(geom):
    if geom is None:
        return []
    if geom[0] == "MultiPolygon":
        return [("Polygon", rings) for rings in geom[1]]
    return [geom]


def _collect_polys(polys):
    polys = [p for p in polys if p is not None]
    if not polys:
        return None
    if len(polys) == 1:
        return polys[0]
    return ("MultiPolygon", [p[1] for p in polys])


def _split_self_intersecting_ring(ring: np.ndarray) -> list[np.ndarray]:
    """Insert self-intersection nodes, then peel simple loops off a stack."""
    inters = ring_self_intersections(ring)
    if not inters:
        return [wkb._close_ring(ring)]
    # insert nodes on each edge, ordered by t along the edge
    pts = []
    n = len(ring) - 1
    for i in range(n):
        pts.append(ring[i])
        a, b = ring[i], ring[i + 1]
        d = b - a
        ts = []
        for q in inters:
            ll = (d * d).sum()
            if ll < _EPS:
                continue
            t = ((q - a) @ d) / ll
            if _EPS < t < 1 - _EPS:
                proj = a + t * d
                if np.hypot(*(proj - q)) < 1e-9:
                    ts.append((t, q))
        for _, q in sorted(ts, key=lambda z: z[0]):
            pts.append(q)
    pts.append(ring[-1])
    # peel loops: when a coordinate repeats, pop the enclosed loop
    out = []
    stack: list[np.ndarray] = []
    keys: list[tuple] = []
    for p in pts:
        key = (round(float(p[0]), 9), round(float(p[1]), 9))
        if key in keys:
            j = keys.index(key)
            loop = stack[j:] + [p]
            if len(loop) >= 4:
                loop_arr = np.vstack(loop)
                if abs(ring_area(loop_arr)) > _EPS:
                    out.append(loop_arr)
            del stack[j + 1:]
            del keys[j + 1:]
        else:
            stack.append(p)
            keys.append(key)
    if len(stack) >= 3:
        loop_arr = wkb._close_ring(np.vstack(stack))
        if len(loop_arr) >= 4 and abs(ring_area(loop_arr)) > _EPS:
            out.append(loop_arr)
    return out if out else [wkb._close_ring(ring)]


# ------------------------------------------------------------------ clipping

def _poly_pts(geom):
    return geom[1][0][:-1]  # open shell


def _gh_clip(subj: np.ndarray, clip: np.ndarray, op: str):
    """Greiner–Hormann-style boolean op on two simple open rings.

    op in {'union','intersection','difference'}.  Returns list of open rings.
    Falls back to None on degenerate input (caller handles).
    """
    subj = _ensure_ccw(subj)
    clip = _ensure_ccw(clip)

    def build(poly_a, poly_b):
        verts = []
        na = len(poly_a)
        for i in range(na):
            verts.append({"pt": poly_a[i], "inter": False})
            a1, a2 = poly_a[i], poly_a[(i + 1) % na]
            hits = []
            nb = len(poly_b)
            for j in range(nb):
                b1, b2 = poly_b[j], poly_b[(j + 1) % nb]
                p = _seg_intersection(a1, a2, b1, b2)
                if p is not None:
                    d = a2 - a1
                    ll = (d * d).sum()
                    t = ((p - a1) @ d) / ll if ll > 0 else 0.0
                    hits.append((t, p))
            for t, p in sorted(hits, key=lambda z: z[0]):
                verts.append({"pt": p, "inter": True})
        return verts

    la = build(subj, clip)
    lb = build(clip, subj)
    inters_a = [v for v in la if v["inter"]]
    if not inters_a:
        return None  # no crossings — disjoint or containment; caller decides

    # pair intersection vertices by coordinates
    def key(p):
        return (round(float(p[0]), 9), round(float(p[1]), 9))

    bmap = {}
    for idx, v in enumerate(lb):
        if v["inter"]:
            bmap.setdefault(key(v["pt"]), []).append(idx)
    for idx, v in enumerate(la):
        if v["inter"]:
            k = key(v["pt"])
            if not bmap.get(k):
                return None
            v["link"] = bmap[k].pop(0)
            lb[v["link"]]["link"] = idx

    # entry/exit flags
    def mark(lst, other_ring, invert):
        # classify from the midpoint of the first edge: a ring VERTEX can lie
        # exactly on the other polygon's boundary (shared-edge fixtures),
        # where even-odd containment is ambiguous; an edge midpoint before
        # the first intersection is strictly in or out
        probe = (lst[0]["pt"] + lst[1]["pt"]) / 2 if len(lst) > 1 else lst[0]["pt"]
        inside = point_in_polygon(
            probe[0], probe[1],
            ("Polygon", [wkb._close_ring(np.vstack([other_ring, other_ring[:1]]))]),
        )
        entry = not inside
        if invert:
            entry = not entry
        for v in lst:
            if v["inter"]:
                v["entry"] = entry
                entry = not entry

    if op == "union":
        mark(la, clip, invert=True)
        mark(lb, subj, invert=True)
    elif op == "intersection":
        mark(la, clip, invert=False)
        mark(lb, subj, invert=False)
    else:  # difference = subj minus clip
        mark(la, clip, invert=True)
        mark(lb, subj, invert=False)

    unprocessed = {i for i, v in enumerate(la) if v["inter"]}
    results = []
    guard = 0
    while unprocessed and guard < 10000:
        start = min(unprocessed)
        ring_pts = []
        cur_list, cur_idx, on_a = la, start, True
        while guard < 10000:
            guard += 1
            v = cur_list[cur_idx]
            if on_a and cur_idx in unprocessed:
                unprocessed.discard(cur_idx)
            ring_pts.append(v["pt"])
            if v["inter"]:
                forward = v["entry"]
                nxt = cur_idx
                n = len(cur_list)
                while True:
                    nxt = (nxt + 1) % n if forward else (nxt - 1) % n
                    ring_pts.append(cur_list[nxt]["pt"])
                    if cur_list[nxt]["inter"]:
                        break
                # switch lists
                cur_idx = cur_list[nxt]["link"]
                cur_list = lb if on_a else la
                on_a = not on_a
                if on_a and cur_idx == start:
                    break
                v2 = cur_list[cur_idx]
                if len(ring_pts) > 2 and key(v2["pt"]) == key(la[start]["pt"]):
                    break
            else:  # pragma: no cover
                break
        if len(ring_pts) >= 3:
            arr = np.vstack(ring_pts)
            dedup = [arr[0]]
            for p in arr[1:]:
                if np.hypot(*(p - dedup[-1])) > 1e-9:
                    dedup.append(p)
            if len(dedup) >= 3:
                results.append(np.vstack(dedup))
    return results or None


def _ensure_ccw(pts: np.ndarray) -> np.ndarray:
    closed = wkb._close_ring(pts)
    if ring_area(closed) < 0:
        return pts[::-1].copy()
    return pts


def _fallback_hull(polys):
    pts = np.vstack([_poly_pts(p) for p in polys])
    return ("Polygon", [wkb._close_ring(convex_hull(pts))])


_ON_EPS = 1e-9


def _pt_on_seg(p, a, b) -> bool:
    """p lies on segment ab (within _ON_EPS), endpoints inclusive."""
    d = b - a
    ll = float(d @ d)
    if ll < _ON_EPS ** 2:
        return bool(np.hypot(*(p - a)) <= _ON_EPS)
    t = float((p - a) @ d) / ll
    if t < -_ON_EPS or t > 1 + _ON_EPS:
        return False
    proj = a + np.clip(t, 0.0, 1.0) * d
    return bool(np.hypot(*(p - proj)) <= _ON_EPS)


def _split_edges(poly_pts: np.ndarray, other_pts: np.ndarray):
    """Directed sub-edges of poly after splitting at (a) other's vertices
    lying ON an edge (collinear/shared-edge contacts) and (b) proper
    edge-edge intersection points — the full segment arrangement, so the
    boundary trace is exact for crossing AND grazing configurations."""
    out = []
    n = len(poly_pts)
    m = len(other_pts)
    for i in range(n):
        a, b = poly_pts[i], poly_pts[(i + 1) % n]
        d = b - a
        ll = float(d @ d)
        cuts = [0.0, 1.0]
        if ll > 0:
            for q in other_pts:
                if _pt_on_seg(q, a, b):
                    t = float((q - a) @ d) / ll
                    if _ON_EPS < t < 1 - _ON_EPS:
                        cuts.append(t)
            for j in range(m):
                p = _seg_intersection(a, b, other_pts[j], other_pts[(j + 1) % m])
                if p is not None:
                    t = float((p - a) @ d) / ll
                    if _ON_EPS < t < 1 - _ON_EPS:
                        cuts.append(round(t, 12))
        cuts = sorted(set(cuts))
        for t0, t1 in zip(cuts[:-1], cuts[1:]):
            p0, p1 = a + t0 * d, a + t1 * d
            if np.hypot(*(p1 - p0)) > _ON_EPS:
                out.append((p0, p1))
    return out


def _boundary_trace_union(a, b):
    return _boundary_trace_op(a, b, "union")


def _boundary_trace_op(a, b, op: str):
    """EXACT boolean op over the full segment arrangement (round 2) —
    handles proper crossings, shared edges, vertex touches, containment and
    disjoint uniformly, where Greiner–Hormann mis-handles grazing contact:

    split both boundaries at intersections and on-edge vertices, classify
    every sub-edge by its midpoint and by shared-segment traversal
    direction, stitch survivors into rings (positive area = shells,
    negative = holes).  Keep rules (CCW simple inputs):

    * union:       edges NOT strictly inside the other; shared same-dir
                   keep one copy, shared opposite-dir drop both;
    * difference:  A-edges NOT strictly inside B (shared opposite-dir keep
                   the A copy, same-dir drop), B-edges strictly inside A
                   REVERSED (they bound the removed region).
    """
    pa = _ensure_ccw(_poly_pts(a))
    pb = _ensure_ccw(_poly_pts(b))
    edges = []  # (p0, p1, src)
    for src, (mine, other, other_poly) in enumerate(
            [(pa, pb, ("Polygon", [wkb._close_ring(pb)])),
             (pb, pa, ("Polygon", [wkb._close_ring(pa)]))]):
        other_subs = _split_edges(other, mine)
        for p0, p1 in _split_edges(mine, other):
            m = (p0 + p1) / 2
            shared_dir = None
            for q0, q1 in other_subs:
                if _pt_on_seg(m, q0, q1) and _pt_on_seg(p0, q0, q1) and _pt_on_seg(p1, q0, q1):
                    shared_dir = 1.0 if float((p1 - p0) @ (q1 - q0)) > 0 else -1.0
                    break
            inside = (shared_dir is None
                      and point_in_polygon(m[0], m[1], other_poly))
            if op == "intersection":
                if shared_dir is not None:
                    if shared_dir > 0 and src == 0:
                        edges.append((p0, p1, src))  # one copy of shared run
                    continue
                if inside:
                    edges.append((p0, p1, src))
                continue
            if op == "union":
                if shared_dir is not None:
                    if shared_dir < 0 or src == 1:
                        continue      # opposite: interior; same-dir: one copy
                    edges.append((p0, p1, src))
                    continue
                if inside:
                    continue
                edges.append((p0, p1, src))
            else:  # difference a - b
                if src == 0:
                    if shared_dir is not None:
                        if shared_dir > 0:
                            continue  # same-dir shared: removed with B
                        edges.append((p0, p1, src))
                        continue
                    if inside:
                        continue      # inside B: removed
                    edges.append((p0, p1, src))
                else:
                    if shared_dir is not None:
                        continue      # B edge on A's boundary: not interior
                    if inside:
                        edges.append((p1, p0, src))  # reversed: hole/cut wall

    def kf(p):
        return (round(float(p[0]), 9), round(float(p[1]), 9))

    adj: dict[tuple, list] = {}
    for e in edges:
        adj.setdefault(kf(e[0]), []).append(e)
    rings = []
    used = set()
    for e in edges:
        if id(e) in used:
            continue
        ring = [e[0]]
        cur = e
        used.add(id(cur))
        guard = 0
        while guard < 10 * len(edges) + 10:
            guard += 1
            nxts = [x for x in adj.get(kf(cur[1]), []) if id(x) not in used]
            if not nxts:
                break
            # prefer continuing along the same source boundary (keeps
            # vertex-touching components as separate rings)
            same = [x for x in nxts if x[2] == cur[2]]
            cur = (same or nxts)[0]
            used.add(id(cur))
            if kf(cur[0]) == kf(e[0]) and len(ring) >= 2:
                break
            ring.append(cur[0])
            if kf(cur[1]) == kf(e[0]):
                break
        if len(ring) >= 3:
            rings.append(wkb._close_ring(np.vstack(ring)))
    shells = [r for r in rings if ring_area(r) > _EPS]
    holes = [r for r in rings if ring_area(r) < -_EPS]
    if not shells:
        return None
    if len(shells) == 1:
        return ("Polygon", [shells[0]] + holes)
    # attach holes to the shell containing them
    polys = [[s] for s in shells]
    for h in holes:
        cx, cy = h[:-1, 0].mean(), h[:-1, 1].mean()
        for parts in polys:
            if point_in_polygon(cx, cy, ("Polygon", [parts[0]])):
                parts.append(h)
                break
    return ("MultiPolygon", polys)


def union(a, b):
    """Union of two simple polygons (no holes in inputs).

    Primary path: the exact boundary trace over the full segment
    arrangement (_boundary_trace_union) — handles proper crossings, shared
    edges, vertex touches, containment and disjoint uniformly (round-2:
    replaces the round-1 convex-hull fallback AND the Greiner–Hormann
    grazing-contact failure modes).  A sanity bound rejects a trace whose
    area is impossible for a union (fp-degenerate input) and falls back to
    the GH clipper."""
    pa, pb = _poly_pts(a), _poly_pts(b)
    area_a = abs(ring_area(wkb._close_ring(pa)))
    area_b = abs(ring_area(wkb._close_ring(pb)))
    traced = _boundary_trace_union(a, b)
    if traced is not None:
        got = _geom_area(traced)
        if max(area_a, area_b) - 1e-9 <= got <= area_a + area_b + 1e-9:
            return traced
    rings = _gh_clip(pa, pb, "union")
    if rings is None:
        if points_in_polygon(pa[:1, 0], pa[:1, 1], b)[0]:
            return b
        if points_in_polygon(pb[:1, 0], pb[:1, 1], a)[0]:
            return a
        return ("MultiPolygon", [a[1], b[1]])
    rings = [r for r in rings if abs(ring_area(wkb._close_ring(r))) > _EPS]
    if not rings:
        return _fallback_hull([a, b])
    outer = max(rings, key=lambda r: abs(ring_area(wkb._close_ring(r))))
    return ("Polygon", [wkb._close_ring(outer)])


def _geom_area(g) -> float:
    """Signed-area sum of a Polygon/MultiPolygon (holes negative)."""
    if g[0] == "Polygon":
        return sum(ring_area(r) for r in g[1])
    return sum(sum(ring_area(r) for r in rings) for rings in g[1])


def intersection(a, b):
    """a AND b for simple polygons (no holes in inputs) — exact boundary
    trace with an area sanity bound, GH fallback (round 2: completes the
    boolean trio; ST_Intersection analog for clip/overlay workflows)."""
    pa, pb = _poly_pts(a), _poly_pts(b)
    cap = min(abs(ring_area(wkb._close_ring(pa))), abs(ring_area(wkb._close_ring(pb))))
    traced = _boundary_trace_op(a, b, "intersection")
    if traced is not None and -1e-9 <= _geom_area(traced) <= cap + 1e-9:
        return traced
    if traced is None:
        # no surviving edges: disjoint/touching (empty) unless one polygon
        # contains the other entirely
        if points_in_polygon(pa[:1, 0], pa[:1, 1], b)[0]:
            return a
        if points_in_polygon(pb[:1, 0], pb[:1, 1], a)[0]:
            return b
        return None
    rings = _gh_clip(pa, pb, "intersection")
    if not rings:
        return None
    rings = [wkb._close_ring(r) for r in rings if abs(ring_area(wkb._close_ring(r))) > _EPS]
    if not rings:
        return None
    if len(rings) == 1:
        return ("Polygon", [rings[0]])
    return ("MultiPolygon", [[r] for r in rings])


def difference(a, b):
    """a minus b for simple polygons (no holes in inputs).

    Primary path: the exact boundary trace (see _boundary_trace_op) with an
    area sanity bound; Greiner–Hormann fallback for fp-degenerate input."""
    pa, pb = _poly_pts(a), _poly_pts(b)
    area_a = abs(ring_area(wkb._close_ring(pa)))
    area_b = abs(ring_area(wkb._close_ring(pb)))
    traced = _boundary_trace_op(a, b, "difference")
    if traced is not None:
        got = _geom_area(traced)
        if area_a - area_b - 1e-9 <= got <= area_a + 1e-9:
            return traced
    rings = _gh_clip(pa, pb, "difference")
    if rings is None:
        if points_in_polygon(pa[:1, 0], pa[:1, 1], b)[0]:
            return None  # a fully inside b
        if points_in_polygon(pb[:1, 0], pb[:1, 1], a)[0]:
            return ("Polygon", [wkb._close_ring(pa), wkb._close_ring(pb)])  # hole
        return a
    rings = [wkb._close_ring(r) for r in rings]
    rings = [r for r in rings if abs(ring_area(r)) > _EPS]
    if not rings:
        return None
    if len(rings) == 1:
        return ("Polygon", [rings[0]])
    return ("MultiPolygon", [[r] for r in rings])


def _polys_touch(rings_a, rings_b) -> bool:
    """Boundaries touch (vertex on the other's boundary) without interior
    overlap — the shared-edge / vertex-contact configurations the exact
    boundary trace can dissolve."""
    a, b = ("Polygon", rings_a), ("Polygon", rings_b)
    for rs, other in ((rings_a, b), (rings_b, a)):
        for p in rs[0][:-1]:
            if _on_boundary(p, other):
                return True
    return False


def _union_many(polys):
    """Iterative pairwise union (exact boundary trace inside ``union``).

    Round-2: shared-edge/touching neighbors now DISSOLVE exactly (shapely
    unary_union semantics) — round 1 skipped them (no interior overlap) or
    hull-approximated them.  A MultiPolygon result from ``union`` means the
    pair is genuinely separate (disjoint or point-touch), not a failure."""
    parts = list(polys)
    changed = True
    guard = 0
    while changed and guard < 100:
        guard += 1
        changed = False
        out = []
        while parts:
            cur = parts.pop()
            merged = False
            for i, other in enumerate(out):
                if _polys_bbox_overlap(cur, other) and (
                        _polys_overlap(cur[1], other[1])
                        or _polys_touch(cur[1], other[1])):
                    try:
                        u = union(cur, other)
                    except Exception:
                        u = _fallback_hull([cur, other])
                    if u[0] == "MultiPolygon":
                        continue  # separate components: leave unmerged
                    out[i] = u
                    merged = True
                    changed = True
                    break
            if not merged:
                out.append(cur)
        parts = out
    return _collect_polys(parts)


def _polys_bbox_overlap(a, b) -> bool:
    ax0, ay0, ax1, ay1 = wkb.bounds(a)
    bx0, by0, bx1, by1 = wkb.bounds(b)
    return not (ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0)


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.vstack(lower[:-1] + upper[:-1])


# ------------------------------------------------------------ grid index

class PolygonGridIndex:
    """STRtree stand-in for broadcast PIP: a uniform bin grid over the
    polygon set's bbox maps each bin to its candidate polygons.

    Query cost per point batch: one digitize (2 numpy ops) + an argsort +
    per-bin ray casts against (typically) one candidate — O(n) memory
    traffic instead of n_polygons full-length masks.  This is what keeps
    the broadcast PIP join compute-bound (scalable) rather than
    bandwidth-bound at high executor counts.
    """

    def __init__(self, polygons: list[tuple], nx: int | None = None,
                 ny: int | None = None):
        """polygons: list of (poly_id, payload, (minx,miny,maxx,maxy), geom)."""
        self.polys = polygons
        side = max(4, int(2 * np.sqrt(len(polygons))))
        nx = nx or side
        ny = ny or side
        self.nx, self.ny = nx, ny
        xs = [b[2] for b in polygons]
        self.minx = min(b[0] for b in xs)
        self.miny = min(b[1] for b in xs)
        self.maxx = max(b[2] for b in xs)
        self.maxy = max(b[3] for b in xs)
        self.wx = (self.maxx - self.minx) / nx or 1.0
        self.wy = (self.maxy - self.miny) / ny or 1.0
        self.bins: dict[int, list[int]] = {}
        for pi, (_, _, (x0, y0, x1, y1), _) in enumerate(polygons):
            bx0 = max(0, int((x0 - self.minx) / self.wx))
            bx1 = min(nx - 1, int((x1 - self.minx) / self.wx))
            by0 = max(0, int((y0 - self.miny) / self.wy))
            by1 = min(ny - 1, int((y1 - self.miny) / self.wy))
            for by in range(by0, by1 + 1):
                for bx in range(bx0, bx1 + 1):
                    self.bins.setdefault(by * nx + bx, []).append(pi)

    def assign(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Vectorized first-match polygon index per point (-1 = no match).

        Points are grouped by their bin's *sole candidate polygon* (the
        overwhelmingly common case), so the python-level loop runs once per
        polygon (~n_polys iterations), each on a contiguous subset —
        O(n log n) sort + O(n) ray casting, no per-polygon full-length masks.
        """
        n = len(px)
        out = np.full(n, -1, dtype=np.int32)
        if n == 0:
            return out
        # single-candidate lookup per bin; -1 = empty bin, -2 = multi
        nbins = self.nx * self.ny
        bin_cand = np.full(nbins, -1, dtype=np.int32)
        for key, cands in self.bins.items():
            bin_cand[key] = cands[0] if len(cands) == 1 else -2
        bx = np.floor((px - self.minx) / self.wx).astype(np.int64)
        by = np.floor((py - self.miny) / self.wy).astype(np.int64)
        inb = (bx >= 0) & (bx < self.nx) & (by >= 0) & (by < self.ny)
        keys = np.where(inb, by * self.nx + bx, 0)
        guess = np.where(inb, bin_cand[keys], -1)
        order = np.argsort(guess, kind="stable")
        sg = guess[order]
        starts = np.nonzero(np.diff(sg, prepend=sg[0] - 1))[0]
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            g = int(sg[s])
            if g == -1:
                continue
            idx = order[s:e]
            if g >= 0:  # exactly one candidate for every point in this run
                _, _, (x0, y0, x1, y1), geom = self.polys[g]
                m = (px[idx] >= x0) & (px[idx] <= x1) & (py[idx] >= y0) & (py[idx] <= y1)
                sub = idx[m]
                if len(sub):
                    hit = points_in_polygon(px[sub], py[sub], geom)
                    out[sub[hit]] = g
            else:  # multi-candidate bins: rare, resolve per bin
                mkeys = keys[idx]
                morder = np.argsort(mkeys, kind="stable")
                midx = idx[morder]
                mk = mkeys[morder]
                bstarts = np.nonzero(np.diff(mk, prepend=mk[0] - 1))[0]
                bends = np.append(bstarts[1:], len(midx))
                for bs, be in zip(bstarts, bends):
                    cands = self.bins.get(int(mk[bs]), [])
                    unresolved = midx[bs:be]
                    for pi in cands:
                        if not len(unresolved):
                            break
                        _, _, (x0, y0, x1, y1), geom = self.polys[pi]
                        m = ((px[unresolved] >= x0) & (px[unresolved] <= x1)
                             & (py[unresolved] >= y0) & (py[unresolved] <= y1))
                        sub = unresolved[m]
                        if len(sub):
                            hit = points_in_polygon(px[sub], py[sub], geom)
                            out[sub[hit]] = pi
                            unresolved = unresolved[out[unresolved] < 0]
        return out


# ------------------------------------------------------------------ buffer

def buffer_geom(geom, dist: float, segments: int = 16):
    """Buffer points/lines to polygons (circle n-gons / capsules).

    Used only by the GeometryCollection->MultiPolygon conversion
    (reference ``process_data.py:163-166`` buffers with shapely ``buffer``);
    the n-gon approximation is documented engine behavior.
    """
    kind, payload = geom
    ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    circ = np.stack([np.cos(ang), np.sin(ang)], axis=1) * dist
    if kind == "Point":
        return ("Polygon", [wkb._close_ring(payload[None, :] + circ)])
    if kind == "MultiPoint":
        return _union_many([buffer_geom(("Point", np.asarray(p)), dist, segments) for p in payload]) \
            or ("MultiPolygon", [])
    if kind == "LineString":
        # capsule = convex hull per segment, unioned
        parts = []
        for i in range(len(payload) - 1):
            seg = payload[i:i + 2]
            cloud = np.vstack([seg[0] + circ, seg[1] + circ])
            parts.append(("Polygon", [wkb._close_ring(convex_hull(cloud))]))
        return _union_many(parts) if parts else None
    if kind == "MultiLineString":
        return _union_many([buffer_geom(("LineString", l), dist, segments) for l in payload])
    return geom


# ------------------------------------------------------- GC conversion

def convert_geometry_collection(geom, buffer_distance: float = 0.5):
    """Reference conversion matrix (``process_data.py:132-181``):

    * single-member collection  -> the member itself
    * homogeneous members       -> Multi* of the members
    * mixed                     -> buffer points/lines, dissolve, MultiPolygon

    Returns (converted_geom, was_converted).
    """
    if geom is None or geom[0] != "GeometryCollection":
        return geom, False
    members = geom[1]
    if len(members) == 1:
        return members[0], True
    types = {g[0] for g in members}
    if types == {"LineString"}:
        return ("MultiLineString", [g[1] for g in members]), True
    if types == {"Point"}:
        return ("MultiPoint", [g[1] for g in members]), True
    if types == {"Polygon"}:
        return ("MultiPolygon", [g[1] for g in members]), True
    if types == {"MultiLineString"}:
        return ("MultiLineString", [l for g in members for l in g[1]]), True
    if types == {"MultiPoint"}:
        return ("MultiPoint", [p for g in members for p in g[1]]), True
    if types == {"MultiPolygon"}:
        return ("MultiPolygon", [rings for g in members for rings in g[1]]), True
    polys = []
    for g in members:
        if g[0] in ("Point", "LineString", "MultiPoint", "MultiLineString"):
            b = buffer_geom(g, buffer_distance)
            if b is not None:
                polys.extend(_as_list(b) if b[0] != "MultiPolygon" else
                             [("Polygon", rings) for rings in b[1]])
        elif g[0] == "Polygon":
            polys.append(g)
        elif g[0] == "MultiPolygon":
            polys.extend(("Polygon", rings) for rings in g[1])
    if not polys:
        return None, True
    dissolved = _union_many(polys)
    if dissolved is None:
        return None, True
    if dissolved[0] == "Polygon":
        return ("MultiPolygon", [dissolved[1]]), True
    return dissolved, True


# ----------------------------------------------------- raster -> vector

def polygonize_mask(mask: np.ndarray) -> list[np.ndarray]:
    """Exact binary-mask polygonization (GDAL-polygonize analog): boundary
    edges between filled and empty pixels, stitched into closed rings
    (pixel-corner coordinates, x=col, y=row).  Interior edges cancel, so
    the result is exact for pixel-aligned regions; holes come out with the
    opposite orientation automatically.

    Vectorized edge extraction (4 array comparisons), Python only for the
    ring walk over boundary edges — O(perimeter), not O(pixels)."""
    m = np.asarray(mask, dtype=bool)
    h, w = m.shape
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = m
    edges: dict[tuple, list] = {}

    def add(p0, p1):
        edges.setdefault(p0, []).append(p1)

    rs, cs = np.nonzero(m & ~pad[0:-2, 1:-1])      # top neighbor empty
    for r, c in zip(rs.tolist(), cs.tolist()):
        add((c + 1, r), (c, r))
    rs, cs = np.nonzero(m & ~pad[2:, 1:-1])        # bottom neighbor empty
    for r, c in zip(rs.tolist(), cs.tolist()):
        add((c, r + 1), (c + 1, r + 1))
    rs, cs = np.nonzero(m & ~pad[1:-1, 0:-2])      # left neighbor empty
    for r, c in zip(rs.tolist(), cs.tolist()):
        add((c, r), (c, r + 1))
    rs, cs = np.nonzero(m & ~pad[1:-1, 2:])        # right neighbor empty
    for r, c in zip(rs.tolist(), cs.tolist()):
        add((c + 1, r + 1), (c + 1, r))

    rings = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        cur = start
        while True:
            nxts = edges.get(cur)
            if not nxts:
                break
            nxt = nxts.pop()
            if not nxts:
                del edges[cur]
            if nxt == start:
                break
            ring.append(nxt)
            cur = nxt
        if len(ring) >= 4:
            arr = np.asarray(ring + [ring[0]], dtype=np.float64)
            # collapse collinear runs (long straight pixel edges -> one segment)
            keep = [0]
            for i in range(1, len(arr) - 1):
                v1 = arr[i] - arr[keep[-1]]
                v2 = arr[i + 1] - arr[i]
                if abs(v1[0] * v2[1] - v1[1] * v2[0]) > 1e-12:
                    keep.append(i)
            keep.append(len(arr) - 1)
            rings.append(arr[keep])
    return rings


def simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker simplification of a CLOSED ring (first == last).

    Classic recursive-split formulation, iterative with an explicit stack
    and numpy-vectorized perpendicular distances per segment.  Every
    dropped vertex lies within ``tol`` of the line through its retained
    chord endpoints — the standard cartographic bound a vector-tile server
    applies per zoom (tolerance ≈ half a pixel at the serving zoom).
    Returns the input unchanged when already minimal (≤ 4 points) or when
    simplification would collapse below a valid ring."""
    pts = np.asarray(ring, dtype=np.float64)
    n = len(pts)
    if n <= 4:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[i + 1:j]
        a, b = pts[i], pts[j]
        ab = b - a
        l2 = float(ab @ ab)
        if l2 == 0.0:
            d = np.hypot(seg[:, 0] - a[0], seg[:, 1] - a[1])
        else:
            # unclamped perpendicular distance to the chord line
            cross = (seg[:, 0] - a[0]) * ab[1] - (seg[:, 1] - a[1]) * ab[0]
            d = np.abs(cross) / np.sqrt(l2)
        k = int(np.argmax(d))
        if d[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    out = pts[keep]
    return out if len(out) >= 4 else pts
