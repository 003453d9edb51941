"""Spatial cell indexes (pure numpy, vectorized): hex grid, S2, slippy tiles.

The north rule asks for H3 (res 5-9) + S2 cell encoding, k-ring kNN expansion
and raster tile keys.  The h3 library is not available in this container, so:

* ``hexcell`` — a multi-resolution pointy-top hexagonal grid over lon/lat
  with TRUE aperture-7 nesting (per-resolution lattice rotation, exactly 7
  child centers per parent — see _ALPHA7), axial-coordinate cell ids packed
  into int64, exact k-ring neighborhoods, bbox covers and polygon polyfill.
  It is an H3 *analog*: identical API surface, semantics and asymptotics,
  different bit layout (documented, deterministic).
* ``s2`` functions — a faithful S2 cell id implementation from the published
  S2 geometry spec (cube-face projection + Hilbert curve), levels 0-30.
* ``tile`` functions — WebMercator z/x/y keys (OSM slippy-map spec), used for
  raster tile materialization.
* ``haversine`` — exact great-circle distance for the kNN re-rank
  (north rule: "kNN via H3 k-ring + haversine re-rank").

All entry points accept numpy arrays and are loop-free over rows (the S2
encoder loops over 8 nibble iterations, not over rows).
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------------ hex grid

# Circumradius of a res-0 hex in degrees; each finer resolution shrinks the
# area by 7x (aperture 7, like H3), i.e. linear size by sqrt(7).
_R0 = 11.0
_SQRT7 = np.sqrt(7.0)
_SQRT3 = np.sqrt(3.0)
_OFFSET = 1 << 25  # axial coords packed with this offset (26 bits each)

# TRUE aperture-7 nesting rotates each finer lattice by arg(2 + w) where
# w = e^{i*pi/3}: atan2(sqrt(3), 5) ~= 19.106605 deg (H3 rotates the same
# amount, alternating Class II/III; a single cumulative direction keeps the
# math one rotation).  With the rotation, the res-(r+1) lattice is the
# res-r lattice scaled by 1/sqrt(7) and each parent hex contains EXACTLY 7
# child centers — the property round-1 only approximated.
_ALPHA7 = float(np.arctan2(np.sqrt(3.0), 5.0))

MAX_HEX_RES = 15


def _hex_size(res) -> float:
    return _R0 / _SQRT7 ** np.asarray(res, dtype=np.float64)


def _rot(res: int) -> tuple[float, float]:
    th = float(res) * _ALPHA7
    return float(np.cos(th)), float(np.sin(th))


def hex_cell(lon, lat, res: int) -> np.ndarray:
    """Vectorized (lon, lat) -> int64 hex cell id at resolution 0..15."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    size = _hex_size(res)
    c, s = _rot(res)
    x = c * lon + s * lat
    y = -s * lon + c * lat
    # pointy-top axial coords in the res-rotated frame
    q = (_SQRT3 / 3.0 * x - 1.0 / 3.0 * y) / size
    r = (2.0 / 3.0 * y) / size
    qi, ri = _axial_round(q, r)
    return _pack(qi, ri, res)


def _axial_round(q, r):
    """Cube-coordinate rounding (standard hex-grid algorithm).

    Uses floor(x+0.5) (half-up) instead of numpy's half-to-even so the exact
    same computation is expressible in ANSI SQL for the DuckDB oracle."""
    x, z = q, r
    y = -x - z
    rx = np.floor(x + 0.5)
    ry = np.floor(y + 0.5)
    rz = np.floor(z + 0.5)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def _pack(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    return (np.int64(res) << np.int64(56)) | ((q + _OFFSET) << np.int64(28)) | (r + _OFFSET)


def hex_unpack(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (res, q, r)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> np.int64(56)
    q = ((cell >> np.int64(28)) & np.int64((1 << 28) - 1)) - _OFFSET
    r = (cell & np.int64((1 << 28) - 1)) - _OFFSET
    return res, q, r


def hex_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """cell id -> (lon, lat) of the hex center."""
    res, q, r = hex_unpack(cell)
    size = _hex_size(res)
    x = size * (_SQRT3 * q + _SQRT3 / 2.0 * r)
    y = size * 1.5 * r
    th = res.astype(np.float64) * _ALPHA7
    c, s = np.cos(th), np.sin(th)
    return c * x - s * y, s * x + c * y


def hex_parent(cell, parent_res: int) -> np.ndarray:
    """Coarser cell containing this cell's center (approximate nesting, like H3)."""
    lon, lat = hex_center(cell)
    return hex_cell(lon, lat, parent_res)


def hex_kring_offsets(k: int) -> np.ndarray:
    """All (dq, dr) axial offsets within hex distance k — (3k^2+3k+1, 2)."""
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append((dq, dr))
    return np.asarray(out, dtype=np.int64)


def hex_kring(cell, k: int) -> np.ndarray:
    """k-ring cell ids; input (n,) -> output (n, 3k^2+3k+1)."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res, q, r = hex_unpack(cell)
    off = hex_kring_offsets(k)
    qs = q[:, None] + off[None, :, 0]
    rs = r[:, None] + off[None, :, 1]
    return (res[:, None] << np.int64(56)) | ((qs + _OFFSET) << np.int64(28)) | (rs + _OFFSET)


def hex_boundary(cell) -> np.ndarray:
    """Hex corner coords, (6, 2) lon/lat, for a single cell id."""
    res, q, r = hex_unpack(np.asarray([cell], dtype=np.int64))
    size = float(_hex_size(int(res[0])))
    cx = size * (_SQRT3 * float(q[0]) + _SQRT3 / 2.0 * float(r[0]))
    cy = size * 1.5 * float(r[0])
    ang = np.pi / 180.0 * (60.0 * np.arange(6) - 30.0)
    gx = cx + size * np.cos(ang)
    gy = cy + size * np.sin(ang)
    c, s = _rot(int(res[0]))
    return np.stack([c * gx - s * gy, s * gx + c * gy], axis=1)


def hex_cells_in_bbox(minx, miny, maxx, maxy, res: int) -> np.ndarray:
    """All hex cells whose center lies in (or within one hex of) the bbox —
    the cell-range predicate generator for bbox pushdown (SURVEY §4)."""
    size = float(_hex_size(res))
    pad = size * 1.01
    c, s = _rot(res)
    # candidate axial range from the padded bbox corners, rotated into the
    # res frame (rotation preserves distances, so the pad stays valid)
    corners = np.array([
        [minx - pad, miny - pad], [maxx + pad, miny - pad],
        [minx - pad, maxy + pad], [maxx + pad, maxy + pad],
    ])
    gx = c * corners[:, 0] + s * corners[:, 1]
    gy = -s * corners[:, 0] + c * corners[:, 1]
    q = (_SQRT3 / 3.0 * gx - 1.0 / 3.0 * gy) / size
    r = (2.0 / 3.0 * gy) / size
    q0, q1 = int(np.floor(q.min())) - 1, int(np.ceil(q.max())) + 1
    r0, r1 = int(np.floor(r.min())) - 1, int(np.ceil(r.max())) + 1
    qs, rs = np.meshgrid(np.arange(q0, q1 + 1), np.arange(r0, r1 + 1), indexing="ij")
    qs, rs = qs.ravel(), rs.ravel()
    cx = size * (_SQRT3 * qs + _SQRT3 / 2.0 * rs)
    cy = size * 1.5 * rs
    lon = c * cx - s * cy
    lat = s * cx + c * cy
    keep = (lon >= minx - pad) & (lon <= maxx + pad) & (lat >= miny - pad) & (lat <= maxy + pad)
    return _pack(qs[keep].astype(np.int64), rs[keep].astype(np.int64), res)


# ------------------------------------------------------------------ S2

# Published S2 Hilbert-curve constants.
_SWAP, _INVERT = 1, 2
_POS_TO_IJ = np.array([[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.int64)

_LOOKUP_BITS = 4
_lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level, i, j, orig_orient, pos, orient):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
        _lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        ij = r[idx]
        _init_lookup(level, i + (ij >> 1), j + (ij & 1), orig_orient,
                     pos + idx, orient ^ int(_POS_TO_ORIENT[idx]))


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


def _xyz_from_lonlat(lon, lat):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lon, dtype=np.float64))
    cosphi = np.cos(phi)
    return np.cos(theta) * cosphi, np.sin(theta) * cosphi, np.sin(phi)


def _face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + np.where(
        (face == 0) & (x < 0), 3, np.where((face == 1) & (y < 0), 3,
                                           np.where((face == 2) & (z < 0), 3, 0)))
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ucalc, vcalc) in enumerate([
        (lambda: y / x, lambda: z / x),
        (lambda: -x / y, lambda: z / y),
        (lambda: -x / z, lambda: -y / z),
        (lambda: z / x, lambda: y / x),
        (lambda: z / y, lambda: -x / y),
        (lambda: -y / z, lambda: -x / z),
    ]):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ucalc()[m]
                v[m] = vcalc()[m]
    return face.astype(np.int64), u, v


def _st_from_uv(u):
    return np.where(u >= 0,
                    0.5 * np.sqrt(np.maximum(1 + 3 * u, 0.0)),
                    1 - 0.5 * np.sqrt(np.maximum(1 - 3 * u, 0.0)))


def s2_cell(lon, lat, level: int = 30) -> np.ndarray:
    """Vectorized (lon, lat) -> S2 cell id (int64) at the given level."""
    x, y, z = _xyz_from_lonlat(lon, lat)
    face, u, v = _face_uv(x, y, z)
    i = np.clip((np.floor(_st_from_uv(u) * (1 << 30))).astype(np.int64), 0, (1 << 30) - 1)
    j = np.clip((np.floor(_st_from_uv(v) * (1 << 30))).astype(np.int64), 0, (1 << 30) - 1)
    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & np.int64(_SWAP)).astype(np.int64)
    mask = np.int64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        ii = (i >> np.int64(k * _LOOKUP_BITS)) & mask
        jj = (j >> np.int64(k * _LOOKUP_BITS)) & mask
        bits += ((ii << _LOOKUP_BITS) + jj) << np.int64(2)
        bits = _lookup_pos[bits]
        n |= (bits >> np.int64(2)).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.int64(_SWAP + _INVERT)
    cell = n * np.uint64(2) + np.uint64(1)  # leaf (level 30) id
    if level < 30:
        lsb = np.uint64(1) << np.uint64(2 * (30 - level))
        cell = (cell & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb
    return cell.astype(np.int64)


def s2_level(cell) -> np.ndarray:
    """Level of an S2 cell id = 30 - (trailing zero count)/2."""
    c = np.asarray(cell, dtype=np.uint64)
    lsb = c & (~c + np.uint64(1))
    tz = np.zeros(c.shape, dtype=np.int64)
    l = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = l >= (np.uint64(1) << np.uint64(shift))
        tz += np.where(big, shift, 0)
        l = np.where(big, l >> np.uint64(shift), l)
    return 30 - tz // 2


def s2_parent(cell, level: int) -> np.ndarray:
    c = np.asarray(cell, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (30 - level))
    return (((c & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb)).astype(np.int64)


# ------------------------------------------------------------------ tiles

def mercator_tile(lon, lat, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """OSM slippy-map tile (x, y) at a zoom level; lat clamped to Mercator range."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    n = np.float64(1 << zoom)
    xt = np.floor((lon + 180.0) / 360.0 * n)
    lat_rad = np.radians(lat)
    yt = np.floor((1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n)
    nmax = (1 << zoom) - 1
    return (np.clip(xt, 0, nmax).astype(np.int64), np.clip(yt, 0, nmax).astype(np.int64))


def tile_bounds(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """(west, south, east, north) of a slippy tile in lon/lat."""
    n = float(1 << z)
    west = x / n * 360.0 - 180.0
    east = (x + 1) / n * 360.0 - 180.0
    north = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * y / n))))
    south = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (y + 1) / n))))
    return west, south, east, north


# ------------------------------------------------------------------ distance

EARTH_RADIUS_M = 6371008.8


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters (vectorized, broadcasting)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def hex_polyfill(geom, res: int) -> np.ndarray:
    """Cells whose center lies in (or within one hex of) the polygon — the
    H3 polyfill analog.  Starts from the bbox cover, keeps cells whose
    center is inside the geometry or within one hex size of its boundary
    (conservative: a cover for pruning must not under-select)."""
    from . import geom as G
    from . import wkb as W
    minx, miny, maxx, maxy = W.bounds(geom)
    cand = hex_cells_in_bbox(minx, miny, maxx, maxy, res)
    if len(cand) == 0:
        return cand
    lon, lat = hex_center(cand)
    inside = G.points_in_polygon(lon, lat, geom)
    size = float(_hex_size(res))
    near = np.zeros(len(cand), dtype=bool)
    rings = geom[1] if geom[0] == "Polygon" else [r for rr in geom[1] for r in rr]
    for ring in rings:
        a = ring[:-1]
        b = ring[1:]
        d = b - a
        ll = (d * d).sum(axis=1)
        ll[ll == 0] = 1.0
        # distance from every candidate center to every boundary segment
        w = lon[:, None] - a[None, :, 0], lat[:, None] - a[None, :, 1]
        t = np.clip((w[0] * d[None, :, 0] + w[1] * d[None, :, 1]) / ll[None, :], 0.0, 1.0)
        dx = w[0] - t * d[None, :, 0]
        dy = w[1] - t * d[None, :, 1]
        near |= ((dx * dx + dy * dy).min(axis=1) <= size * size)
    return cand[inside | near]
