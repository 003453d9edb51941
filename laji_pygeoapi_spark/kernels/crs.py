"""CRS transforms: EPSG:4326 (WGS84/GRS80 lon-lat) <-> EPSG:3067 (ETRS-TM35FIN).

The reference delegates this to pyproj (``convert_api_filters.py:155-158``,
CRS output transforms in ``template_resource.txt:31-34``).  pyproj is not in
this container, so we implement the transverse-Mercator projection with the
Karney/Krüger series (n^4 terms, published in Karney 2011 "Transverse
Mercator with an accuracy of a few nanometers"), GRS80 ellipsoid, which is
sub-millimeter accurate within a few degrees of the central meridian (all of
Finland) — documented divergence: far outside the zone (>10 deg from 27E) the
series loses accuracy where pyproj would too.

EPSG:3067 parameters: central meridian 27E, scale 0.9996, false easting
500000, false northing 0, GRS80.
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0                   # GRS80 semi-major
_F = 1.0 / 298.257222101         # GRS80 flattening
_K0 = 0.9996
_LON0 = 27.0
_FE = 500000.0
_FN = 0.0

_N = _F / (2.0 - _F)             # third flattening
# rectifying radius
_AA = _A / (1.0 + _N) * (1.0 + _N ** 2 / 4.0 + _N ** 4 / 64.0)
# Krüger alpha (forward) and beta (reverse) series coefficients to n^4
_ALPHA = [
    _N / 2.0 - 2.0 / 3.0 * _N ** 2 + 5.0 / 16.0 * _N ** 3 + 41.0 / 180.0 * _N ** 4,
    13.0 / 48.0 * _N ** 2 - 3.0 / 5.0 * _N ** 3 + 557.0 / 1440.0 * _N ** 4,
    61.0 / 240.0 * _N ** 3 - 103.0 / 140.0 * _N ** 4,
    49561.0 / 161280.0 * _N ** 4,
]
_BETA = [
    _N / 2.0 - 2.0 / 3.0 * _N ** 2 + 37.0 / 96.0 * _N ** 3 - 1.0 / 360.0 * _N ** 4,
    1.0 / 48.0 * _N ** 2 + 1.0 / 15.0 * _N ** 3 - 437.0 / 1440.0 * _N ** 4,
    17.0 / 480.0 * _N ** 3 - 37.0 / 840.0 * _N ** 4,
    4397.0 / 161280.0 * _N ** 4,
]
_DELTA = [
    2.0 * _N - 2.0 / 3.0 * _N ** 2 - 2.0 * _N ** 3 + 116.0 / 45.0 * _N ** 4,
    7.0 / 3.0 * _N ** 2 - 8.0 / 5.0 * _N ** 3 - 227.0 / 45.0 * _N ** 4,
    56.0 / 15.0 * _N ** 3 - 136.0 / 35.0 * _N ** 4,
    4279.0 / 630.0 * _N ** 4,
]
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)


def wgs84_to_tm35fin(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees -> (easting, northing) meters, EPSG:3067."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    lam = np.radians(lon - _LON0)
    # conformal latitude
    s = np.sinh(_E * np.arctanh(_E * np.sin(phi)))
    # exact conformal-latitude form: tan(chi) = tan(phi)*sqrt(1+s^2) - s*sqrt(1+tan^2)
    t = np.tan(phi)
    tp = t * np.sqrt(1.0 + s ** 2) - s * np.sqrt(1.0 + t ** 2)
    xi_p = np.arctan2(tp, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(tp, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2.0 * j * xi_p) * np.cosh(2.0 * j * eta_p)
        eta += a * np.cos(2.0 * j * xi_p) * np.sinh(2.0 * j * eta_p)
    x = _FE + _K0 * _AA * eta
    y = _FN + _K0 * _AA * xi
    return x, y


def tm35fin_to_wgs84(x, y) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing) meters EPSG:3067 -> (lon, lat) degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xi = (y - _FN) / (_K0 * _AA)
    eta = (x - _FE) / (_K0 * _AA)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        eta_p -= b * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    tp = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    chi = np.arctan(tp)
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2.0 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + _LON0, np.degrees(phi)


def bbox_to_tm35fin_wkt(bbox) -> str:
    """Reference ``process_bbox`` semantics (``convert_api_filters.py:148-159``):

    input arrives as (ymin, xmin, ymax, xmax) due to pygeoapi axis handling;
    values in WGS84 range are transformed to EPSG:3067; output WKT POLYGON
    keeps the swapped axis order exactly as the reference does.
    """
    ymin, xmin, ymax, xmax = bbox
    if -180 <= xmin <= 180 and -90 <= ymin <= 90 and -180 <= xmax <= 180 and -90 <= ymax <= 90:
        x0, y0 = wgs84_to_tm35fin(np.float64(xmin), np.float64(ymin))
        x1, y1 = wgs84_to_tm35fin(np.float64(xmax), np.float64(ymax))
        xmin, ymin, xmax, ymax = float(x0), float(y0), float(x1), float(y1)
    return (f"POLYGON(({xmin} {ymin}, {xmax} {ymin}, {xmax} {ymax}, "
            f"{xmin} {ymax}, {xmin} {ymin}))")
