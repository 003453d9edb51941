"""OGC API Features semantics over the occurrence DataFrame.

Replaces the reference's two serving paths with one engine:

* the pygeoapi PostgreSQL provider capabilities (bbox / datetime / property
  equality / sortby / limit+offset paging / id lookup / CRS transform,
  configured in ``scripts/resources/template_resource.txt:17-34``);
* the passthrough provider's filter translation + guards
  (``plugins/lajiapi_provider.py:57-111``, ``convert_api_filters.py``).

Everything compiles to a single ``Column`` predicate + projection, so
Catalyst pushes bbox/property filters into the parquet/Iceberg scan and the
cell cover prunes partitions (the engine's GIST-index replacement).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import registry
from ..functions import expressions as E
from ..operators.spatial import bbox_predicate

MAX_LIMIT = 10_000     # pygeoapi-config.yml:14-16
MAX_ITEMS = 100_000    # lajiapi_provider.py:108-111
DEFAULT_LIMIT = 100


class QueryError(ValueError):
    pass


def validate_paging(limit: int, offset: int) -> tuple[int, int]:
    """P10 — reference ``lajiapi_provider.py:57-74``."""
    if not 1 <= limit <= MAX_LIMIT:
        raise QueryError(f"limit must be in [1, {MAX_LIMIT}]")
    if offset < 0:
        raise QueryError("offset must be >= 0")
    return limit, offset


def convert_property_filters(properties: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """P7/J3 — virva filter name/label normalization
    (reference ``convert_api_filters.py:11-122``): name -> source query name,
    URL-prefix strip, reverse label->code maps (casefold + space-insensitive),
    time normalization, negated boolean for ``onlyNonStateLands``."""
    from ..sources import fixtures
    name_map = registry.filter_name_map()
    label_to_code = {v.replace(" ", "").casefold(): k
                     for k, v in fixtures.value_ranges().items()}
    prov_to_id = {v.replace(" ", "").casefold(): k
                  for k, v in registry.PROVINCE_NAMES.items()}
    out = []
    for name, value in properties:
        if name not in name_map:
            close = [v for v in name_map if v.lower().startswith(name.lower()[:4])]
            raise QueryError(f"Unknown filter '{name}'."
                             + (f" Did you mean '{close[0]}'?" if close else ""))
        qname = name_map[name]
        value = re.sub(r"http://[^/]+\.fi/", "", value) if isinstance(value, str) else value
        if qname in ("lifeStage", "sex", "recordQuality", "collectionQuality",
                     "secureReason", "recordBasis", "redListStatusId",
                     "administrativeStatusId", "atlasClass", "atlasCode",
                     "primaryHabitat"):
            vals = [v.strip() for v in value.split(",")]
            value = ",".join(label_to_code.get(v.replace(" ", "").casefold(), v) for v in vals)
        elif qname == "biogeographicalProvinceId":
            vals = [re.sub(r"\([^)]*\)", "", v).replace(" ", "") for v in value.split(",")]
            value = ",".join(prov_to_id.get(v.casefold(), v0.strip())
                             for v, v0 in zip(vals, value.split(",")))
        elif qname == "time":
            value = re.sub(r"\[\s*\d{1,2}:\d{2}\s*\]", "", value)
            value = re.sub(r"\s+", "", value)
        elif qname == "onlyNonStateLands":
            value = "False" if value.lower() == "true" else "True"
        out.append((qname, value))
    return out


def _property_predicate(name: str, value: str):
    """Direct predicate on the virva table for one normalized filter."""
    col = F.col(name)
    if "," in str(value):
        return col.isin([v.strip() for v in str(value).split(",")])
    return col == value


def items(df: DataFrame, bbox=None, intersects: bytes | None = None,
          datetime_range: str | None = None,
          properties: list[tuple[str, str]] | None = None,
          sortby: list[tuple[str, str]] | None = None,
          limit: int = DEFAULT_LIMIT, offset: int = 0,
          resulttype: str = "results", skip_guard: bool = False):
    """The /collections/{id}/items query -> (page DataFrame, number_matched).

    datetime_range: RFC 'start/end' (open ends with '..') on Keruu_aloitus_pvm
    (time_field, template_resource.txt:29).
    intersects: WKB polygon — OGC intersects filter (north star: "bbox/
    intersects feature queries"); envelope prefilter pushed to the scan, then
    an exact vectorized point-in-polygon UDF on the candidates.
    """
    limit, offset = validate_paging(limit, offset)
    pred = F.lit(True)
    if bbox is not None:
        cell = "cell_prefix" if "cell_prefix" in df.columns else None
        env = (("env_minx", "env_miny", "env_maxx", "env_maxy")
               if "env_minx" in df.columns else None)
        pred = pred & bbox_predicate(*bbox, cell_col=cell, envelope_cols=env)
    if intersects is not None:
        df = _apply_intersects(df, intersects)
        pred = pred & F.col("_intersects")
    if datetime_range:
        if "/" in datetime_range:
            start, end = datetime_range.split("/")
            if start and start != "..":
                pred = pred & (F.col("Keruu_aloitus_pvm") >= F.lit(start[:10]))
            if end and end != "..":
                pred = pred & (F.col("Keruu_aloitus_pvm") <= F.lit(end[:10]))
        else:
            pred = pred & (F.col("Keruu_aloitus_pvm") == F.lit(datetime_range[:10]))
    for name, value in (properties or []):
        pred = pred & _property_predicate(name, value)
    filtered = df.filter(pred)
    number_matched = filtered.count()
    if resulttype == "hits":
        return None, number_matched
    if number_matched > MAX_ITEMS and offset > 0 and not skip_guard:
        raise QueryError(f"result set {number_matched} exceeds {MAX_ITEMS}; "
                         "narrow the query")  # P11 guard
    order = [F.col(c).desc() if d == "-" else F.col(c).asc()
             for c, d in (sortby or [])]
    order.append(F.col(_id_column(df)).asc())  # stable paging key
    page = filtered.orderBy(*order).offset(offset).limit(limit)
    if "_intersects" in page.columns:
        page = page.drop("_intersects")
    return page, number_matched


def _apply_intersects(df: DataFrame, polygon_wkb: bytes) -> DataFrame:
    """Add a boolean ``_intersects`` column: envelope prefilter (pure JVM
    range predicates — scan-prunable) AND exact PIP of the feature point.

    Point features get exact semantics; non-points use their centroid +
    envelope overlap (CENTER_POINT serving representation, the reference's
    ``featureType`` default, ``lajiapi_provider.py:73``)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from ..kernels import geom as G
    from ..kernels import wkb as W

    geom = W.loads(polygon_wkb)
    gx0, gy0, gx1, gy1 = W.bounds(geom)

    @pandas_udf(T.BooleanType())
    def _pip(lon: pd.Series, lat: pd.Series) -> pd.Series:
        import numpy as np
        px = lon.to_numpy(np.float64)
        py = lat.to_numpy(np.float64)
        return pd.Series(G.points_in_polygon(px, py, geom))

    env_ok = ((F.col("lon") >= gx0) & (F.col("lon") <= gx1)
              & (F.col("lat") >= gy0) & (F.col("lat") <= gy1))
    if "env_minx" in df.columns:
        env_ok = env_ok | ((F.col("env_maxx") >= gx0) & (F.col("env_minx") <= gx1)
                           & (F.col("env_maxy") >= gy0) & (F.col("env_miny") <= gy1))
    return df.withColumn(
        "_intersects",
        F.when(env_ok, _pip(F.col("lon"), F.col("lat"))).otherwise(F.lit(False)))


def _id_column(df: DataFrame) -> str:
    for c in ("Paikallinen_tunniste", "image_id", "doc_id"):
        if c in df.columns:
            return c
    return df.columns[0]


def get_feature(df: DataFrame, identifier: str) -> DataFrame:
    """Single feature by id; '_' decodes to '#' (``lajiapi_provider.py:147``)."""
    decoded = identifier.replace("_", "#")
    return df.filter(
        (F.col("Paikallinen_tunniste") == identifier)
        | (F.col("Havainnon_tunniste") == decoded))


def to_geojson(df: DataFrame, id_col: str = "Paikallinen_tunniste",
               crs: str = "CRS84", representation: str = "center") -> DataFrame:
    """S10 — GeoJSON feature strings.

    representation='center' (the reference's CENTER_POINT default,
    ``lajiapi_provider.py:73,151``): Point geometry from the stored
    centroid, built entirely JVM-side (to_json over struct); CRS84 lon/lat
    or TM35FIN E/N for crs='EPSG:3067'.

    representation='original' (the reference's ORIGINAL_FEATURE): the full
    stored geometry decoded from WKB to GeoJSON coordinates in an Arrow
    pandas UDF (lines/polygons/multis round-trip intact).
    """
    if representation == "original" and "geometry" in df.columns:
        geometry_json = _geojson_geometry_udf(F.col("geometry"))
    else:
        if crs == "EPSG:3067":
            from ..functions.geometry import to_tm35fin
            df = df.withColumn("_p", to_tm35fin(F.col("lon"), F.col("lat")))
            coords = F.array(F.col("_p.e"), F.col("_p.n"))
        else:
            coords = F.array(F.col("lon"), F.col("lat"))
        geometry_json = F.to_json(
            F.struct(F.lit("Point").alias("type"), coords.alias("coordinates")))
    props = [c for c in df.columns
             if c not in ("geometry", "lon", "lat", "_p") and not c.startswith("_")]
    feature_wo_geom = F.to_json(F.struct(
        F.lit("Feature").alias("type"),
        F.col(id_col).alias("id"),
        F.struct(*[F.col(c).cast("string").alias(c) for c in props]).alias("properties"),
    ))
    # splice the geometry member into the feature object (string surgery is
    # exact here: feature_wo_geom always starts with '{')
    feature = F.concat(F.lit('{"geometry":'), geometry_json, F.lit(","),
                       F.expr("substring(" + "_fjson" + ", 2)"))
    df = df.withColumn("_fjson", feature_wo_geom)
    return (df.select(F.col(id_col).alias("fid"), feature.alias("feature_json"))
              .drop("_fjson"))


from pyspark.sql import types as _T


@F.pandas_udf(_T.StringType())
def _geojson_geometry_udf(wkb_col: pd.Series) -> pd.Series:
    """WKB -> GeoJSON geometry object string (RFC 7946 structures)."""
    import json

    from ..kernels import wkb as W

    def ring_coords(ring):
        return [[float(x), float(y)] for x, y in ring]

    def geom_obj(g):
        kind, payload = g
        if kind == "Point":
            return {"type": "Point", "coordinates": [float(payload[0]), float(payload[1])]}
        if kind == "LineString":
            return {"type": "LineString", "coordinates": ring_coords(payload)}
        if kind == "Polygon":
            return {"type": "Polygon", "coordinates": [ring_coords(r) for r in payload]}
        if kind == "MultiPoint":
            return {"type": "MultiPoint",
                    "coordinates": [[float(p[0]), float(p[1])] for p in payload]}
        if kind == "MultiLineString":
            return {"type": "MultiLineString",
                    "coordinates": [ring_coords(l) for l in payload]}
        if kind == "MultiPolygon":
            return {"type": "MultiPolygon",
                    "coordinates": [[ring_coords(r) for r in rings] for rings in payload]}
        return {"type": "GeometryCollection",
                "geometries": [geom_obj(m) for m in payload]}

    out = []
    for blob in wkb_col:
        if blob is None:
            out.append("null")
        else:
            out.append(json.dumps(geom_obj(W.loads(bytes(blob)))))
    return pd.Series(out)
