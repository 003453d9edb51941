"""The occurrence transform chain as ONE lazy DataFrame plan (SURVEY.md M1).

Reference eager pandas chain (``main.py:93-115``):
``merge_taxonomy_data -> combine_similar_columns -> compute_all ->
translate_column_names -> convert_geometry_collection -> validate_geometry``.

Here each step contributes column expressions to a single Catalyst plan:
a broadcast join (J1), one wide projection (F5 + J2 + P2 casts), and one
fused geometry pandas UDF — so the whole chain is a scan -> bhj -> project ->
eval(udf) -> project pipeline with no materialization barriers.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import registry
from ..sources import fixtures
from . import expressions as E
from .geometry import process_geometry

_SIMILAR_RE = re.compile(r"^(.*)\[\d+\]$")

# columns mapped through value_ranges after URL-strip (compute_variables.py:161-167)
STRIP_URL_COLS = [
    "unit.atlasClass", "unit.atlasCode", "unit.linkings.taxon.primaryHabitat.habitat",
    "unit.linkings.taxon.latestRedListStatusFinland.status",
    "unit.linkings.taxon.threatenedStatus",
]
# columns mapped directly (compute_variables.py:183-191)
DIRECT_MAP_COLS = [
    "unit.recordBasis", "unit.interpretations.recordQuality", "document.secureReasons",
    "unit.lifeStage", "unit.sex", "unit.abundanceUnit",
    "document.linkings.collectionQuality",
]


def merge_taxonomy(df: DataFrame, taxonomy: DataFrame) -> DataFrame:
    """J1 — left broadcast equi-join on the regex-extracted MVL key
    (reference ``process_data.py:8-23``)."""
    src = "unit.linkings.taxon.informalTaxonGroups[0]"
    if src not in df.columns:
        df = df.withColumn(src, F.lit(None).cast("string"))
    df = df.withColumn(src, E.taxon_key(E.c(src)))
    return df.join(F.broadcast(taxonomy), df[f"`{src}`"] == taxonomy["id"], "left")


def combine_similar_columns(df: DataFrame) -> DataFrame:
    """F5 — fold ``col[0], col[1], ...`` into one ', '-joined string column
    (reference ``process_data.py:41-84``; float formatting via cast-to-string,
    null skip via concat_ws)."""
    groups: dict[str, list[str]] = {}
    for col in df.columns:
        m = _SIMILAR_RE.match(col)
        if m:
            groups.setdefault(m.group(1), []).append(col)
    if not groups:
        return df
    new_cols = {base: F.concat_ws(", ", *[E.c(c).cast("string") for c in cols])
                for base, cols in groups.items()}
    df = df.withColumns(new_cols)
    return df.drop(*[c for cols in groups.values() for c in cols])


def _map_literal(d: dict[str, str]):
    pairs = []
    for k, v in d.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


def compute_all(df: DataFrame, value_ranges: dict[str, str] | None = None,
                collections: dict[str, str] | None = None,
                ely: dict[str, str] | None = None,
                evk: dict[str, str] | None = None) -> DataFrame:
    """J2 dictionary joins + A7 presence + computed ids
    (reference ``compute_variables.py:199-241``).

    Dictionaries become in-plan map literals (constant-folded by Catalyst).
    At 10^12-row scale with dimension tables beyond literal size, swap
    ``_map_literal`` for a broadcast-join — semantics identical.
    """
    value_ranges = value_ranges if value_ranges is not None else fixtures.value_ranges()
    collections = collections if collections is not None else dict(
        zip(fixtures.collections_pdf()["id"], fixtures.collections_pdf()["longName"]))
    areas = fixtures.MUNICIPALITY_AREAS
    ely = ely if ely is not None else {k: v[0] for k, v in areas.items()}
    evk = evk if evk is not None else {k: v[1] for k, v in areas.items()}

    vr = _map_literal(value_ranges)
    cn = _map_literal(collections)
    ely_m = _map_literal(ely)
    evk_m = _map_literal(evk)

    out: dict[str, F.Column] = {}
    for col in STRIP_URL_COLS:
        if col in df.columns:
            out[col] = E.map_single_value(E.c(col), vr, strip_url=True)
    for col in DIRECT_MAP_COLS:
        if col in df.columns:
            out[col] = E.map_single_value(E.c(col), vr)
    if "unit.linkings.taxon.administrativeStatuses" in df.columns:
        out["unit.linkings.taxon.administrativeStatuses"] = E.map_multi_values(
            E.c("unit.linkings.taxon.administrativeStatuses"), vr)
    out["Esiintyman_tila"] = E.presence(E.c("unit.interpretations.individualCount"))
    out["Aineisto"] = E.map_single_value(E.id_tail(E.c("document.collectionId")), cn)
    muni = E.c("gathering.interpretations.municipalityDisplayname")
    out["Vastuualue"] = E.map_multi_values(muni, ely_m, strip_url=False)
    out["Elinvoimakeskus"] = E.map_multi_values(muni, evk_m, strip_url=False)
    out["Paikallinen_tunniste"] = E.encode_local_id(E.c("unit.unitId"))
    return df.withColumns(out)


def translate_columns(df: DataFrame) -> DataFrame:
    """P2 — single projection: rename to virva, add missing as null, drop
    extras, cast per declared type (reference ``process_data.py:86-130``)."""
    present = set(df.columns)
    sel = []
    for spec in registry.COLUMNS:
        src = spec.api_var if spec.api_var in present else (
            spec.virva if spec.virva in present else None)
        base = E.c(src) if src else F.lit(None)
        if spec.type == "int":
            expr = base.cast("long")
        elif spec.type == "double":
            expr = base.cast("double")
        elif spec.type == "datetime":
            expr = E.parse_date(base.cast("string")) if src else base.cast("date")
        elif spec.type == "bool":
            expr = E.parse_bool(base) if src else base.cast("boolean")
        elif spec.type == "geom":
            expr = base.cast("binary")
        else:
            expr = base.cast("string")
        sel.append(expr.alias(spec.virva))
    return df.select(*sel)


def apply_geometry(df: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """G1-G3 + G8 fused pandas UDF; adds geom_kind, lon, lat and repair flags."""
    df = df.withColumn("_geo", process_geometry(F.col(geometry_col)))
    return (df.drop(geometry_col)
              .withColumns({
                  "geometry": F.col("_geo.geometry"),
                  "geom_kind": F.col("_geo.geom_kind"),
                  "lon": F.col("_geo.lon"),
                  "lat": F.col("_geo.lat"),
                  "env_minx": F.col("_geo.env_minx"),
                  "env_miny": F.col("_geo.env_miny"),
                  "env_maxx": F.col("_geo.env_maxx"),
                  "env_maxy": F.col("_geo.env_maxy"),
                  "was_invalid": F.col("_geo.was_invalid"),
                  "was_collection": F.col("_geo.was_collection"),
              })
              .drop("_geo"))


def transform_chain(raw: DataFrame, taxonomy: DataFrame, **dims) -> DataFrame:
    """Full reference-parity chain as one lazy plan."""
    df = merge_taxonomy(raw, taxonomy)
    df = combine_similar_columns(df)
    df = compute_all(df, **dims)
    df = translate_columns(df)
    df = apply_geometry(df)
    return df
