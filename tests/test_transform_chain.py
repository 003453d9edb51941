"""Transform-chain parity tests — ports of the reference's golden cases
(``pygeoapi/tests/test_process_data.py``, ``test_compute_variables.py``)
run through the Spark plan instead of pandas."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from laji_pygeoapi_spark.functions import transform
from laji_pygeoapi_spark.functions import expressions as E
from laji_pygeoapi_spark.sources import fixtures


def test_merge_taxonomy_golden(spark):
    # reference tests/test_process_data.py:12-33
    occ = spark.createDataFrame(pd.DataFrame({
        "unit.linkings.taxon.informalTaxonGroups[0]": [
            "http://tun.fi/MVL.26280", "http://tun.fi/MVL.27899",
            "http://tun.fi/MVL.27801", "http://tun.fi/MVL.27800"],
        "some_other_column": [1, 2, 3, 4],
    }))
    tax = spark.createDataFrame(pd.DataFrame({
        "id": ["MVL.26280", "MVL.27801", "MVL.27800"],
        "taxon_name": ["Taxon A", "Taxon B", "Taxon C"],
    }))
    out = transform.merge_taxonomy(occ, tax).orderBy("some_other_column").toPandas()
    assert len(out) == 4
    assert out["taxon_name"].tolist() == ["Taxon A", None, "Taxon B", "Taxon C"]


def test_combine_similar_columns_golden(spark):
    # reference tests/test_process_data.py:46-58 — incl. the float-format golden
    pdf = pd.DataFrame({
        "keyword[0]": ["a", None, "1"],
        "keyword[1]": [None, 1.2345, "d"],
        "other[0]": ["1", None, "3"],
        "other[1]": ["2", "2", "asd"],
    })
    out = (transform.combine_similar_columns(spark.createDataFrame(pdf))
           .toPandas())
    assert out["keyword"].tolist() == ["a", "1.2345", "1, d"]
    assert out["other"].tolist() == ["1, 2", "2", "3, asd"]


def test_translate_columns_schema(spark):
    # reference tests/test_process_data.py:60-73
    pdf = pd.DataFrame({
        "unit.unitId": ["1", "2", "3"],
        "unit.linkings.taxon.scientificName": ["asd", "asd1", "asd2"],
        "unit.interpretations.individualCount": [0, 1, 2],
        "extra_column": ["x", "y", "z"],
    })
    out = transform.translate_columns(spark.createDataFrame(pdf))
    assert "extra_column" not in out.columns
    assert "Havainnon_tunniste" in out.columns
    assert "Sukupuoli" in out.columns
    assert len(out.columns) > 50
    assert dict(out.dtypes)["Yksilomaara_tulkittu"] == "bigint"
    assert dict(out.dtypes)["Keruu_aloitus_pvm"] == "date"
    assert dict(out.dtypes)["Pesintapaikka"] == "boolean"
    got = out.select("Yksilomaara_tulkittu").orderBy("Havainnon_tunniste").toPandas()
    assert got["Yksilomaara_tulkittu"].tolist() == [0, 1, 2]


def test_presence_buckets_golden(spark):
    # reference tests/test_compute_variables.py:12-15
    pdf = pd.DataFrame({"c": [0.0, 1.0, 5.0, None, float("nan"), -2.0]})
    out = spark.createDataFrame(pdf).select(E.presence(F.col("c")).alias("p")).toPandas()
    assert out["p"].tolist() == ["poissa", "paikalla", "paikalla", None, None, "poissa"]


def test_collection_id_mapping(spark):
    # reference tests/test_compute_variables.py:17-23
    pdf = pd.DataFrame({"cid": ["http://tun.fi/HR.1747", "HR.3553", "http://tun.fi/HR.9999"]})
    cmap = dict(zip(fixtures.collections_pdf()["id"], fixtures.collections_pdf()["longName"]))
    mapping = transform._map_literal(cmap)
    out = (spark.createDataFrame(pdf)
           .select(E.map_single_value(E.id_tail(F.col("cid")), mapping).alias("a"))
           .toPandas())
    assert out["a"][0] == "Lajitietokeskus/FinBIF - Vihkon yleiset havainnot"
    assert out["a"][1] == "iNaturalist Suomi"
    assert out["a"][2] is None  # .map semantics: missing -> null


def test_multivalue_map_fallback_quirk(spark):
    # reference tests/test_compute_variables.py:25-41 — fallback returns the
    # ORIGINAL (unstripped) value when the stripped key is unknown
    pdf = pd.DataFrame({"c": ["http://tun.fi/MX.iucnLC, http://tun.fi/MX.unknown"]})
    vr = transform._map_literal({"MX.iucnLC": "LC – Elinvoimaiset"})
    out = (spark.createDataFrame(pdf)
           .select(E.map_multi_values(F.col("c"), vr).alias("m")).toPandas())
    assert out["m"][0] == "LC – Elinvoimaiset, http://tun.fi/MX.unknown"


def test_compute_areas_ely(spark):
    # reference tests/test_compute_variables.py:43-56
    pdf = pd.DataFrame({"gathering.interpretations.municipalityDisplayname":
                        ["Puolanka", "Helsinki, Espoo", "Unknown Town", None]})
    areas = fixtures.MUNICIPALITY_AREAS
    ely = transform._map_literal({k: v[0] for k, v in areas.items()})
    out = (spark.createDataFrame(pdf)
           .select(E.map_multi_values(
               F.col("`gathering.interpretations.municipalityDisplayname`"),
               ely, strip_url=False).alias("a")).toPandas())
    assert out["a"][0] == "Kainuun ELY-keskus"
    assert out["a"][1] == "Uudenmaan ELY-keskus, Uudenmaan ELY-keskus"
    assert out["a"][2] == "Unknown Town"   # fallback-to-original
    assert out["a"][3] is None


def test_full_chain_and_geometry_counts(spark):
    raw = spark.createDataFrame(fixtures.raw_occurrences_pdf(300))
    tax = spark.createDataFrame(fixtures.taxonomy_pdf())
    out = transform.transform_chain(raw, tax).cache()
    n = out.count()
    assert n == 300 + sum(1 for i in range(300) if i % 10 == 0 and i > 0)
    # geometry zoo: invalid bowties repaired, collections converted
    stats = out.groupBy("was_invalid", "was_collection").count().collect()
    d = {(r["was_invalid"], r["was_collection"]): r["count"] for r in stats}
    assert d.get((True, False), 0) >= 1    # bowties repaired
    assert d.get((False, True), 0) >= 1    # collections converted
    kinds = {r["geom_kind"] for r in out.select("geom_kind").distinct().collect()}
    assert {"point", "line", "polygon"} <= kinds
    # local id: '#' -> '_' (compute_variables.py:240)
    pid = out.select("Paikallinen_tunniste").first()[0]
    assert "#" not in pid and "_Unit" in pid


def test_parse_date_coerce(spark):
    pdf = pd.DataFrame({"d": ["2020-01-02", "not-a-date", None, "2020-13-45"]})
    out = spark.createDataFrame(pdf).select(E.parse_date(F.col("d")).alias("d")).toPandas()
    assert str(out["d"][0]) == "2020-01-02"
    assert out["d"][1] is None or pd.isna(out["d"][1])
    assert out["d"][3] is None or pd.isna(out["d"][3])


def test_parse_bool_map(spark):
    pdf = pd.DataFrame({"b": ["true", "False", "TRUE", "none", None, "x"]})
    out = spark.createDataFrame(pdf).select(E.parse_bool(F.col("b")).alias("b")).toPandas()
    assert out["b"].tolist() == [True, False, True, None, None, None]
