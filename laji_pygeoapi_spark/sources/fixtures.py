"""Deterministic synthetic tables (FIXTURES.md): images, occurrences, polygons, dims.

Everything is a pure function of the row index (seed 42 semantics, no wall
clock, no global RNG), so any scale factor regenerates identical data — the
property the bench and the checkpoint-resume tests rely on.

The ``images`` table is the north-rule input shape
(``image_id string, bytes binary, w int, h int, fmt string, caption string,
phash bigint``) and is generated *distributed*: ``spark.range(n)`` ->
``mapInPandas`` so a 10^9-row generation would fan out across executors
instead of materializing on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import codec, wkb
from ..registry import FINLAND_BBOX, PROVINCE_NAMES

SPECIES = [
    "Parus major", "Lutra lutra", "Pteromys volans", "Bufo bufo",
    "Alces alces", "Larus fuscus", "Sterna paradisaea", "Rana temporaria",
]

# 20 real municipality names + their ELY/Elinvoimakeskus areas (public data,
# reference resources/municipality_ely_mappings.json).
MUNICIPALITY_AREAS: dict[str, tuple[str, str]] = {
    "Helsinki": ("Uudenmaan ELY-keskus", "Uudenmaan elinvoimakeskus"),
    "Espoo": ("Uudenmaan ELY-keskus", "Uudenmaan elinvoimakeskus"),
    "Kuhmo": ("Kainuun ELY-keskus", "Pohjois-Suomen elinvoimakeskus"),
    "Nurmes": ("Pohjois-Karjalan ELY-keskus", "Kaakkois-Suomen elinvoimakeskus"),
    "Puolanka": ("Kainuun ELY-keskus", "Pohjois-Suomen elinvoimakeskus"),
    "Vantaa": ("Uudenmaan ELY-keskus", "Uudenmaan elinvoimakeskus"),
    "Tampere": ("Pirkanmaan ELY-keskus", "Sisä-Suomen elinvoimakeskus"),
    "Turku": ("Varsinais-Suomen ELY-keskus", "Lounais-Suomen elinvoimakeskus"),
    "Oulu": ("Pohjois-Pohjanmaan ELY-keskus", "Pohjois-Suomen elinvoimakeskus"),
    "Kuopio": ("Pohjois-Savon ELY-keskus", "Itä-Suomen elinvoimakeskus"),
    "Rovaniemi": ("Lapin ELY-keskus", "Lapin elinvoimakeskus"),
    "Inari": ("Lapin ELY-keskus", "Lapin elinvoimakeskus"),
    "Utsjoki": ("Lapin ELY-keskus", "Lapin elinvoimakeskus"),
    "Jyväskylä": ("Keski-Suomen ELY-keskus", "Keski-Suomen elinvoimakeskus"),
    "Lahti": ("Hämeen ELY-keskus", "Kaakkois-Suomen elinvoimakeskus"),
    "Pori": ("Satakunnan ELY-keskus", "Lounais-Suomen elinvoimakeskus"),
    "Vaasa": ("Pohjanmaan ELY-keskus", "Pohjanmaan elinvoimakeskus"),
    "Joensuu": ("Pohjois-Karjalan ELY-keskus", "Kaakkois-Suomen elinvoimakeskus"),
    "Mikkeli": ("Etelä-Savon ELY-keskus", "Itä-Suomen elinvoimakeskus"),
    "Kouvola": ("Kaakkois-Suomen ELY-keskus", "Lounais-Suomen elinvoimakeskus"),
}

QUALITY_LABELS = [  # the 3 reference quality labels (edit_metadata.py:115-117)
    "Ammattiaineistot / asiantuntijoiden laadunvarmistama",
    "Ammattiaineistot / asiantuntijat tarkastaneet satunnaisesti",
    "Kansalaisaineistot / ei laadunvarmistusta",
]

IMAGES_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("lon", T.DoubleType()),
    T.StructField("lat", T.DoubleType()),
])

_WS = [16, 32, 64]
_HS = [16, 32, 48]


def synth_points(i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic occurrence point for row index i (FIXTURES.md §1):
    uniform over the Finland bbox from a splitmix-style hash, with a Helsinki
    hotspot for every 5th row (skew exercise)."""
    i = np.asarray(i, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = (i + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    u = (h & np.uint64(0xFFFFF)).astype(np.float64) / float(1 << 20)
    v = ((h >> np.uint64(20)) & np.uint64(0xFFFFF)).astype(np.float64) / float(1 << 20)
    x0, y0, x1, y1 = FINLAND_BBOX
    lon = x0 + u * (x1 - x0)
    lat = y0 + v * (y1 - y0)
    hot = (i % np.uint64(5)) == 0
    lon = np.where(hot, 24.94 + (u - 0.5) * 0.4, lon)
    lat = np.where(hot, 60.17 + (v - 0.5) * 0.4, lat)
    return lon, lat


def images_df(spark: SparkSession, n: int, with_bytes: bool = True,
              partitions: int | None = None) -> DataFrame:
    """Distributed deterministic images table of n rows."""

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            ws = np.array([_WS[i % 3] for i in idx], dtype=np.int32)
            hs = np.array([_HS[i % 3] for i in idx], dtype=np.int32)
            fmts = ["png" if i % 4 != 0 else "jpeg" for i in idx]
            caps = [f"synthetic occurrence {i} of {SPECIES[i % 8]}" for i in idx]
            lon, lat = synth_points(idx)
            if with_bytes:
                blobs, phashes = [], []
                for i, w, h, fmt in zip(idx, ws, hs, fmts):
                    img = codec.synth_image(int(i), int(w), int(h))
                    blobs.append(codec.encode(img, fmt))
                    phashes.append(codec.quick_phash(img))
            else:
                blobs = [None] * len(idx)
                # points-only mode: vectorized splitmix stand-in phash
                with np.errstate(over="ignore"):
                    ph = (idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                    ph ^= ph >> np.uint64(29)
                phashes = ph.astype(np.int64)
            yield pd.DataFrame({
                "image_id": [f"IMG_{i:09d}" for i in idx],
                "bytes": blobs, "w": ws, "h": hs, "fmt": fmts,
                "caption": caps, "phash": np.asarray(phashes, dtype=np.int64),
                "lon": lon, "lat": lat,
            })

    rng = spark.range(n)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(gen, schema=IMAGES_SCHEMA)


# ------------------------------------------------------------ polygon dims

def _grid_polygons(nx: int, ny: int, names: list[str], id_prefix: str, id_base: int):
    """Convex polygons tiling the Finland bbox on a deterministic grid.
    Cells are pentagon-cut rectangles (one corner chamfered) so the PIP path
    is exercised on non-rectangles while membership stays SQL-oracle-friendly
    (the chamfer is outside the sampled interior for grid-aligned points)."""
    x0, y0, x1, y1 = FINLAND_BBOX
    dx = (x1 - x0) / nx
    dy = (y1 - y0) / ny
    rows = []
    k = 0
    for gy in range(ny):
        for gx in range(nx):
            if k >= len(names):
                break
            ax, ay = x0 + gx * dx, y0 + gy * dy
            bx, by = ax + dx, ay + dy
            ch = min(dx, dy) * 1e-6  # negligible chamfer, keeps polygon convex & 5-gon
            shell = [(ax, ay), (bx - ch, ay), (bx, ay + ch), (bx, by), (ax, by)]
            rows.append({
                "id": f"{id_prefix}.{id_base + k}",
                "name": names[k],
                "minx": ax, "miny": ay, "maxx": bx, "maxy": by,
                "wkb": wkb.dumps(wkb.polygon(shell)),
            })
            k += 1
    return rows


def grid_municipality(lon: np.ndarray, lat: np.ndarray) -> list[str]:
    """Name of the 4x5 grid municipality containing each point — the
    deterministic 'upstream-interpreted' Kunta (FIXTURES.md: must agree with
    the engine's own point-in-polygon attribution)."""
    x0, y0, x1, y1 = FINLAND_BBOX
    names = list(MUNICIPALITY_AREAS)
    gx = np.clip(((np.asarray(lon) - x0) / (x1 - x0) * 4).astype(int), 0, 3)
    gy = np.clip(((np.asarray(lat) - y0) / (y1 - y0) * 5).astype(int), 0, 4)
    return [names[int(y) * 4 + int(x)] for x, y in zip(gx, gy)]


def municipalities_pdf() -> pd.DataFrame:
    names = list(MUNICIPALITY_AREAS)
    rows = _grid_polygons(4, 5, names, "ML", 600)
    for r in rows:
        ely, evk = MUNICIPALITY_AREAS[r["name"]]
        r["ely_area"] = ely
        r["elinvoimakeskus"] = evk
    return pd.DataFrame(rows)


def provinces_pdf() -> pd.DataFrame:
    ids = sorted(PROVINCE_NAMES)
    rows = _grid_polygons(3, 7, [PROVINCE_NAMES[i] for i in ids], "ML", 251)
    for r, pid in zip(rows, ids):
        r["id"] = pid
    return pd.DataFrame(rows)


def municipalities_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(municipalities_pdf())


def provinces_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(provinces_pdf())


# ------------------------------------------------------------ lookup dims

def taxonomy_pdf() -> pd.DataFrame:
    # informal taxon groups (reference test_process_data.py:21-25 uses MVL ids)
    rows = [
        ("MVL.26280", "Linnut"), ("MVL.27801", "Nisäkkäät"), ("MVL.27800", "Matelijat"),
        ("MVL.27802", "Sammakkoeläimet"), ("MVL.27803", "Kalat"), ("MVL.31", "Putkilokasvit"),
        ("MVL.1", "Hyönteiset"), ("MVL.21", "Sienet"),
    ]
    return pd.DataFrame(rows, columns=["id", "name"])


def collections_pdf() -> pd.DataFrame:
    rows = [
        ("HR.1747", "Lajitietokeskus/FinBIF - Vihkon yleiset havainnot"),
        ("HR.3553", "iNaturalist Suomi"),
        ("HR.48", "Hatikka.fi-havainnot"),
        ("HR.95", "Talvilintulaskenta"),
    ]
    return pd.DataFrame(rows, columns=["id", "longName"])


def value_ranges() -> dict[str, str]:
    # exact pairs reused by the reference's compute_all golden
    # (tests/test_compute_variables.py:107-121)
    return {
        "PRESERVED_SPECIMEN": "Näyte",
        "MALE": "koiras",
        "FEMALE": "naaras",
        "ADULT": "aikuinen",
        "JUVENILE": "nuori",
        "MY.recordBasisHumanObservation": "Havaittu",
        "EXPERT_VERIFIED": "Asiantuntijan varmistama",
        "COMMUNITY_VERIFIED": "Yhteisön varmistama",
        "NEUTRAL": "Neutraali",
        "UNCERTAIN": "Epävarma",
        "ERRONEOUS": "Virheellinen",
        "MX.iucnLC": "LC – Elinvoimaiset",
        "MX.iucnEN": "EN – Erittäin uhanalaiset",
        "MKV.habitatM": "M – Metsät",
        "MY.atlasClassEnumB": "Todennäköinen pesintä",
        "MY.atlasCodeEnum7": "Pesintä: ruokaa kantava emo",
        # collectionQuality keys -> the 3 reference quality labels
        "PROFESSIONAL_VERIFIED": QUALITY_LABELS[0],
        "PROFESSIONAL_SPOT_CHECKED": QUALITY_LABELS[1],
        "AMATEUR_UNVERIFIED": QUALITY_LABELS[2],
    }


def value_ranges_pdf() -> pd.DataFrame:
    return pd.DataFrame(list(value_ranges().items()), columns=["key", "label"])


# -------------------------------------------------------- raw occurrences

def raw_occurrences_pdf(n: int = 1000) -> pd.DataFrame:
    """Pre-translation rows keyed by finbif api var names, with planted
    duplicates / merge groups / array columns / geometry zoo — the input of
    the transform-chain + dedup + merge tests (FIXTURES.md §2)."""
    i = np.arange(n, dtype=np.int64)
    lon, lat = synth_points(i)
    species = [SPECIES[k % 8] for k in i]
    # duplicate plan: every 10th row is re-emitted with a later load date
    dup_mask = (i % 10 == 0) & (i > 0)
    geoms = []
    for k in i:
        if k % 97 == 13:
            geoms.append(wkb.dumps(wkb.linestring([(lon[k], lat[k]), (lon[k] + 0.01, lat[k] + 0.01)])))
        elif k % 97 == 29:
            geoms.append(wkb.dumps(wkb.polygon([(lon[k], lat[k]), (lon[k] + 0.02, lat[k]),
                                                (lon[k] + 0.02, lat[k] + 0.02), (lon[k], lat[k] + 0.02)])))
        elif k % 97 == 41:  # invalid bowtie
            geoms.append(wkb.dumps(("Polygon", [np.array([
                (lon[k], lat[k]), (lon[k] + 0.02, lat[k]), (lon[k], lat[k] + 0.02),
                (lon[k] + 0.02, lat[k] + 0.02), (lon[k], lat[k])])])))
        elif k % 97 == 53:  # geometry collection
            geoms.append(wkb.dumps(wkb.collection([
                wkb.point(lon[k], lat[k]),
                wkb.linestring([(lon[k], lat[k]), (lon[k] + 0.01, lat[k])])])))
        else:
            geoms.append(wkb.dumps(wkb.point(lon[k], lat[k])))
    base_date = pd.Timestamp("1990-01-01")
    start = base_date + pd.to_timedelta((i * 37) % 13000, unit="D")
    pdf = pd.DataFrame({
        "unit.unitId": [f"http://tun.fi/JX.{k}#Unit" for k in i],
        "unit.linkings.taxon.scientificName": species,
        "unit.interpretations.individualCount": np.where(i % 7 == 0, 0, (i % 13)).astype(np.int64),
        "gathering.interpretations.coordinateAccuracy": np.choose(i % 4, [1, 10, 100, 1000]).astype(np.int64),
        "unit.interpretations.recordQuality": [["EXPERT_VERIFIED", "COMMUNITY_VERIFIED", "NEUTRAL", "UNCERTAIN"][k % 4] for k in i],
        "unit.abundanceString": [str(int(k % 13)) for k in i],
        "gathering.eventDate.begin": start.strftime("%Y-%m-%d"),
        "gathering.eventDate.end": (start + pd.Timedelta(days=1)).strftime("%Y-%m-%d"),
        "document.collectionId": [f"http://tun.fi/{['HR.1747','HR.3553','HR.48','HR.95'][k % 4]}" for k in i],
        "unit.breedingSite": [["true", "false", None][k % 3] for k in i],
        "unit.sex": [["MALE", "FEMALE", None, None][k % 4] for k in i],
        "unit.lifeStage": [["ADULT", "JUVENILE", None][k % 3] for k in i],
        "unit.recordBasis": ["MY.recordBasisHumanObservation"] * n,
        "document.linkings.collectionQuality": [QUALITY_LABELS_KEYS[k % 3] for k in i],
        "unit.linkings.taxon.latestRedListStatusFinland.status":
            [f"http://tun.fi/{['MX.iucnLC','MX.iucnEN'][k % 2]}" for k in i],
        "unit.linkings.taxon.administrativeStatuses[0]": [f"http://tun.fi/{['MX.iucnLC','MX.iucnEN'][k % 2]}" for k in i],
        "unit.linkings.taxon.informalTaxonGroups[0]":
            [f"http://tun.fi/{_TAXON_IDS[k % 8]}" for k in i],
        "gathering.interpretations.municipalityDisplayname": grid_municipality(lon, lat),
        "gathering.gatheringId": [f"http://tun.fi/JX.{k // 2}#G" for k in i],
        "document.loadDate": (base_date + pd.to_timedelta(i % 100, unit="D")).strftime("%Y-%m-%d"),
        "unit.keywords[0]": [f"kw{k % 5}" if k % 3 == 0 else None for k in i],
        "unit.keywords[1]": [f"kw{k % 7}" if k % 4 == 0 else None for k in i],
        "geometry": geoms,
    })
    if dup_mask.any():
        dups = pdf[dup_mask].copy()
        dups["document.loadDate"] = "2025-06-30"
        pdf = pd.concat([pdf, dups], ignore_index=True)
    return pdf


QUALITY_LABELS_KEYS = ["PROFESSIONAL_VERIFIED", "PROFESSIONAL_SPOT_CHECKED", "AMATEUR_UNVERIFIED"]
_TAXON_IDS = ["MVL.26280", "MVL.27801", "MVL.27800", "MVL.27802",
              "MVL.27803", "MVL.31", "MVL.1", "MVL.21"]


def quality_label_map() -> dict[str, str]:
    return dict(zip(QUALITY_LABELS_KEYS, QUALITY_LABELS))



def audio_df(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic PCM16 WAV test corpus: per-row sine tone + noise with a
    row-derived planted frequency (kernels.codec.synth_audio)."""
    from pyspark.sql import types as T
    from ..kernels import codec as _codec
    rows = []
    for i in range(n):
        blob, freq = _codec.synth_audio(i)
        rows.append((f"au{i:06d}", bytearray(blob), float(freq)))
    schema = T.StructType([
        T.StructField("audio_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("planted_freq", T.DoubleType()),
    ])
    return spark.createDataFrame(rows, schema=schema)
