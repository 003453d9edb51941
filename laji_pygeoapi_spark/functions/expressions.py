"""Scalar column expressions — SURVEY.md §2.8 (F1-F17), all JVM-side.

Every helper returns a ``Column`` built from ``pyspark.sql.functions`` only,
so the whole transform chain stays inside whole-stage codegen; no Python UDFs
on this path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

URL_PREFIX_RE = r"http://[^/]+\.fi/"


def c(name: str) -> Column:
    """Column ref tolerant of dots in source column names."""
    return F.col(f"`{name}`")


def taxon_key(col: Column) -> Column:
    """F1 — extract 'MVL.<n>' join key (reference ``process_data.py:21``).
    pandas ``str.extract`` yields null on no-match; regexp_extract yields ''
    — normalize to null for identical join semantics."""
    ex = F.regexp_extract(col, r"(MVL\.\d+)", 1)
    return F.when(ex == "", None).otherwise(ex)


def strip_url_prefix(col: Column) -> Column:
    """F2 — drop 'http://<host>.fi/' prefixes (``compute_variables.py:172``)."""
    return F.regexp_replace(col, URL_PREFIX_RE, "")


def id_tail(col: Column) -> Column:
    """F3 — last path segment (``compute_variables.py:61``)."""
    return F.element_at(F.split(col, "/"), -1)


def map_multi_values(col: Column, mapping: Column, strip_url: bool = True,
                     sep: str = ", ") -> Column:
    """F4 — per-element dictionary mapping over a ', '-joined multi-value cell
    with the reference's fallback-to-ORIGINAL-unstripped-value quirk
    (``compute_variables.py:77``, verified by its tests ``:39-41``)."""
    def one(v: Column) -> Column:
        key = strip_url_prefix(v) if strip_url else v
        return F.coalesce(F.element_at(mapping, key), v)
    return F.when(col.isNull(), None).otherwise(
        F.array_join(F.transform(F.split(col, sep), one), sep))


def map_single_value(col: Column, mapping: Column, strip_url: bool = False) -> Column:
    """J2 — plain dict map (pandas ``.map``: missing key -> null, no fallback)."""
    key = strip_url_prefix(col) if strip_url else col
    return F.element_at(mapping, key)


def presence(col: Column) -> Column:
    """F7/A7 — 'paikalla' / 'poissa' buckets (``compute_variables.py:45-47``)."""
    return F.when(col > 0, "paikalla").when(col <= 0, "poissa")


def parse_date(col: Column) -> Column:
    """F8 — '%Y-%m-%d' with coerce-to-null (``process_data.py:120``).
    try_to_date ignores trailing garbage differences; strict length guard
    keeps parity with pandas' exact format matching."""
    return F.when(col.rlike(r"^\d{4}-\d{2}-\d{2}$"), F.try_to_date(col, "yyyy-MM-dd"))


def parse_bool(col: Column) -> Column:
    """F9 — lowercase {'true','false'} -> bool else null (``process_data.py:122``)."""
    low = F.lower(col.cast("string"))
    return F.when(low == "true", F.lit(True)).when(low == "false", F.lit(False))


def encode_local_id(col: Column) -> Column:
    """F6 — '#' -> '_' (``compute_variables.py:240``)."""
    return F.translate(col, "#", "_")


def decode_local_id(col: Column) -> Column:
    """F6 inverse — '_' -> '#' (``lajiapi_provider.py:147``)."""
    return F.translate(col, "_", "#")


def normalized_compare_key(col: Column) -> Column:
    """F11 — casefold + space-strip compare key (``convert_api_filters.py:76-84``)."""
    return F.lower(F.regexp_replace(col, " ", ""))


def merged_count(id_col: Column) -> Column:
    """F14 — ``array_length(string_to_array(id, ', '), 1)`` (``edit_db.py:444``)."""
    return F.size(F.split(id_col, ", "))


def rfc3339(col: Column) -> Column:
    """F15 — TO_CHAR(ts, 'YYYY-MM-DD"T"HH24:MI:SS"Z"') (``edit_db.py:201``)."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def normalize_time_filter(col: Column) -> Column:
    """F10 — strip '[h:mm]' brackets + whitespace (``convert_api_filters.py:125-146``)."""
    no_brackets = F.regexp_replace(col, r"\[\s*\d{1,2}:\d{2}\s*\]", "")
    return F.regexp_replace(no_brackets, r"\s+", "")
