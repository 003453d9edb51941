"""Pure-python XXH64 — bit-exact with Spark's ``F.xxhash64`` on strings
(XXH64 over the UTF-8 bytes, seed 42, signed-64 result).

Exists so DRIVER-side code that must agree with JVM-written hashes — the
manifest Bloom probe of a single-feature GET (``sources.table.bloom_words``)
— never needs a Spark job: before this, each string-key GET paid one
driver→executor round trip just to learn its own hash.  XXH64 is the
published algorithm (Collet); this is an independent implementation of the
spec, verified bit-exact against the JVM across lengths covering every
stripe/tail branch and non-ASCII input (tests/test_sketch.py).
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42  # org.apache.spark.sql.catalyst.expressions.XxHash64


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned 64-bit XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            vs = [v1, v2, v3, v4]
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v = (vs[j] + lane * _P2) & _M
                vs[j] = (_rotl(v, 31) * _P1) & _M
            v1, v2, v3, v4 = vs
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxhash64_spark(value: str) -> int:
    """Signed-64 result matching ``F.xxhash64(string_col)`` exactly."""
    h = xxh64(value.encode("utf-8"))
    return h - (1 << 64) if h >= (1 << 63) else h
