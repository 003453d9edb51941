"""Deduplication family for the training-data pipeline (driver mandate).

Five strategies, all expressed as shuffles on *small derived keys* (never on
document bodies), the property that makes them viable at 10^12 rows:

* exact        — hash-groupBy on a 64-bit content fingerprint;
* MinHash+LSH  — shingle -> minhash signature -> banded bucket join;
                 only same-bucket pairs are compared (candidate generation is
                 an equi-join Catalyst can hash-partition);
* SimHash      — 64-bit near-dup hash, grouped by band keys;
* n-gram Jaccard — exact verify step on LSH candidates;
* embedding cosine — near-dup over vectors (see similarity.py for ANN).

All signature computation is vectorized numpy inside Arrow pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from . import text as TX

# ------------------------------------------------------------------ exact

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per identical normalized text (deterministic)."""
    keyed = df.withColumn("_fp", TX.fingerprint64(F.col(text_col)))
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    return (keyed.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1)
                 .drop("_rn", "_fp"))


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate clusters: fingerprint -> count + member ids (diagnostics)."""
    keyed = df.withColumn("fp", TX.fingerprint64(F.col(text_col)))
    return (keyed.groupBy("fp")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sort_array(F.collect_list(id_col)).alias("ids"))
                 .filter(F.col("n") > 1))


# ----------------------------------------------------------------- minhash

_MERSENNE = (1 << 61) - 1


def _hash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature_udf(num_perm: int = 64, shingle_n: int = 3, seed: int = 42):
    """Arrow UDF: text -> minhash signature (array<long>).

    Shingle hashing uses FNV-1a-64 per shingle (numpy bulk), then the
    (a*x+b) mod p permutation family row-vectorized over shingles."""
    a, b = _hash_params(num_perm, seed)

    @pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        p = np.uint64(_MERSENNE)
        for t in texts:
            toks = [w for w in _tokenize_py(t)]
            if len(toks) >= shingle_n:
                sh = {" ".join(toks[i:i + shingle_n]) for i in range(len(toks) - shingle_n + 1)}
            else:
                sh = {" ".join(toks)} if toks else set()
            if not sh:
                # null, not zeros: an all-zero sentinel would make every
                # token-less doc collide with every other in all bands
                out.append(None)
                continue
            hv = np.fromiter((_hash64(s.encode()) for s in sh), dtype=np.uint64, count=len(sh))
            with np.errstate(over="ignore"):
                m = (a[None, :] * hv[:, None] + b[None, :]) % p
            out.append(m.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return sig


def _tokenize_py(t: str | None) -> list[str]:
    import re
    if not t:
        return []
    return [w for w in re.split(r"[^a-z0-9']+", t.lower()) if w]


def _hash64(data: bytes) -> int:
    """Deterministic 64-bit string hash at C speed (blake2b digest)."""
    import hashlib
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def _bucket_pairs(banded: DataFrame) -> DataFrame:
    """(id, band, bucket) -> distinct candidate pairs (id_a < id_b).

    groupBy-bucket + in-array pair expansion instead of a self-join: a
    self-join would re-evaluate the (expensive) signature UDF on BOTH join
    sides, and buckets are short, so expanding pairs from the collected id
    list is one shuffle and one UDF pass.  Oversized buckets (degenerate
    content) are capped — a 10^6-member bucket means the key carries no
    discriminating information, not that there are 10^12 real near-dups.
    """
    max_bucket = 1000
    grouped = (banded.groupBy("band", "bucket")
               .agg(F.slice(F.sort_array(F.collect_list("id")), 1, max_bucket).alias("ids"))
               .filter(F.size("ids") > 1))
    idx = F.sequence(F.lit(1), F.size("ids") - 1)
    pair_arrays = F.flatten(F.transform(
        idx, lambda i: F.transform(
            F.slice(F.col("ids"), i + 1, F.size("ids")),
            lambda y: F.struct(F.element_at(F.col("ids"), i).alias("a"), y.alias("b")))))
    return (grouped.select(F.explode(pair_arrays).alias("p"))
            .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
            .distinct())


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_perm: int = 64,
                           bands: int = 16, shingle_n: int = 3) -> DataFrame:
    """Banded LSH: signature split into ``bands`` rows of ``num_perm//bands``;
    docs sharing any band bucket become candidate pairs (id_a < id_b).

    Plan shape: project(sig, ONCE) -> explode(bands) -> hash-shuffle on
    bucket -> in-bucket pair expansion (see _bucket_pairs).
    """
    r = num_perm // bands
    sig = minhash_signature_udf(num_perm, shingle_n)
    s = (df.select(F.col(id_col).alias("id"), sig(F.col(text_col)).alias("sig"))
           .filter(F.col("sig").isNotNull()))  # token-less docs can't near-dup
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = s.select(
        "id",
        F.explode(band_idx).alias("band"),
        F.col("sig"),
    ).select(
        "id", "band",
        F.xxhash64(F.col("band"), F.slice("sig", F.col("band") * r + 1, r).cast("string")).alias("bucket"),
    )
    return _bucket_pairs(banded)


def jaccard_verify(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", shingle_n: int = 3,
                   threshold: float = 0.7) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (array_intersect/union —
    JVM-side; the candidate set is tiny relative to the corpus)."""
    sh = df.select(F.col(id_col).alias("_jid"),
                   F.array_distinct(TX.shingles(F.col(text_col), shingle_n)).alias("_sh"))
    a = sh.select(F.col("_jid").alias("id_a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col("_jid").alias("id_b"), F.col("_sh").alias("sh_b"))
    j = (pairs.join(a, "id_a").join(b, "id_b")
              .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
              .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
              .withColumn("jaccard", F.when(F.col("uni") > 0, F.col("inter") / F.col("uni"))
                                      .otherwise(F.lit(0.0))))
    return (j.filter(F.col("jaccard") >= threshold)
             .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def minhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.7, **kw) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> Jaccard verify -> drop the
    higher id of each verified pair (union-find-free greedy, deterministic)."""
    pairs = minhash_lsh_candidates(df, text_col, id_col, **kw)
    dups = jaccard_verify(df, pairs, text_col, id_col, threshold=threshold)
    to_drop = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(to_drop, id_col, "left_anti")


# ----------------------------------------------------------------- simhash

def simhash_udf(seed: int = 42):
    """Arrow UDF: text -> 64-bit SimHash over token hashes."""
    @pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = _tokenize_py(t)
            if not toks:
                continue
            hv = np.fromiter((_hash64(w.encode()) for w in toks),
                             dtype=np.uint64, count=len(toks))
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
            votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
            val = np.uint64(0)
            for bpos in np.nonzero(votes > 0)[0]:
                val |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(val.astype(np.int64))
        return pd.Series(out)
    return sh


def simhash_candidates(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bands: int = 4) -> DataFrame:
    """Near-dup candidates: split the 64-bit simhash into ``bands`` chunks;
    docs sharing any chunk value are candidates (<= 16/band Hamming tolerance)."""
    w = 64 // bands
    s = (df.select(F.col(id_col).alias("id"), simhash_udf()(F.col(text_col)).alias("h"))
           .filter(F.col("h") != 0))  # 0 = token-less sentinel, see simhash_udf
    banded = s.select("id", F.explode(F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned("h", i * w).bitwiseAND(F.lit((1 << w) - 1)).alias("chunk"))
        for i in range(bands)])).alias("b")).select(
            "id", F.col("b.band").alias("band"), F.col("b.chunk").alias("bucket"))
    return _bucket_pairs(banded)


# ------------------------------------------------------------ phash near-dup

def phash_candidates(df: DataFrame, phash_col: str = "phash",
                     id_col: str = "image_id", bands: int = 4) -> DataFrame:
    """Image near-dup candidates from a 64-bit perceptual hash column:
    banded chunk join (same machinery as SimHash — docs sharing any
    16-bit chunk are candidates, i.e. Hamming-tolerant blocking).
    The exact Hamming verify runs JVM-side via bit_count(xor)."""
    w = 64 // bands
    s = df.select(F.col(id_col).alias("id"), F.col(phash_col).alias("h"))
    banded = s.select("id", "h", F.explode(F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned("h", i * w).bitwiseAND(F.lit((1 << w) - 1)).alias("chunk"))
        for i in range(bands)])).alias("b")).select("id", "h", "b.band", "b.chunk")
    l, r = banded.alias("l"), banded.alias("r")
    return (l.join(r, ["band", "chunk"]).filter(F.col("l.id") < F.col("r.id"))
             .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                     F.bit_count(F.col("l.h").bitwiseXOR(F.col("r.h"))).alias("hamming"))
             .distinct())


def phash_neardup(df: DataFrame, max_hamming: int = 8, **kw) -> DataFrame:
    """Verified image near-dup pairs: banded candidates + exact Hamming cut."""
    return phash_candidates(df, **kw).filter(F.col("hamming") <= max_hamming)


# ------------------------------------------------------- embedding near-dup

def embedding_neardup(df: DataFrame, vec_col: str = "embedding",
                      id_col: str = "vec_id", threshold: float = 0.95) -> DataFrame:
    """Cosine near-dup pairs over an array<float> column.

    Quadratic verify is avoided by LSH-bucketing on sign-random-projections
    (see similarity.lsh_buckets); here the final exact cosine uses JVM
    higher-order functions (zip_with/aggregate), no Python.
    """
    from .similarity import lsh_bucket_expr, cosine_expr
    # hyperplane dimension must match the data (zip_with null-pads a
    # mismatch, collapsing every row into bucket 0 = quadratic join)
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_row["d"]) if dim_row else 16
    b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                  lsh_bucket_expr(F.col(vec_col), planes=8, seed=1, dim=dim).alias("bucket"))
    l, r = b.alias("l"), b.alias("r")
    pairs = (l.join(r, "bucket").filter(F.col("l.id") < F.col("r.id"))
              .withColumn("cosine", cosine_expr(F.col("l.v"), F.col("r.v")))
              .filter(F.col("cosine") >= threshold)
              .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                      F.round("cosine", 6).alias("cosine"))
              .distinct())
    return pairs
