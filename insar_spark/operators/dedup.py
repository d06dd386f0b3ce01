"""Deduplication operators for training-data pipelines.

Four strategies, all shuffle-conscious:

* exact          — md5 hash-groupBy (one shuffle on the hash)
* MinHash + LSH  — shingle → minhash signature (vectorized pandas UDF) →
                   band → bucket-join for candidates → exact-Jaccard verify
* SimHash        — 64-bit sign-of-weighted-sum signature; candidates via
                   16-bit band buckets; verify by Hamming distance
* n-gram Jaccard — exact verification kernel (used by the LSH verify stage,
                   or standalone for small candidate sets)

Scale design: candidate generation is a groupBy on (band, bucket-hash) —
the classic LSH trick keeps the shuffle linear in corpus size instead of
the O(n²) all-pairs join. Signatures are computed in one Arrow pass
(numpy batch, no per-row Python). Buckets with a single member are
dropped *before* the self-join (the all-zero-block short-circuit pattern,
insar/timeseries.py:512-516).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = (1 << 61) - 1


def _token_ngrams(text: str, n: int) -> set[int]:
    toks = text.split()
    if len(toks) < n:
        return {hash(" ".join(toks)) & 0x7FFFFFFFFFFFFFFF}
    return {
        hash(" ".join(toks[i : i + n])) & 0x7FFFFFFFFFFFFFFF
        for i in range(len(toks) - n + 1)
    }


def _hash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, signature array<long>) via universal hashing a*x+b mod p.

    NOTE: python hash() of str is salted per-process — we use a stable
    FNV-1a instead so signatures are identical across executors/runs.
    """
    a, b = _hash_params(num_hashes, seed)

    def fnv(s: str) -> int:
        h = 0xCBF29CE484222325
        for ch in s.encode():
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h & 0x7FFFFFFFFFFFFFFF

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").split()
            if len(toks) < shingle_n:
                shingles = np.array([fnv(" ".join(toks))], dtype=np.int64)
            else:
                shingles = np.array(
                    [
                        fnv(" ".join(toks[i : i + shingle_n]))
                        for i in range(len(toks) - shingle_n + 1)
                    ],
                    dtype=np.int64,
                )
            # (num_hashes, n_shingles) min over shingles — vectorized
            hv = (
                a[:, None].astype(object) * shingles[None, :].astype(object) + b[:, None]
            ) % _MERSENNE
            out.append(hv.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return docs.select(F.col(id_col).alias("doc_id"), sig(F.col(text_col)).alias("sig"))


def lsh_candidates(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and emit candidate pairs (id_a < id_b).

    Shuffle profile: one explode (bands× fan-out), one groupBy on
    (band, bucket), pairs generated inside each bucket via self-join on the
    bucket key. Distinct at the end dedups pairs found in several bands.
    """
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.hash(
                    F.slice(
                        "sig", i * rows_per_band + 1, rows_per_band
                    ).cast("string")
                ).cast("long"),
            )
        ).alias("band", "bucket"),
    )
    # drop singleton buckets before the join (cheap count pre-agg)
    hot = (
        banded.groupBy("band", "bucket")
        .count()
        .filter(F.col("count") > 1)
        .drop("count")
    )
    b2 = banded.join(hot, ["band", "bucket"], "left_semi")
    a = b2.alias("a")
    b = b2.select(
        F.col("band"), F.col("bucket"), F.col("doc_id").alias("doc_id_b")
    ).alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_id") < F.col("doc_id_b"))
        .select(F.col("doc_id").alias("id_a"), F.col("doc_id_b").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs; keeps pairs >= threshold."""
    d = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    joined = (
        candidates.join(d.withColumnsRenamed({"_id": "id_a", "_t": "text_a"}), "id_a")
        .join(d.withColumnsRenamed({"_id": "id_b", "_t": "text_b"}), "id_b")
    )

    @F.pandas_udf(T.DoubleType())
    def jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i, (x, y) in enumerate(zip(ta, tb)):
            sx, sy = _token_ngrams(x or "", shingle_n), _token_ngrams(y or "", shingle_n)
            u = len(sx | sy)
            out[i] = len(sx & sy) / u if u else 0.0
        return pd.Series(out)

    return (
        joined.withColumn("jaccard", jac("text_a", "text_b"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline -> verified duplicate pairs."""
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, seed=seed)
    cands = lsh_candidates(sigs, bands, num_hashes // bands)
    return jaccard_verify(cands, docs, text_col, id_col, threshold=threshold)


# ------------------------------------------------------------------ simhash


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document (token-level, FNV-hashed)."""

    @F.pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                out[i] = 0
                continue
            hs = np.empty(len(toks), dtype=np.uint64)
            for j, tok in enumerate(toks):
                h = 0xCBF29CE484222325
                for ch in tok.encode():
                    h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                hs[j] = h
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            v = (2 * bits - 1).sum(axis=0)
            out[i] = int(
                np.int64(
                    np.uint64(
                        sum(1 << k for k in range(64) if v[k] > 0) & 0xFFFFFFFFFFFFFFFF
                    )
                )
            )
        return pd.Series(out)

    return docs.select(F.col(id_col).alias("doc_id"), sh(F.col(text_col)).alias("simhash"))


def simhash_near_dups(
    sigs: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Candidate pairs whose 64-bit SimHashes differ in <= max_hamming bits.

    Banding: split into 4×16-bit chunks — any pair within Hamming<=3 must
    agree on at least one chunk (pigeonhole), so bucket-join on chunks then
    verify with bit_count(xor).
    """
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    (F.shiftright("simhash", k * 16).bitwiseAND(F.lit(0xFFFF)))
                    for k in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    hot = (
        chunks.groupBy("chunk_idx", "chunk").count().filter("count > 1").drop("count")
    )
    c2 = chunks.join(hot, ["chunk_idx", "chunk"], "left_semi")
    a = c2.alias("a")
    b = c2.select(
        "chunk_idx", "chunk",
        F.col("doc_id").alias("doc_id_b"), F.col("simhash").alias("simhash_b"),
    )
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("doc_id") < F.col("doc_id_b"))
        .select(
            F.col("doc_id").alias("id_a"),
            F.col("doc_id_b").alias("id_b"),
            F.bit_count(
                F.col("simhash").bitwiseXOR(F.col("simhash_b"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
