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
    """Multiply-shift universal hash family params (odd multipliers).

    h_i(x) = ((a_i * x + b_i) mod 2^64) >> 32 — native uint64 wraparound,
    fully vectorized (no Python big-int math in the signature hot loop).
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, num_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, num_hashes, dtype=np.uint64)
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

    from hashlib import blake2b

    def fnv(s: str) -> int:
        # stable 64-bit token hash at C speed (blake2b-8); name kept for
        # history — the property that matters is process-independence
        return int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "big")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        B = np.uint64(1_000_003)
        with np.errstate(over="ignore"):
            for t in texts:
                toks = (t or "").split()
                hs = np.array([fnv(w) for w in toks], dtype=np.uint64)
                if len(toks) < shingle_n:
                    shingles = np.array(
                        [hs.sum() if len(hs) else 0], dtype=np.uint64
                    )
                else:
                    # polynomial combine of per-token hashes over the
                    # shingle window — vectorized across positions
                    m = len(toks) - shingle_n + 1
                    shingles = np.zeros(m, dtype=np.uint64)
                    for j in range(shingle_n):
                        shingles = shingles * B + hs[j : j + m]
                # (num_hashes, n_shingles) multiply-shift, min over shingles:
                # native uint64 wraparound == mod 2^64, fully vectorized
                hv = (a[:, None] * shingles[None, :] + b[:, None]) >> np.uint64(32)
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
    # one shuffle: gather each bucket's member list, emit pairs from the
    # array in-place (no self-join), dedup across bands. max_bucket caps
    # degenerate buckets (near-identical boilerplate floods) — standard
    # LSH practice; capped buckets are still represented pairwise up to
    # the cap after an in-bucket sort (deterministic).
    max_bucket = 64
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .withColumn("ids", F.slice("ids", 1, max_bucket))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(
                            "ids", i + 2, F.size("ids") - i - 1
                        ),
                        lambda y: F.struct(
                            x.alias("id_a"), y.alias("id_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


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
            from hashlib import blake2b

            hs = np.fromiter(
                (
                    int.from_bytes(blake2b(tok.encode(), digest_size=8).digest(), "big")
                    for tok in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
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
