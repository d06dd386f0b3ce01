"""Deduplication operators for training-data pipelines.

Four strategies, all shuffle-conscious and all JVM-side (no Python in any
hot path — signatures are built from Spark array expressions over the
cross-engine md5-60 hash in functions/shared_hash.py, so the DuckDB oracle
can recompute them independently):

* exact          — md5 hash-groupBy (one shuffle on the hash)
* MinHash + LSH  — word shingles → minhash signature → band → bucket-join
                   for candidates → exact n-gram-Jaccard verify
* SimHash        — 60-bit sign-of-weighted-sum signature; candidates via
                   15-bit chunk buckets (pigeonhole-complete for
                   Hamming <= 3); verify by bit_count(xor)
* n-gram Jaccard — exact verification kernel (used by the LSH verify stage,
                   or standalone for small candidate sets)

Scale design: candidate generation is a groupBy on (band, bucket-hash) —
the classic LSH trick keeps the shuffle linear in corpus size instead of
the O(n²) all-pairs join. Buckets with a single member are dropped
*before* pair generation (the all-zero-block short-circuit pattern,
insar/timeseries.py:512-516), and every pair generator caps bucket
fan-out (``max_bucket``) so one boilerplate-flooded bucket cannot go
quadratic at scale; the dropped mass is logged (no silent caps).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from insar_spark.functions.shared_hash import (
    SIMHASH_BITS,
    h60_col,
    minhash_sig_col,
    perm_params,
    shingle_hashes_col,
    shingles_col,
    simhash_col,
    tokens_col,
)

logger = logging.getLogger(__name__)

DEFAULT_MAX_BUCKET = 64


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread an expression-heavy per-row stage across the cluster.

    A small corpus parquet arrives as one input split, which would run the
    whole signature computation in a single task; at 100-TB scale the file
    source already yields thousands of splits and this is a no-op. A
    round-robin repartition (no key) avoids any skew concern.
    """
    want = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def _observe_cap(buckets: DataFrame, max_bucket: int, what: str) -> DataFrame:
    """Attach a zero-cost cap-drop observation (no-silent-caps rule).

    An eager count would re-run the whole upstream pipeline as a second
    job (it doubled the minhash query's wall time); ``observe`` collects
    the dropped mass during the caller's OWN action, and a daemon thread
    logs it once that action completes.
    """
    import threading

    from pyspark.sql import Observation

    obs = Observation()
    over = F.when(F.size("ids") > max_bucket, F.size("ids") - max_bucket)
    buckets = buckets.observe(
        obs,
        F.coalesce(F.sum(over), F.lit(0)).alias("dropped"),
        F.count(over).alias("buckets"),
    )

    def wait() -> None:
        try:
            m = obs.get  # blocks until the first action on the plan
            if m["dropped"]:
                logger.warning(
                    "%s: capped %d buckets at %d members (dropped %d members)",
                    what, m["buckets"], max_bucket, m["dropped"],
                )
        except Exception:  # noqa: BLE001 — logging must never fail a job
            pass

    threading.Thread(target=wait, daemon=True).start()
    return buckets


def _pairs_from_buckets(
    grouped: DataFrame, max_bucket: int, what: str
) -> DataFrame:
    """(bucket-key..., ids array) -> distinct (id_a < id_b) pairs.

    Pair generation happens inside the array (no self-join). ``max_bucket``
    caps degenerate buckets after a deterministic in-bucket sort; the
    dropped member count is observed in the same pass and logged so capping
    is never silent.
    """
    buckets = grouped.filter(F.size("ids") > 1)
    if max_bucket:
        buckets = _observe_cap(buckets, max_bucket, what)
        buckets = buckets.withColumn("ids", F.slice("ids", 1, max_bucket))
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice("ids", i + 2, F.size("ids") - i - 1),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, signature array<long>) — entirely JVM-side.

    Shingle hash = md5-60 of the word k-gram string; permutation j =
    (a_j * (h mod P) + b_j) mod P with P = 2^31-1 (cross-engine safe
    arithmetic, see shared_hash.py). Deterministic across runs/executors.
    """
    a, b = perm_params(num_hashes, seed)
    hashes = shingle_hashes_col(F.col(text_col), shingle_n)
    return ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        minhash_sig_col(hashes, a, b).alias("sig"),
    )


def band_signatures(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """(doc_id, band, bucket): hash each signature band to its LSH bucket
    key — the exploded form both the in-memory and the stored paths use."""
    # bucket = murmur3 over the band's signature longs DIRECTLY (r6: the
    # previous slice->cast-to-string->hash built 16 strings per row; the
    # element form hashes the same values with zero allocation). Equal
    # band slices still always collide, so LSH recall is unchanged —
    # bucket ids only relabel; the verified output is the same J>=t set.
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    ).cast("long")
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )


def lsh_candidates(
    sigs: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Band the signatures and emit candidate pairs (id_a < id_b).

    Shuffle profile: one explode (bands× fan-out), one groupBy on
    (band, bucket), pairs generated inside each bucket from the collected
    array. Distinct at the end dedups pairs found in several bands.
    """
    banded = band_signatures(sigs, bands, rows_per_band)
    grouped = banded.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    return _pairs_from_buckets(grouped, max_bucket, "minhash-lsh")


def minhash_write(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    bands: int = 16,
    rows_per_band: int = 4,
) -> None:
    """Persist the BANDED minhash index at ingest time.

    At 100 TB the expensive part of dedup is hashing the corpus (one pass
    over every token); banding and pair-gen are cheap by comparison. The
    ingest-time store makes signature work write-once: incremental dedup
    of a new batch (``minhash_dedup_incremental``) and threshold re-runs
    read (band, bucket, doc_id) instead of re-hashing the corpus. Layout:
    partitioned by band (bounded fan-out), rows sorted by bucket within
    files so the incremental bucket semi-join skips row groups via
    min/max stats."""
    banded = band_signatures(
        minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n, seed),
        bands,
        rows_per_band,
    )
    (
        banded.repartition("band")
        .sortWithinPartitions("bucket")
        .write.partitionBy("band")
        .mode("overwrite")
        .option("compression", "zstd")
        .parquet(path)
    )


def minhash_dedup_incremental(
    spark,
    new_docs: DataFrame,
    store_path: str,
    all_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Dedup a NEW batch against the stored corpus index + itself.

    The production shape of web-crawl dedup: corpus signatures are never
    recomputed — only the new batch is hashed; stored banded rows are
    pruned to buckets the new batch actually touches (semi-join) before
    pair generation, so the per-batch cost is O(new) hashing +
    O(touched buckets) join, independent of corpus hash cost. Emits
    exactly the verified pairs that involve >= 1 new document (old-old
    pairs were already known when the store was built)."""
    new_banded = band_signatures(
        minhash_signatures(new_docs, text_col, id_col, num_hashes, shingle_n, seed),
        bands,
        rows_per_band,
    )
    stored = spark.read.parquet(store_path).select("band", "bucket", id_col)
    touched = new_banded.select("band", "bucket").distinct()
    relevant_old = stored.join(touched, ["band", "bucket"], "left_semi")
    both = relevant_old.unionByName(new_banded.select("band", "bucket", id_col))
    grouped = both.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list(id_col)).alias("ids")
    )
    pairs = _pairs_from_buckets(grouped, max_bucket, "minhash-incremental")
    # "involves a new doc" via two LEFT joins against a tiny flag table and
    # one filter: keeps a single pairs subtree (a union of semi-joins would
    # duplicate the whole candidate pipeline in the plan), and an OR join
    # condition would force a nested-loop join — these stay hash joins.
    new_ids = new_docs.select(F.col(id_col).alias("_nid")).distinct()
    a_new = new_ids.select(F.col("_nid").alias("id_a"), F.lit(True).alias("_an"))
    b_new = new_ids.select(F.col("_nid").alias("id_b"), F.lit(True).alias("_bn"))
    involving_new = (
        pairs.join(a_new, "id_a", "left")
        .join(b_new, "id_b", "left")
        .filter(F.col("_an").isNotNull() | F.col("_bn").isNotNull())
        .drop("_an", "_bn")
    )
    return jaccard_verify(
        involving_new, all_docs, text_col, id_col, shingle_n, threshold
    )


def jaccard_verify(
    candidates: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact word-n-gram Jaccard on candidate pairs (>= threshold kept).

    Pure JVM: distinct shingle-string arrays joined to each side, then
    array_intersect/size arithmetic — no UDF, and byte-reproducible by the
    DuckDB oracle (list_intersect over the same shingles).

    Shingles are computed only for docs that appear in a candidate pair
    (semi-join first): the LSH stage already pruned the corpus, so the
    expensive per-doc array build must not run over all N docs twice.
    """
    # one traversal of the candidate subtree: explode both members of a
    # pair instead of a 2-way union, which planned the whole candidate
    # pipeline twice (the exchanges dedup via ReuseExchange, the
    # post-exchange bucket/pair work did not — r6, guide §2.4)
    ids = candidates.select(
        F.explode(F.array("id_a", "id_b")).alias("_id")
    ).distinct()
    # no broadcast hint: candidate ids are O(pairs) and unbounded, so a
    # forced broadcast could OOM at scale — AQE picks broadcast when the
    # built side is actually small
    d = (
        docs.join(ids, F.col(id_col) == F.col("_id"), "left_semi")
        .select(
            F.col(id_col).alias("_id"),
            F.array_distinct(
                shingles_col(tokens_col(F.col(text_col)), shingle_n)
            ).alias("_sh"),
        )
    )
    joined = candidates.join(
        d.withColumnsRenamed({"_id": "id_a", "_sh": "sh_a"}), "id_a"
    ).join(d.withColumnsRenamed({"_id": "id_b", "_sh": "sh_b"}), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        joined.withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union).otherwise(0.0),
        )
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
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline -> verified duplicate pairs.

    Recall: a pair at Jaccard s escapes all bands with probability
    (1 - s^r)^b — at the shipped 16 bands × 4 rows and s >= 0.9 that is
    ~4e-8, so the exact-Jaccard oracle (all-pairs in DuckDB) matches.
    """
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, seed=seed)
    cands = lsh_candidates(sigs, bands, num_hashes // bands, max_bucket)
    return jaccard_verify(cands, docs, text_col, id_col, threshold=threshold)


# ------------------------------------------------------------------ simhash


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash per document (token multiset, md5-60 token hash) —
    one JVM aggregate pass, reproducible by the DuckDB oracle."""
    token_hashes = F.transform(tokens_col(F.col(text_col)), h60_col)
    return ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"), simhash_col(token_hashes).alias("simhash")
    )


def _simhash_bucket_pairs(buckets: DataFrame) -> DataFrame:
    """(…, ids sorted, sh aligned) -> (id_a, id_b, hamming) inside each
    bucket, generated from the arrays in place (no self-join)."""
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.zip_with(
                        F.slice("ids", i + 2, F.size("ids") - i - 1),
                        F.slice("sh", i + 2, F.size("sh") - i - 1),
                        lambda y, hy: F.struct(
                            x.alias("id_a"),
                            y.alias("id_b"),
                            F.bit_count(
                                F.element_at(F.col("sh"), i + 1).bitwiseXOR(hy)
                            ).alias("hamming"),
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b", "p.hamming")


def simhash_near_dups(
    sigs: DataFrame,
    max_hamming: int = 3,
    max_bucket: int = 4 * DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Pairs whose 60-bit SimHashes differ in <= max_hamming bits.

    Banding: split into 4×15-bit chunks — any pair within Hamming <= 3
    must agree on at least one chunk (pigeonhole), so for max_hamming <= 3
    the bucket join is *complete*, not probabilistic: the all-pairs DuckDB
    oracle matches by construction.

    Scale bound WITHOUT losing completeness: a bucket larger than
    ``max_bucket`` (similarity-clustered corpora hit this — measured at
    5 000 word-salad docs) is not truncated; its members are RE-BANDED by
    four sub-chunks of the remaining 45 bits. Pigeonhole applies again
    (<= 3 differing bits over 4 sub-chunks ⇒ >= 1 sub-chunk agrees), so
    recall stays exact while bucket fan-out drops geometrically. Only the
    second level carries a hard cap (observed + logged, never silent) —
    a bucket that survives two levels over-cap is a near-identical flood
    where capping is the intended behavior.
    """
    n_chunks = 4
    chunk_bits = SIMHASH_BITS // n_chunks  # 15
    mask = (1 << chunk_bits) - 1
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    (F.shiftright("simhash", k * chunk_bits).bitwiseAND(F.lit(mask)))
                    for k in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    grouped = (
        chunks.groupBy("chunk_idx", "chunk")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("mem")
        )
        .select(
            "chunk_idx", "chunk", F.col("mem.doc_id").alias("ids"),
            F.col("mem.simhash").alias("sh"),
        )
        .filter(F.size("ids") > 1)
    )
    under = grouped.filter(F.size("ids") <= max_bucket)
    over = grouped.filter(F.size("ids") > max_bucket)

    # level 2: re-band over-cap buckets by sub-chunks of the remaining bits
    members = over.select(
        "chunk_idx", "chunk",
        F.explode(F.arrays_zip("ids", "sh")).alias("m"),
    ).select(
        "chunk_idx", "chunk",
        F.col("m.ids").alias("doc_id"), F.col("m.sh").alias("simhash"),
    )
    # the 45 non-bucket bits, per chunk_idx (constant shifts per branch)
    rem = None
    for k in range(n_chunks):
        low = F.col("simhash").bitwiseAND(F.lit((1 << (k * chunk_bits)) - 1))
        high = F.shiftleft(
            F.shiftright("simhash", (k + 1) * chunk_bits), k * chunk_bits
        )
        expr = high.bitwiseOR(low)
        rem = expr if rem is None else F.when(F.col("chunk_idx") == k, expr).otherwise(rem)
    rem_bits = SIMHASH_BITS - chunk_bits  # 45
    sub_bits = 12
    subs = [
        (F.shiftright(rem, j * sub_bits).bitwiseAND(
            F.lit((1 << min(sub_bits, rem_bits - j * sub_bits)) - 1)
        ))
        for j in range(4)
    ]
    sub_grouped = (
        members.select(
            "chunk_idx", "chunk", "doc_id", "simhash",
            F.posexplode(F.array(*subs)).alias("sub_idx", "sub_val"),
        )
        .groupBy("chunk_idx", "chunk", "sub_idx", "sub_val")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("mem")
        )
        .select(
            F.col("mem.doc_id").alias("ids"), F.col("mem.simhash").alias("sh"),
        )
        .filter(F.size("ids") > 1)
    )
    if max_bucket:
        sub_grouped = _observe_cap(sub_grouped, max_bucket, "simhash-l2")
        sub_grouped = sub_grouped.withColumn(
            "ids", F.slice("ids", 1, max_bucket)
        ).withColumn("sh", F.slice("sh", 1, max_bucket))

    pairs = _simhash_bucket_pairs(under).unionByName(
        _simhash_bucket_pairs(sub_grouped)
    )
    return pairs.filter(F.col("hamming") <= max_hamming).distinct()
