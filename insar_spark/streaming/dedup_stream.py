"""Streaming near-duplicate detection against a persisted MinHash index.

The production shape of web-crawl dedup as a stream: each micro-batch of
new documents is

  1. deduped against the stored corpus index + itself
     (``minhash_dedup_incremental`` — only the BATCH is hashed; stored
     banded rows are pruned to touched buckets, so per-batch cost is
     O(new), independent of corpus size),
  2. its banded signatures APPENDED to the index (partitionBy(band)),
  3. its raw docs appended to the corpus store (verify-stage text lookups).

Pairs accumulate append-only, tagged by epoch; a replayed micro-batch
(foreachBatch re-execution after a crash) is skipped via an epoch marker
— the same manifest-tag idempotency as the tier stream
(streaming/rollup_stream.py, catalog.write_tier_log).

Invariant (tested): after streaming N drops, the union of emitted pairs
equals the one-shot batch ``minhash_dedup`` over the full corpus — each
old↔old pair was emitted when its later member was new.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


class DedupStreamStore:
    """Filesystem layout for the streaming dedup state."""

    def __init__(self, root: str):
        self.root = root
        self.index = os.path.join(root, "index")
        self.corpus = os.path.join(root, "corpus")
        self.pairs = os.path.join(root, "pairs")
        self.epochs = os.path.join(root, "_epochs.json")
        os.makedirs(root, exist_ok=True)

    def seen(self, epoch: int) -> bool:
        try:
            with open(self.epochs) as f:
                return int(epoch) in json.load(f)
        except (OSError, ValueError):
            return False

    def mark(self, epoch: int) -> None:
        try:
            with open(self.epochs) as f:
                eps = json.load(f)
        except (OSError, ValueError):
            eps = []
        eps.append(int(epoch))
        with open(self.epochs, "w") as f:
            f.write(json.dumps(eps))

    def has_corpus(self) -> bool:
        return os.path.exists(os.path.join(self.corpus, "_SUCCESS"))


def process_dedup_batch(
    spark: SparkSession,
    store: DedupStreamStore,
    batch: DataFrame,
    epoch: int,
    threshold: float = 0.8,
    max_bucket: int = 64,
) -> None:
    """One micro-batch: detect pairs involving the batch, then extend the
    index and corpus. Idempotent per epoch."""
    from insar_spark.operators.dedup import (
        band_signatures,
        minhash_dedup,
        minhash_dedup_incremental,
        minhash_signatures,
    )

    if store.seen(epoch):
        return
    batch = batch.persist()
    try:
        if batch.isEmpty():
            return
        if store.has_corpus():
            all_docs = spark.read.parquet(store.corpus).unionByName(batch)
            pairs = minhash_dedup_incremental(
                spark, batch, store.index, all_docs,
                threshold=threshold, max_bucket=max_bucket,
            )
        else:
            pairs = minhash_dedup(
                batch, threshold=threshold, max_bucket=max_bucket
            )
        pairs.withColumn("_epoch", F.lit(int(epoch))).write.mode(
            "append"
        ).parquet(store.pairs)
        banded = band_signatures(minhash_signatures(batch), 16, 4)
        (
            banded.repartition("band")
            .sortWithinPartitions("bucket")
            .write.partitionBy("band")
            .mode("append")
            .parquet(store.index)
        )
        batch.select("doc_id", "text").write.mode("append").parquet(
            store.corpus
        )
        store.mark(epoch)
    finally:
        batch.unpersist()


def stream_dedup(
    spark: SparkSession,
    src_path: str,
    store: DedupStreamStore,
    checkpoint_dir: str,
    threshold: float = 0.8,
):
    """File-source stream of document drops -> foreachBatch incremental
    dedup. Whole-drop trigger (no maxFilesPerTrigger): a drop's files
    carry no order among themselves."""

    def handle(batch_df: DataFrame, epoch: int) -> None:
        process_dedup_batch(
            spark, store, batch_df, epoch, threshold=threshold
        )

    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .parquet(src_path)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
