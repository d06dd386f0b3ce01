"""Streaming ingestion + sealed-day compaction job (spark-submit entry).

Usage (cluster):
    spark-submit --py-files insar_spark.zip jobs/stream_job.py \
        --input /data/transcript_drops --store /data/tiers \
        --checkpoint /data/ckpt --watermark "10 minutes"

Usage (sandbox, synthesized drop):
    python jobs/stream_job.py --input synth:200 --store /tmp/tiers \
        --checkpoint /tmp/ckpt --drain

Flow:
  file-source stream -> watermarked 1m tumbling rollup -> epoch-tagged
  commits into the ``1m_log`` tier (update mode, exactly-once via the
  snapshot manifest) -> ``seal_and_compact``: days the watermark has
  finalized move into ordinary committed ``1m`` partitions and are
  truncated from the log. Restartable at every level: the stream resumes
  from its checkpoint, replayed epochs are dropped by the manifest tag,
  and the compactor's write path skips already-committed days — the
  streaming analog of the reference's check_dset/start_layer resume
  (insar/prepare.py:228, :942).

``--drain`` processes whatever files exist and exits (tests / batch-drop
backfill); without it the query runs until interrupted, compacting after
each drain interval.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict:
    from insar_spark.session import get_spark
    from insar_spark.sources.catalog import TierStore
    from insar_spark.streaming.rollup_stream import (
        seal_and_compact,
        stream_to_tierstore,
    )
    from insar_spark.synth import synth_transcripts

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="parquet drop dir or synth:N")
    p.add_argument("--store", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--watermark", default="10 minutes")
    p.add_argument("--master", default=None)
    p.add_argument("--drain", action="store_true",
                   help="process available files, seal, and exit")
    args = p.parse_args(argv)

    spark = get_spark("stream_job", master=args.master)
    store = TierStore(args.store)

    src = args.input
    if src.startswith("synth:"):
        # land a deterministic drop for the file source to replay
        src = os.path.join(args.store, "_drop")
        if not os.path.exists(src):
            synth_transcripts(
                spark, n_convs=int(args.input.split(":")[1])
            ).write.mode("overwrite").parquet(src)

    t0 = time.perf_counter()
    q = stream_to_tierstore(
        spark, src, store, checkpoint_dir=args.checkpoint,
        watermark=args.watermark, tier="1m_log",
    )
    q.processAllAvailable()
    if args.drain:
        q.stop()
    seal = seal_and_compact(
        spark, store, log_tier="1m_log", sealed_tier="1m",
        watermark=args.watermark,
    )
    metrics = {
        "seal_before": seal["seal_before"],
        "sealed_days": len(seal["written_days"]),
        "truncated_log_days": len(seal["truncated"]),
        "open_log_days": len(store.committed_days("1m_log")),
        "committed_1m_days": len(store.committed_days("1m")),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    print(json.dumps(metrics))
    if not args.drain:
        q.awaitTermination()
    return metrics


if __name__ == "__main__":
    main()
