"""applyInPandasWithState: cumulative reconstruction across micro-batches."""

from __future__ import annotations

import numpy as np

from insar_spark.operators.series import cumulative_reconstruct, turn_deltas, with_text_len
from insar_spark.streaming.rollup_stream import (
    read_transcript_stream,
    stateful_cumulative_reconstruction,
)


def test_stateful_recon_matches_batch(spark, tmp_path, transcripts):
    """Multi-batch streaming reconstruction == batch window cumsum."""
    small = transcripts.filter("conv_id < 'conv00000008'")
    src = str(tmp_path / "src")
    # many small files -> several micro-batches (state must carry across)
    small.repartition(12).write.mode("overwrite").parquet(src)

    stream = stateful_cumulative_reconstruction(
        read_transcript_stream(spark, src, max_files_per_trigger=3)
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("recon_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM recon_stream")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = (
        cumulative_reconstruct(turn_deltas(with_text_len(small)))
        .select("conv_id", "turn_idx", "recon_v")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["recon_v"].to_numpy(), exp["recon_v"].to_numpy())


def test_stateful_kmv_stream_matches_batch(spark, tmp_path, transcripts):
    """Streaming KMV (bounded custom state: the k smallest hashes per 1m
    window) converges to the batch kmv_rollup sketch bit-for-bit once
    all micro-batches are absorbed — union-and-retake is not an
    incremental SQL aggregate, so this is the applyInPandasWithState
    path's stream == batch proof. k=8 on a busy window forces real
    trimming (drops must never evict a true k-minimum across batches)."""
    from insar_spark.operators.sketch import kmv_rollup
    from insar_spark.streaming.rollup_stream import (
        read_transcript_stream,
        stateful_kmv_1m,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    small = transcripts.filter("conv_id < 'conv00000040'")
    src = str(tmp_path / "src_kmv")
    small.repartition(12).write.mode("overwrite").parquet(src)

    stream = stateful_kmv_1m(
        read_transcript_stream(spark, src, max_files_per_trigger=3), k=8
    )
    latest: dict = {}

    def absorb(batch_df, batch_id):
        for r in batch_df.collect():
            latest[r["window_start"]] = list(r["kmv"])

    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(absorb)
        .option("checkpointLocation", str(tmp_path / "ckpt_kmv"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    exp = {
        r["window_start"]: list(r["kmv"])
        for r in kmv_rollup(small, "1m", k=8).collect()
    }
    assert latest == exp and len(exp) > 0
    assert all(len(v) <= 8 for v in latest.values())
