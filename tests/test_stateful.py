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
