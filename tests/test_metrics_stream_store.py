"""North-star metric series + streaming -> TierStore ingestion."""

from __future__ import annotations

import numpy as np

from insar_spark.operators.metrics import (
    all_metrics_long,
    text_len_deltas,
    tool_call_rate,
    turns_per_min,
)
from insar_spark.sources.catalog import TierStore
from insar_spark.streaming.rollup_stream import stream_to_tierstore


def test_metric_series_shapes(spark, transcripts, transcripts_pdf):
    tpm = turns_per_min(transcripts).toPandas()
    assert (tpm["value"] >= 1).all()  # every emitted window has >= 1 turn
    assert tpm["value"].sum() == len(transcripts_pdf)

    tcr = tool_call_rate(transcripts).toPandas()
    assert ((tcr["value"] >= 0) & (tcr["value"] <= 1)).all()

    tld = text_len_deltas(transcripts).toPandas()
    n_convs = transcripts_pdf["conv_id"].nunique()
    assert len(tld) == len(transcripts_pdf) - n_convs


def test_all_metrics_long(spark, transcripts):
    long = all_metrics_long(transcripts)
    counts = {
        r["metric"]: r["n"]
        for r in long.groupBy("metric").count().withColumnRenamed("count", "n").collect()
    }
    assert set(counts) == {"turns_per_min", "tool_call_rate", "text_len_delta"}
    assert counts["turns_per_min"] == counts["tool_call_rate"]


def test_stream_to_tierstore_exactly_once(spark, tmp_path, transcripts):
    src = str(tmp_path / "src")
    transcripts.write.mode("overwrite").parquet(src)
    store = TierStore(str(tmp_path / "tiers"))
    # file replay has unbounded time disorder (each parquet file spans the
    # whole range), so the watermark must cover it or late rows are dropped
    q = stream_to_tierstore(
        spark, src, store, checkpoint_dir=str(tmp_path / "ckpt"),
        watermark="3650 days",
    )
    q.processAllAvailable()
    q.stop()

    stored = store.read_tier_log(spark, "1m")
    from insar_spark.operators.rollup import rollup_turns

    direct = rollup_turns(transcripts, "1m")
    assert stored.count() == direct.count()
    # latest-epoch-wins view equals the batch rollup exactly
    a = stored.selectExpr("sum(n_turns) s").first()["s"]
    b = direct.selectExpr("sum(n_turns) s").first()["s"]
    assert a == b
    man = store.manifest("1m")
    assert man["snapshots"][0]["run_params"]["source"] == "stream"

    # restart the stream on the same checkpoint: no new data -> no commits
    n_snaps = len(man["snapshots"])
    q2 = stream_to_tierstore(
        spark, src, store, checkpoint_dir=str(tmp_path / "ckpt"),
        watermark="3650 days",
    )
    q2.processAllAvailable()
    q2.stop()
    assert len(store.manifest("1m")["snapshots"]) == n_snaps
    assert store.read_tier_log(spark, "1m").count() == direct.count()


def test_write_tier_log_epoch_replay_dropped(spark, tmp_path, transcripts):
    from insar_spark.operators.rollup import rollup_turns

    store = TierStore(str(tmp_path / "tiers2"))
    r = rollup_turns(transcripts.filter("conv_id < 'conv00000005'"), "1m")
    first = store.write_tier_log(r, "1m", epoch=0)
    assert first["written"] > 0
    replay = store.write_tier_log(r, "1m", epoch=0)  # crash-replay of epoch 0
    assert replay["skipped_epoch"] == 0
    assert store.read_tier_log(spark, "1m").count() == r.count()


def test_write_tier_log_onto_legacy_entry_keeps_old_files(spark, tmp_path, transcripts):
    """A pre-file-tracking day entry (no 'files' list — read via the
    whole-directory fallback) that receives a new epoch append must not
    flip to a file list containing ONLY the new epoch: the older parquet
    files in the day dir would silently vanish from read_tier."""
    import json

    from insar_spark.operators.rollup import rollup_turns

    store = TierStore(str(tmp_path / "tiers3"))
    r = rollup_turns(transcripts.filter("conv_id < 'conv00000005'"), "1m")
    store.write_tier_log(r, "1m", epoch=0)
    n0 = store.read_tier(spark, "1m").count()

    # simulate a store written before file tracking: strip 'files'
    mp = store._manifest_path("1m")
    man = json.load(open(mp))
    for part in man["partitions"].values():
        part.pop("files", None)
    json.dump(man, open(mp, "w"))
    assert store.read_tier(spark, "1m").count() == n0  # dir fallback works

    r2 = rollup_turns(transcripts.filter("conv_id < 'conv00000003'"), "1m")
    second = store.write_tier_log(r2, "1m", epoch=1)
    assert second["written"] > 0
    # both generations visible: old (enumerated into the list) + new epoch
    assert store.read_tier(spark, "1m").count() == n0 + second["written"]
