"""Golden + property tests for the quality/telemetry operators."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from insar_spark.operators import quality as Q

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float):
    return T0 + timedelta(minutes=minutes)


def _series(spark, rows):
    """rows: (conv_id, turn_idx, minutes, value) -> series-shaped df with ord."""
    df = spark.createDataFrame(
        [(c, i, _ts(m), float(v)) for c, i, m, v in rows],
        schema="conv_id string, turn_idx int, ts timestamp, v double",
    )
    return df.withColumn(
        "ord",
        F.floor(F.unix_micros("ts") / 1000) * (1 << 20) + F.col("turn_idx"),
    )


# ---------------------------------------------------------------- late data


def test_late_data_profile_golden(spark):
    # arrival order = event_id; c1 has one late event (id 3, 5 min behind
    # the running max) and one frontier-tie duplicate ts (id 4)
    rows = [
        (1, _ts(0), 7, "m"),
        (2, _ts(10), 7, "m"),
        (3, _ts(5), 7, "m"),   # late by 5 min vs running max @10
        (4, _ts(10), 7, "m"),  # ties the running max
        (5, _ts(0), 8, "m"),   # other conv: in order
        (6, _ts(1), 8, "m"),
    ]
    ev = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, conv_id long, x string"
    )
    out = {
        r["conv_id"]: r
        for r in Q.late_data_profile(ev, key_col="conv_id").collect()
    }
    assert out[7]["n_events"] == 4
    assert out[7]["n_late"] == 1
    assert out[7]["max_lateness_us"] == 5 * 60 * 1_000_000
    assert out[7]["n_ts_dups"] == 1
    assert out[8]["n_late"] == 0
    assert out[8]["max_lateness_us"] == 0


# -------------------------------------------------------------------- cusum


def test_cusum_detects_level_shift(spark):
    # 20 turns at 100 then 20 at 200: shift at turn 20
    rows = [("c", i, i, 100 if i < 20 else 200) for i in range(40)]
    df = _series(spark, rows)
    out = Q.cusum_level_shift(df, "v").collect()[0]
    assert out["n_turns"] == 40
    assert out["up_score"] > 0
    # drawup peaks exactly at the change point boundary
    assert out["shift_turn_idx"] in (19, 20)
    # constant series scores zero
    flat = _series(spark, [("f", i, i, 150) for i in range(40)])
    z = Q.cusum_level_shift(flat, "v").collect()[0]
    assert z["up_score"] == 0 and z["down_score"] == 0


def test_cusum_shift_invariance(spark):
    # adding a constant to every value leaves S_i (and both scores) unchanged
    base = [("c", i, i, (i * 37) % 113) for i in range(50)]
    shifted = [(c, i, m, v + 1000) for c, i, m, v in base]
    a = Q.cusum_level_shift(_series(spark, base), "v").collect()[0]
    b = Q.cusum_level_shift(_series(spark, shifted), "v").collect()[0]
    assert a["up_score"] == b["up_score"]
    assert a["down_score"] == b["down_score"]
    assert a["shift_turn_idx"] == b["shift_turn_idx"]


# --------------------------------------------------------- counter increase


def test_counter_increase_no_resets_is_exact(spark):
    # strictly growing counter: increase per window == last - first + first
    rows = [("c", i, i, 10 * (i + 1)) for i in range(6)]  # 10,20,...,60
    df = _series(spark, rows).withColumn("cnt", F.col("v").cast("long"))
    out = Q.counter_increase(df, "cnt", window_unit="hour").collect()[0]
    assert out["increase"] == 60  # 10 (first) + 5 deltas of 10
    assert out["n_resets"] == 0


def test_counter_increase_reset_golden(spark):
    # counter: 10, 30, 5 (reset), 25 -> increase = 10 + 20 + 5 + 20 = 55
    vals = [10, 30, 5, 25]
    rows = [("c", i, i, v) for i, v in enumerate(vals)]
    df = _series(spark, rows).withColumn("cnt", F.col("v").cast("long"))
    out = Q.counter_increase(df, "cnt", window_unit="hour").collect()[0]
    assert out["increase"] == 55
    assert out["n_resets"] == 1
    assert out["n_scrapes"] == 4


# --------------------------------------------------------------- hod flags


def test_hod_anomaly_flags(spark):
    # 10 days of 1h windows at hour 3: nine quiet (100±1), one spike (500)
    rows = [
        ("evt", datetime(2024, 1, d, 3, 0, 0), 100 + (d % 3)) for d in range(1, 10)
    ] + [("evt", datetime(2024, 1, 10, 3, 0, 0), 500)]
    tier = spark.createDataFrame(
        rows, schema="event_type string, window_start timestamp, n long"
    )
    out = Q.hod_anomaly_flags(tier, "n", group_cols=("event_type",)).collect()
    flags = {r["window_start"].day: r["is_anomaly"] for r in out}
    assert flags[10] == 1
    assert sum(flags.values()) == 1  # only the spike
    assert all(r["cohort_n"] == 10 for r in out)


# ------------------------------------------------------------------- corr


def test_corr_components_exact_lines(spark):
    data = [
        ("p", x, 2 * x) for x in range(1, 6)  # y = 2x
    ] + [("q", x, 100 - 3 * x) for x in range(1, 6)] + [  # y = -3x + 100
        ("z", x, 7) for x in range(1, 6)  # zero variance in y
    ]
    tier = spark.createDataFrame(data, schema="conv_id string, x long, y long")
    out = {r["conv_id"]: r for r in Q.corr_components(tier, "x", "y").collect()}
    assert out["p"]["corr6"] == 1.0
    assert out["q"]["corr6"] == -1.0
    assert out["z"]["corr6"] is None
    assert out["p"]["sum_x"] == 15 and out["p"]["sum_y"] == 30


# ------------------------------------------------- stored-tier serve path


def test_anomaly_flags_from_stored_tier(spark, tmp_path):
    """The anomaly flag is a SERVE-path query: running it over the
    rollup_job-persisted 1h tier yields byte-identical decisions to
    running it over a direct 1h rollup of raw turns — the tier store is
    the query's real input at scale, never a raw re-scan."""
    import pandas as pd

    from insar_spark.operators.rollup import rollup_turns
    from insar_spark.sources.catalog import TierStore
    from insar_spark.synth import synth_transcripts
    from jobs.rollup_job import main as job_main

    store_path = str(tmp_path / "tiers_q")
    job_main(["--input", "synth:60", "--store", store_path, "--master", "local[4]"])
    stored = (
        TierStore(store_path)
        .read_tier(spark, "1h")
        .select("conv_id", "window_start", "n_turns")
    )
    from_store = (
        Q.hod_anomaly_flags(stored, "n_turns", group_cols=("conv_id",))
        .toPandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    direct_tier = rollup_turns(synth_transcripts(spark, n_convs=60), "1h").select(
        "conv_id", "window_start", "n_turns"
    )
    direct = (
        Q.hod_anomaly_flags(direct_tier, "n_turns", group_cols=("conv_id",))
        .toPandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(from_store, direct, check_exact=True)
    assert set(from_store["is_anomaly"].unique()) <= {0, 1}


def test_anomaly_realtime_equals_batch(spark, tmp_path, transcripts):
    """Alerting loop, stream == batch: anomaly flags over the three-layer
    real-time stats view (committed 1h days + sealed 1m days + live epoch
    log) are byte-identical to flags over a batch 1h rollup of every turn
    that has arrived — streaming ingestion and batch backfill reach the
    same alert decisions."""
    import datetime as dt

    import pandas as pd

    from insar_spark.operators.rollup import cascade, rollup_turns
    from insar_spark.sources.catalog import TierStore
    from insar_spark.streaming.rollup_stream import (
        anomaly_realtime_1h,
        seal_and_compact,
        stream_to_tierstore,
    )

    src = str(tmp_path / "drop_an")
    transcripts.write.mode("overwrite").parquet(src)
    store = TierStore(str(tmp_path / "tiers_an"))
    q = stream_to_tierstore(
        spark, src, store, checkpoint_dir=str(tmp_path / "ckpt_an"),
        watermark="60 minutes", tier="1m_log",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    seal = seal_and_compact(
        spark, store, log_tier="1m_log", sealed_tier="1m",
        watermark="60 minutes",
    )
    assert len(seal["written_days"]) > 1
    # stricter 1h horizon: leave >=1 sealed day only in 1m, so the view
    # must stitch all three layers
    sb_1h = (
        dt.date.fromisoformat(seal["seal_before"]) - dt.timedelta(days=1)
    ).isoformat()
    store.write_tier(
        cascade(store.read_tier(spark, "1m").drop("day"), "1h"), "1h",
        run_params={"source": "test_cascade"}, seal_before=sb_1h,
    )
    assert store.committed_days("1h")
    assert set(store.committed_days("1m")) - store.committed_days("1h")

    got = (
        anomaly_realtime_1h(spark, store)
        .toPandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    batch_tier = rollup_turns(transcripts, "1h").select(
        "conv_id", "window_start", "n_turns"
    )
    from insar_spark.operators.quality import hod_anomaly_flags

    expected = (
        hod_anomaly_flags(batch_tier, "n_turns", group_cols=("conv_id",))
        .toPandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expected) > 0
    pd.testing.assert_frame_equal(got, expected, check_exact=True)


# ------------------------------------------------- watermark recommendation


def test_watermark_recommendation_bounds(spark):
    """wm_us covers the true lateness quantile from above and overshoots
    by at most the lb sketch's relative error; a fully in-order stream
    recommends 0."""
    # 990 in-order events + 10 late by exactly 300s (3e8 us)
    rows = []
    for i in range(990):
        rows.append((i, _ts(i), "a"))
    # late events: arrival AFTER a much newer frontier
    for j in range(10):
        rows.append((1000 + j, _ts(989 - 5), "a"))  # 5 min behind max
    ev = spark.createDataFrame(
        rows, schema="arrival long, ts timestamp, conv_id string"
    )
    out = Q.watermark_recommendation(
        ev, key_col="conv_id", arrival_col="arrival", q=0.999
    ).collect()[0]
    true_late_us = 5 * 60 * 1_000_000
    assert out["n_events"] == 1000
    assert out["n_late"] == 10
    # p99.9 rank (ceil(1000*0.999)=999) lands inside the late mass
    assert out["wm_us"] >= true_late_us
    assert out["wm_us"] <= true_late_us * 1.04  # 2^-5 relative bound

    inorder = spark.createDataFrame(
        [(i, _ts(i), "c") for i in range(50)],
        schema="arrival long, ts timestamp, conv_id string",
    )
    z = Q.watermark_recommendation(
        inorder, key_col="conv_id", arrival_col="arrival", q=0.999
    ).collect()[0]
    assert z["wm_us"] == 0 and z["n_late"] == 0


def test_stream_job_size_watermark_reports_recommendation(spark, tmp_path, transcripts):
    """--size-watermark ARRIVAL_COL: the stream job profiles the drop's
    lateness distribution before streaming and reports the recommended
    watermark in its metrics line, equal to the operator run directly."""
    from jobs.stream_job import main as stream_main

    # doctored ingest order: every 10th turn is delivered ~17 min late
    doctored = transcripts.withColumn(
        "ingest_seq",
        F.unix_micros("ts")
        + F.when(F.col("turn_idx") % 10 == 0, F.lit(1_000_000_000)).otherwise(
            F.lit(0)
        ),
    )
    src = str(tmp_path / "drop_wm")
    doctored.write.mode("overwrite").parquet(src)

    expected = Q.watermark_recommendation(
        spark.read.parquet(src), key_col="conv_id",
        arrival_col="ingest_seq", q=0.999,
    ).collect()[0]
    assert expected["n_late"] > 0  # the doctoring really creates lateness

    m = stream_main([
        "--input", src, "--store", str(tmp_path / "tiers_wm"),
        "--checkpoint", str(tmp_path / "ckpt_wm"), "--drain",
        "--size-watermark", "ingest_seq", "--master", "local[4]",
    ])
    assert m["lateness_n_events"] == expected["n_events"]
    assert m["lateness_n_late"] == expected["n_late"]
    assert m["recommended_watermark_us"] == expected["wm_us"]
    assert m["recommended_watermark_us"] > 0


def test_late_data_ties_are_deterministic(spark):
    """Rows sharing an arrival value are concurrent deliveries: the RANGE
    frame means neither sees the other's timestamp, so the profile is
    deterministic under ties (a ROWS frame would depend on arbitrary
    intra-tie order)."""
    rows = [
        (1, _ts(10), "t"),
        (2, _ts(0), "t"),   # tied arrival, 10 min behind the frontier
        (2, _ts(20), "t"),  # tied arrival, ahead of the frontier
    ]
    ev = spark.createDataFrame(
        rows, schema="arrival long, ts timestamp, conv_id string"
    )
    out = Q.late_data_profile(
        ev, key_col="conv_id", arrival_col="arrival"
    ).collect()[0]
    assert out["n_late"] == 1
    assert out["max_lateness_us"] == 10 * 60 * 1_000_000


def test_watermark_recommendation_empty_input_is_zeros(spark):
    ev = spark.createDataFrame(
        [], schema="arrival long, ts timestamp, conv_id string"
    )
    out = Q.watermark_recommendation(
        ev, key_col="conv_id", arrival_col="arrival"
    ).collect()[0]
    assert (out["n_events"], out["n_late"], out["wm_us"]) == (0, 0, 0)


def test_cusum_ignores_null_values(spark):
    rows = [("c", i, i, 100 if i < 20 else 200) for i in range(40)]
    df = _series(spark, rows)
    with_null = df.withColumn(
        "v", F.when(F.col("turn_idx") == 5, None).otherwise(F.col("v"))
    )
    dropped = df.filter(F.col("turn_idx") != 5)
    a = Q.cusum_level_shift(with_null, "v").collect()[0]
    b = Q.cusum_level_shift(dropped, "v").collect()[0]
    assert (a["up_score"], a["down_score"], a["shift_turn_idx"]) == (
        b["up_score"], b["down_score"], b["shift_turn_idx"]
    )


# --------------------------------------------------------- reconciliation


def test_tier_reconcile_localizes_discrepancies(spark, tmp_path, transcripts):
    """tier_reconcile against a doctored copy: a clean reconcile is
    all-match; a value corruption, a dropped row, and an extra row each
    land in the right counter on the right day."""
    from insar_spark.operators.rollup import rollup_turns

    tier = rollup_turns(transcripts, "1h").cache()
    clean = Q.tier_reconcile(tier, tier).toPandas()
    assert (clean["n_mismatch"] == 0).all()
    assert (clean["n_only_a"] == 0).all() and (clean["n_only_b"] == 0).all()
    assert clean["n_match"].sum() == tier.count()

    # pick one row to corrupt, one to drop, relative to a fixed day
    target = tier.orderBy("conv_id", "window_start").limit(1).collect()[0]
    t_conv, t_win = target["conv_id"], target["window_start"]
    doctored = tier.withColumn(
        "n_turns",
        F.when(
            (F.col("conv_id") == t_conv) & (F.col("window_start") == t_win),
            F.col("n_turns") + 1,
        ).otherwise(F.col("n_turns")),
    )
    rec = Q.tier_reconcile(tier, doctored).toPandas()
    assert rec["n_mismatch"].sum() == 1
    bad_day = rec[rec["n_mismatch"] == 1]["day"].iloc[0]
    assert bad_day.date() == t_win.date()

    # dropped row -> only_a on that day
    dropped = tier.filter(
        ~((F.col("conv_id") == t_conv) & (F.col("window_start") == t_win))
    )
    rec2 = Q.tier_reconcile(tier, dropped).toPandas()
    assert rec2["n_only_a"].sum() == 1 and rec2["n_only_b"].sum() == 0


def test_tier_reconcile_array_tier(spark, transcripts):
    """Reconciliation works on sketch tiers too: eqNullSafe compares the
    histogram array column element-wise, so a single-bin corruption is a
    mismatch."""
    from insar_spark.operators.sketch import hist_rollup

    tier = hist_rollup(
        transcripts.select(
            "conv_id", "ts", F.length("text").cast("double").alias("v")
        ),
        "1h",
    ).cache()
    clean = Q.tier_reconcile(tier, tier).toPandas()
    assert (clean["n_mismatch"] == 0).all()

    target = tier.orderBy("conv_id", "window_start").limit(1).collect()[0]
    doctored = tier.withColumn(
        "hist",
        F.when(
            (F.col("conv_id") == target["conv_id"])
            & (F.col("window_start") == target["window_start"]),
            F.transform(
                "hist", lambda x, i: x + F.when(i == 0, 1).otherwise(0)
            ),
        ).otherwise(F.col("hist")),
    )
    rec = Q.tier_reconcile(tier, doctored).toPandas()
    assert rec["n_mismatch"].sum() == 1
