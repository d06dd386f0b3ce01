"""Series window operators vs pandas oracles on the synthetic transcripts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from insar_spark.operators import series as S


def _pdf_sorted(transcripts_pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = transcripts_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len().astype("float64")
    return pdf.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle(transcripts_pdf):
    return _pdf_sorted(transcripts_pdf)


def _collect(df, cols):
    out = df.toPandas().sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    return out[cols]


def test_turn_deltas_matches_pandas(spark, transcripts, oracle):
    got = _collect(
        S.turn_deltas(S.with_text_len(transcripts)),
        ["conv_id", "turn_idx", "delta_v", "dt_sec"],
    )
    g = oracle.groupby("conv_id", sort=False)
    exp_delta = g["text_len"].diff()
    exp_dt = g["ts"].diff().dt.total_seconds()
    np.testing.assert_allclose(got["delta_v"].to_numpy(), exp_delta.to_numpy())
    np.testing.assert_allclose(got["dt_sec"].to_numpy(), exp_dt.to_numpy())


def test_cumulative_reconstruct_equals_alignment(spark, transcripts):
    """cumsum of adjacent deltas == value - first(value): the bandwidth-1
    SBAS identity (SURVEY.md §7)."""
    df = S.turn_deltas(S.with_text_len(transcripts))
    df = S.cumulative_reconstruct(df)
    df = S.reference_align(df, "text_len")
    pdf = df.select("recon_v", "text_len_aligned").toPandas()
    np.testing.assert_allclose(
        pdf["recon_v"].to_numpy(), pdf["text_len_aligned"].to_numpy()
    )


def test_reference_align_first_row_zero(spark, transcripts):
    df = S.reference_align(S.with_text_len(transcripts), "text_len")
    firsts = (
        df.toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
        .groupby("conv_id")
        .first()
    )
    assert (firsts["text_len_aligned"] == 0).all()


def test_diff_k_matches_pandas(spark, transcripts, oracle):
    got = _collect(
        S.diff_k(S.with_text_len(transcripts), "text_len", k=3),
        ["conv_id", "text_len_diff3"],
    )
    exp = oracle.groupby("conv_id", sort=False)["text_len"].diff(3)
    np.testing.assert_allclose(got["text_len_diff3"].to_numpy(), exp.to_numpy())


def test_rolling_mean_rows_matches_pandas(spark, transcripts, oracle):
    got = _collect(
        S.rolling_mean_rows(S.with_text_len(transcripts), "text_len", 2),
        ["conv_id", "text_len_rollrows"],
    )
    exp = (
        oracle.groupby("conv_id", sort=False)["text_len"]
        .rolling(5, center=True, min_periods=1)
        .mean()
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(got["text_len_rollrows"].to_numpy(), exp.to_numpy())


def test_adjacent_pairs_shape_and_deltas(spark, transcripts, oracle):
    pairs = S.adjacent_pairs(S.with_text_len(transcripts), "text_len", k=1).toPandas()
    n_rows = len(oracle)
    n_convs = oracle["conv_id"].nunique()
    assert len(pairs) == n_rows - n_convs  # one fewer pair than turns per conv
    assert (pairs["late_idx"] > pairs["early_idx"]).all()
    np.testing.assert_allclose(
        pairs["delta_v"].to_numpy(), (pairs["late_v"] - pairs["early_v"]).to_numpy()
    )


def test_all_pairs_max_gap(spark, transcripts):
    small = transcripts.filter("conv_id = 'conv00000001'")
    pairs = S.all_pairs(S.with_text_len(small), "text_len", max_gap_turns=4).toPandas()
    assert ((pairs["late_idx"] - pairs["early_idx"]) <= 4).all()
    assert (pairs["late_idx"] > pairs["early_idx"]).all()


def test_ffill(spark, transcripts):
    from pyspark.sql import functions as F

    df = S.with_text_len(transcripts).withColumn(
        "v", F.when(F.col("turn_idx") % 3 == 0, F.col("text_len"))
    )
    got = (
        S.ffill(df, "v")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = got.groupby("conv_id", sort=False)["v"].ffill()
    pd.testing.assert_series_equal(got["v_ffill"], exp, check_names=False)


def test_ewma_int_matches_python_recursion(spark, transcripts, transcripts_pdf):
    """ewma_int == the reference integer recursion run in plain Python per
    series, including signed values and the alpha=1/4 floor-shift step."""
    from pyspark.sql import functions as F

    # signed input: reference-aligned text lengths (first turn -> 0,
    # later turns go both signs)
    src = S.reference_align(S.with_text_len(transcripts)).select(
        "conv_id", "turn_idx", "ts", F.col("text_len_aligned").alias("v")
    )
    got = (
        S.ewma_int(src, "v")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    pdf = _pdf_sorted(transcripts_pdf)
    pdf["v"] = pdf["text_len"] - pdf.groupby("conv_id", sort=False)[
        "text_len"
    ].transform("first")
    rows = []
    for conv, grp in pdf.groupby("conv_id", sort=False):
        s = None
        for _, r in grp.iterrows():
            v100 = int(round(r["v"] * 100))
            s = v100 if s is None else (v100 + 3 * s) >> 2
            rows.append((conv, int(r["turn_idx"]), s / 100.0))
    exp = (
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "v_ewma"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    assert (got["v_ewma"].to_numpy() == exp["v_ewma"].to_numpy()).all()
    # sanity: smoother tracks the signal (close to a float EWMA)
    assert np.isfinite(got["v_ewma"]).all()


def test_holt_int_matches_python_recursion(spark, transcripts, transcripts_pdf):
    """holt_int == the double-exponential integer recursion run in plain
    Python per series — signed values exercise the negative-operand
    arithmetic shift in both the level and (especially) the trend step."""
    from pyspark.sql import functions as F

    src = S.reference_align(S.with_text_len(transcripts)).select(
        "conv_id", "turn_idx", "ts", F.col("text_len_aligned").alias("v")
    )
    got = (
        S.holt_int(src, "v")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    pdf = _pdf_sorted(transcripts_pdf)
    pdf["v"] = pdf["text_len"] - pdf.groupby("conv_id", sort=False)[
        "text_len"
    ].transform("first")
    rows = []
    for conv, grp in pdf.groupby("conv_id", sort=False):
        state = None
        for _, r in grp.iterrows():
            x = int(round(r["v"] * 100))
            if state is None:
                state = (x, 0)
            else:
                pl, pb = state
                nl = (x + 3 * (pl + pb)) >> 2
                nb = ((nl - pl) + 3 * pb) >> 2
                state = (nl, nb)
            rows.append(
                (conv, int(r["turn_idx"]), state[0] / 100.0,
                 state[1] / 100.0, (state[0] + state[1]) / 100.0)
            )
    exp = (
        pd.DataFrame(
            rows,
            columns=["conv_id", "turn_idx", "v_level", "v_trend", "v_forecast"],
        )
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for c in ("v_level", "v_trend", "v_forecast"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()


def test_ewma_holt_arrow_route_equals_fold(spark, transcripts):
    """The r6 mega-series route (Arrow int64 scan for series longer than
    fold_max) is bit-equal to the JVM concat-fold: force fold_max=0 so
    EVERY series takes the Arrow route and compare against the pure-fold
    output (fold_max high enough that no series routes)."""
    from pyspark.sql import functions as F

    src = S.reference_align(S.with_text_len(transcripts)).select(
        "conv_id", "turn_idx", "ts", F.col("text_len_aligned").alias("v")
    )

    def sorted_pdf(df, cols):
        return (
            df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )

    fold = sorted_pdf(S.ewma_int(src, "v", fold_max=10**9), ["v_ewma"])
    routed = sorted_pdf(S.ewma_int(src, "v", fold_max=0), ["v_ewma"])
    assert len(fold) == len(routed) > 0
    assert (fold["v_ewma"].to_numpy() == routed["v_ewma"].to_numpy()).all()

    fold_h = sorted_pdf(S.holt_int(src, "v", fold_max=10**9), ["v_level"])
    routed_h = sorted_pdf(S.holt_int(src, "v", fold_max=0), ["v_level"])
    assert len(fold_h) == len(routed_h) > 0
    for c in ("v_level", "v_trend", "v_forecast"):
        assert (fold_h[c].to_numpy() == routed_h[c].to_numpy()).all()


def test_holt_int_tracks_linear_trend(spark):
    """On a pure linear ramp the trend estimate converges to the true
    slope and the one-step forecast beats the level-only EWMA."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    rows = [
        ("c", i, datetime(2024, 1, 1) + timedelta(minutes=i), 10.0 * i)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, v double"
    )
    out = (
        S.holt_int(df, "v")
        .toPandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    tail = out.tail(50)
    # true slope is 10/turn; integer floor keeps the estimate just below
    assert (tail["v_trend"] > 9.0).all() and (tail["v_trend"] <= 10.0).all()
    # forecast for turn i predicts ~value at i+1
    actual_next = 10.0 * (tail["turn_idx"].to_numpy() + 1)
    err = abs(tail["v_forecast"].to_numpy() - actual_next)
    assert err.max() < 10.0  # within one step of the ramp
