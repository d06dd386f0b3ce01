"""Smoothing & model-fit tests."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from insar_spark.functions.lowess_kernel import lowess_xy
from insar_spark.operators.smoothing import lowess_smooth, polyfit_deg1, polyfit_series


def test_lowess_reproduces_linear_exactly():
    x = np.linspace(0, 100, 60)
    y = 3.0 * x + 7.0
    sm = lowess_xy(x, y, min_x_weighted=30.0, it=2)
    np.testing.assert_allclose(sm, y, atol=1e-8)


def test_lowess_smooths_noise():
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 365, 200))
    truth = 0.05 * x
    y = truth + rng.normal(0, 2.0, 200)
    sm = lowess_xy(x, y, min_x_weighted=120.0, it=2)
    # smoother output is closer to truth than the noisy input
    assert np.abs(sm - truth).mean() < np.abs(y - truth).mean() * 0.5


def test_lowess_robust_to_outliers():
    x = np.linspace(0, 100, 80)
    y = 2.0 * x.copy()
    y[40] += 500.0  # gross outlier
    sm = lowess_xy(x, y, min_x_weighted=25.0, it=2)
    # robustness pulls the outlier all the way back onto the line
    np.testing.assert_allclose(sm, 2.0 * x, atol=1e-9)


@pytest.fixture(scope="module")
def trend_series(spark):
    base = dt.datetime(2025, 1, 1)
    rows = []
    for cid, slope in [("s1", 2.0), ("s2", -0.5)]:
        for d in range(40):
            rows.append((cid, d, base + dt.timedelta(days=d), slope * d + 10.0))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "v"])
    )


def test_polyfit_deg1_recovers_slope(spark, trend_series):
    out = polyfit_deg1(trend_series).toPandas().set_index("conv_id")
    assert out.loc["s1", "slope_per_day"] == pytest.approx(2.0, abs=1e-9)
    assert out.loc["s2", "slope_per_day"] == pytest.approx(-0.5, abs=1e-9)
    assert out.loc["s1", "r2"] == pytest.approx(1.0, abs=1e-9)


def test_polyfit_series_matches_numpy(spark, trend_series):
    out = polyfit_series(trend_series, degree=2).toPandas().set_index("conv_id")
    # exact-linear data: quadratic coefficient ~0, linear == slope
    c1 = out.loc["s1", "coeffs"]
    assert c1[1] == pytest.approx(2.0, abs=1e-6)
    assert c1[2] == pytest.approx(0.0, abs=1e-8)
    assert out.loc["s1", "resid_std"] == pytest.approx(0.0, abs=1e-8)


def test_lowess_spark_matches_kernel(spark, trend_series):
    got = (
        lowess_smooth(trend_series, "v", min_span_days=10.0, it=1)
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    pdf = trend_series.toPandas().sort_values(["conv_id", "ts"])
    for cid, g in pdf.groupby("conv_id"):
        x = g["ts"].to_numpy("datetime64[us]").astype("int64") / 1e6 / 86400.0
        exp = lowess_xy(x, g["v"].to_numpy(), min_x_weighted=10.0, it=1)
        mine = got[got.conv_id == cid]["smooth"].to_numpy()
        np.testing.assert_allclose(mine, exp, atol=1e-9, err_msg=cid)


def test_gaussian_time_filter_matches_numpy(spark, trend_series):
    from insar_spark.operators.smoothing import gaussian_time_filter

    sigma, cutoff = 3600.0, 3.0
    got = (
        gaussian_time_filter(trend_series, "v", sigma_sec=sigma, cutoff=cutoff)
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    pdf = trend_series.toPandas().sort_values(["conv_id", "ts"])
    for cid, g in pdf.groupby("conv_id"):
        t = g["ts"].to_numpy("datetime64[us]").astype("int64") / 1e6
        y = g["v"].to_numpy()
        exp = np.empty(len(t))
        for i in range(len(t)):
            dt_ = t - t[i]
            m = np.abs(dt_) <= cutoff * sigma
            w = np.exp(-(dt_[m] ** 2) / (2 * sigma**2))
            exp[i] = (w * y[m]).sum() / w.sum()
        mine = got[got.conv_id == cid]["smooth"].to_numpy()
        np.testing.assert_allclose(mine, exp, atol=1e-9, err_msg=cid)


def test_gaussian_filter_constant_is_identity(spark, trend_series):
    from insar_spark.operators.smoothing import gaussian_time_filter

    const = trend_series.withColumn("v", F.lit(5.0))
    out = gaussian_time_filter(const, "v", sigma_sec=1800.0).toPandas()
    np.testing.assert_allclose(out["smooth"].to_numpy(), 5.0, atol=1e-12)
