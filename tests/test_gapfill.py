"""Gap-fill vs pandas oracles (FIXTURES.md §3 semantics)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from insar_spark.functions.gorilla import decode_values  # noqa: F401  (import check)
from insar_spark.operators.gapfill import (
    resample_linear,
    resample_spline,
    spline_eval,
)

BASE = dt.datetime(2025, 3, 1)


@pytest.fixture(scope="module")
def irregular(spark):
    """Piecewise-linear truth sampled irregularly: linear interp recovers it
    exactly on gap interiors."""
    rows = []
    # series A: y = 2*t_minutes, observed at minutes 0, 3, 4, 9, 10
    for m in [0, 3, 4, 9, 10]:
        rows.append(("A", BASE + dt.timedelta(minutes=m), 2.0 * m))
    # series B: leading/trailing gap structure, single interior gap
    for m, v in [(5, 10.0), (6, 12.0), (12, 0.0)]:
        rows.append(("B", BASE + dt.timedelta(minutes=m), v))
    # series C: single point
    rows.append(("C", BASE + dt.timedelta(minutes=2), 7.0))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "ts", "v"])
    )


def test_linear_recovers_piecewise_linear_truth(spark, irregular):
    out = (
        resample_linear(irregular, interval_sec=60)
        .toPandas()
        .sort_values(["conv_id", "grid_ts"])
        .reset_index(drop=True)
    )
    a = out[out.conv_id == "A"]
    assert len(a) == 11  # minutes 0..10 inclusive
    np.testing.assert_allclose(
        a["v_filled"].to_numpy(), 2.0 * np.arange(11), atol=1e-9
    )
    # interior gap of B: minute 6 -> 12 interpolates linearly 12 -> 0
    b = out[out.conv_id == "B"].set_index("grid_ts")
    t9 = BASE + dt.timedelta(minutes=9)
    assert b.loc[t9, "v_filled"] == pytest.approx(12.0 - (12.0 / 6.0) * 3)
    # grid spans only the observed range: no extrapolation rows at all
    assert b.index.min() == BASE + dt.timedelta(minutes=5)
    assert b.index.max() == BASE + dt.timedelta(minutes=12)
    # single-point series: one observed row
    c = out[out.conv_id == "C"]
    assert len(c) == 1 and c["v_filled"].iloc[0] == 7.0


def test_linear_matches_pandas_interpolate(spark, transcripts):
    """Random irregular series: engine output == pandas resample+interpolate
    (inside the observed span)."""
    from pyspark.sql import functions as F

    df = transcripts.filter("conv_id IN ('conv00000002','conv00000003')").select(
        "conv_id", "ts", F.length("text").cast("double").alias("v")
    )
    got = (
        resample_linear(df, interval_sec=3600)
        .toPandas()
        .sort_values(["conv_id", "grid_ts"])
        .reset_index(drop=True)
    )
    pdf = df.toPandas()
    for cid, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        # last value per hour bucket, then linear interp on the hour grid
        s = (
            g.set_index("ts")["v"]
            .resample("3600s")
            .last()
            .interpolate("index", limit_area="inside")
        )
        s = s.loc[s.first_valid_index() : s.last_valid_index()]
        mine = got[got.conv_id == cid]
        np.testing.assert_allclose(
            mine["v_filled"].to_numpy(), s.to_numpy(), atol=1e-9, err_msg=cid
        )


def test_spline_eval_exact_on_cubic_knots():
    # natural spline interpolates the knots exactly
    x = np.array([0.0, 1.0, 2.5, 4.0, 7.0])
    y = np.array([1.0, -2.0, 0.5, 3.0, 3.5])
    np.testing.assert_allclose(spline_eval(x, y, x), y, atol=1e-12)
    # linear data reproduced exactly everywhere (spline of a line is the line)
    xl = np.linspace(0, 10, 7)
    yl = 3 * xl + 1
    xq = np.linspace(0, 10, 50)
    np.testing.assert_allclose(spline_eval(xl, yl, xq), 3 * xq + 1, atol=1e-9)
    # no extrapolation
    assert np.isnan(spline_eval(x, y, np.array([-1.0, 8.0]))).all()


def test_spline_spark_matches_local_kernel(spark, irregular):
    out = (
        resample_spline(irregular.filter("conv_id = 'A'"), interval_sec=60)
        .toPandas()
        .sort_values("grid_ts")
        .reset_index(drop=True)
    )
    x = np.array([0, 3, 4, 9, 10], dtype=np.float64) * 60e6
    y = np.array([0, 6, 8, 18, 20], dtype=np.float64)
    xq = np.arange(0, 11, dtype=np.float64) * 60e6
    exp = spline_eval(x, y, xq)
    np.testing.assert_allclose(out["v_filled"].to_numpy(), exp, atol=1e-9)
    # observed flags
    assert out["is_observed"].sum() == 5
