"""Gap-fill: resample irregular series to a regular calendar grid (W7/W8).

Spark-native re-expression of the reference's
``utils.interpolate_xr(ds, freq=...)`` calendar-grid interpolation
(/root/reference/insar/scripts/create_east_up.py:330-347) and ffill-reindex
(:293-295):

1. per series, build the regular grid with ``sequence() + explode`` (the
   UDTF analog — SURVEY.md §2.10),
2. left-join observed values onto the grid (one shuffle, co-partitioned
   with the subsequent windows),
3. linear interpolation between the previous and next observation with
   pure window functions — ``last(ignorenulls)`` looking back and
   ``first(ignorenulls)`` looking forward. NULL outside the observed span
   (no extrapolation), matching the reference's semantics.

The cubic-spline variant runs per-series in an Arrow grouped-map UDF
(natural spline, NumPy tridiagonal solve — no scipy dependency).

Scale: the grid explode is distributed (each series' rows stay in its
partition); for a series spanning D days at a 1-minute grid this emits
1440·D rows — choose the grid to match the tier being filled, and fill
*rollups*, not raw turns, at coarse tiers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def observed_per_window(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    interval_sec: int,
    ord_col: str | None = None,
) -> DataFrame:
    """Collapse raw points to one observation per grid cell (last wins,
    by total order ``ord_col`` if given, else by max value timestamp)."""
    win = (
        F.timestamp_seconds(
            F.floor(F.unix_micros(F.col(ts_col)) / F.lit(interval_sec * 1_000_000))
            * F.lit(interval_sec)
        )
    ).alias("grid_ts")
    o = F.col(ord_col) if ord_col else F.unix_micros(F.col(ts_col))
    return (
        df.select(F.col(key), win, F.col(value_col).alias("v"), o.alias("_o"))
        .groupBy(key, "grid_ts")
        .agg(F.max_by("v", "_o").alias("v"))
    )


def resample_linear(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "v",
    interval_sec: int = 60,
    ord_col: str | None = None,
) -> DataFrame:
    """Regular-grid resample with linear gap interpolation.

    Output: (key, grid_ts, v_filled, is_observed). ``v_filled`` is the
    observed value on observed cells, the linear interpolation strictly
    inside the observed span, NULL outside it.
    """
    obs = observed_per_window(df, key, ts_col, value_col, interval_sec, ord_col)

    # per-series grid bounds -> sequence/explode (broadcastable tiny dim)
    bounds = obs.groupBy(key).agg(
        F.min("grid_ts").alias("lo"), F.max("grid_ts").alias("hi")
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(
                "lo", "hi", F.expr(f"INTERVAL {interval_sec} SECOND")
            )
        ).alias("grid_ts"),
    )

    j = grid.join(obs, [key, "grid_ts"], "left")

    w_back = (
        Window.partitionBy(key)
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy("grid_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_obs = F.when(F.col("v").isNotNull(), F.unix_micros("grid_ts"))
    prev_v = F.last("v", ignorenulls=True).over(w_back)
    prev_t = F.last(t_obs, ignorenulls=True).over(w_back)
    next_v = F.first("v", ignorenulls=True).over(w_fwd)
    next_t = F.first(t_obs, ignorenulls=True).over(w_fwd)

    g_t = F.unix_micros("grid_ts")
    interp = prev_v + (next_v - prev_v) * (
        (g_t - prev_t).cast("double") / (next_t - prev_t).cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(prev_v.isNull() | next_v.isNull(), F.lit(None).cast("double"))
        .otherwise(interp)
    )
    return j.select(
        key,
        "grid_ts",
        filled.alias("v_filled"),
        F.col("v").isNotNull().alias("is_observed"),
    )


# ------------------------------------------------------- spline (UDF path)


def _natural_cubic_coeffs(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Second derivatives M for a natural cubic spline (Thomas solve)."""
    n = len(x)
    if n < 3:
        return np.zeros(n)
    h = np.diff(x)
    # tridiagonal system: mu M_{i-1} + 2 M_i + lam M_{i+1} = d_i
    a = h[:-1] / (h[:-1] + h[1:])  # sub-diagonal weight
    b = np.full(n - 2, 2.0)
    c = h[1:] / (h[:-1] + h[1:])
    d = 6.0 * (
        (y[2:] - y[1:-1]) / h[1:] - (y[1:-1] - y[:-2]) / h[:-1]
    ) / (h[:-1] + h[1:])
    # Thomas algorithm
    cp = np.zeros(n - 2)
    dp = np.zeros(n - 2)
    cp[0] = c[0] / b[0]
    dp[0] = d[0] / b[0]
    for i in range(1, n - 2):
        m = b[i] - a[i] * cp[i - 1]
        cp[i] = c[i] / m
        dp[i] = (d[i] - a[i] * dp[i - 1]) / m
    M = np.zeros(n)
    M[n - 2] = dp[-1]
    for i in range(n - 3, 0, -1):
        M[i] = dp[i - 1] - cp[i - 1] * M[i + 1]
    return M


def spline_eval(
    x: np.ndarray, y: np.ndarray, xq: np.ndarray
) -> np.ndarray:
    """Evaluate the natural cubic spline through (x, y) at xq.

    Points outside [x[0], x[-1]] return NaN (no extrapolation). With fewer
    than 3 observations, falls back to linear interpolation.
    """
    if len(x) < 2:
        out = np.full(len(xq), np.nan)
        if len(x) == 1:
            out[xq == x[0]] = y[0]
        return out
    if len(x) == 2:
        out = np.interp(xq, x, y)
    else:
        M = _natural_cubic_coeffs(x, y)
        idx = np.clip(np.searchsorted(x, xq, side="right") - 1, 0, len(x) - 2)
        h = x[idx + 1] - x[idx]
        t0 = x[idx + 1] - xq
        t1 = xq - x[idx]
        out = (
            M[idx] * t0**3 / (6 * h)
            + M[idx + 1] * t1**3 / (6 * h)
            + (y[idx] / h - M[idx] * h / 6) * t0
            + (y[idx + 1] / h - M[idx + 1] * h / 6) * t1
        )
    out = np.asarray(out, dtype=np.float64)
    out[(xq < x[0]) | (xq > x[-1])] = np.nan
    return out


def resample_spline(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "v",
    interval_sec: int = 60,
    ord_col: str | None = None,
) -> DataFrame:
    """Regular-grid resample with natural-cubic-spline interpolation.

    Whole-series grouped-map UDF (one Arrow batch per series, sorted by
    grid time for fixed accumulation order). ``ord_col`` makes the
    last-wins pick per grid cell deterministic under timestamp ties
    (same contract as resample_linear).
    """
    obs = observed_per_window(df, key, ts_col, value_col, interval_sec, ord_col)
    schema = f"{key} string, grid_ts timestamp, v_filled double, is_observed boolean"
    step = interval_sec * 1_000_000

    def fill(pdf: pd.DataFrame):
        # rows arrive sorted by grid_ts (keyed_map's partition-level
        # sort); columnar return skips the per-group DataFrame build (r6)
        x = pdf["grid_ts"].to_numpy("datetime64[us]").astype("int64")
        y = pdf["v"].to_numpy(dtype="float64")
        xq = np.arange(x[0], x[-1] + step, step)
        vq = spline_eval(x.astype("float64"), y, xq.astype("float64"))
        return {
            key: pdf[key].iloc[0],
            "grid_ts": xq.astype("datetime64[us]"),
            "v_filled": vq,
            "is_observed": np.isin(xq, x),
        }

    from insar_spark.operators.batched import keyed_map

    return keyed_map(obs, key, ["grid_ts"], fill, schema)
