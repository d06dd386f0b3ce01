"""Per-series smoothing & model fitting (W5, A10).

* ``lowess_smooth`` — robust local regression per series via grouped-map
  Arrow UDF (insar/timeseries.py:928-1009 semantics: min weighted span,
  bisquare robustness iterations, optional day-1 subtraction).
* ``polyfit_series`` — per-series polynomial model fit
  (insar/timeseries.py:716-917). Degree 1 has a closed form expressible as
  pure SQL aggregates (``regr_slope``/``regr_intercept`` — DuckDB-oracle-
  able); higher degrees run the Vandermonde least squares in the UDF
  (insar/ts_utils.py:93-103 ``A_polynomial``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from insar_spark.functions.lowess_kernel import lowess_xy
from insar_spark.operators.series import KEY

_SEC_PER_DAY = 86_400.0


def _day_nums(ts: pd.Series) -> np.ndarray:
    return ts.to_numpy("datetime64[us]").astype("int64") / 1e6 / _SEC_PER_DAY


def lowess_smooth(
    df: DataFrame,
    value_col: str = "v",
    min_span_days: float = 2 * 365.25,
    it: int = 2,
    subtract_first: bool = False,
    tie_col: str | None = None,
) -> DataFrame:
    """Lowess-smoothed series; one Arrow batch per conv_id.

    ``subtract_first`` reproduces the reference's day-1 layer subtraction
    after smoothing (insar/timeseries.py:966-1009).

    ``tie_col`` names an alternative timestamp tie-breaker (e.g. the raw
    ``event_id`` that ``turn_idx`` is a row_number over): passing it lets
    a caller skip materializing turn_idx entirely, which removes the
    row_number Window and its second Sort from the plan — keyed_map's one
    exchange + one sort feeds the kernel directly (r6: 2 Sort + 1 Window
    -> 1 Sort at identical output, since the kernel's stable ts sort
    preserves the delivered tie order and equal-x rows are summed in the
    same sequence either way).
    """
    schema = f"{KEY} string, ts timestamp, {value_col} double, smooth double"
    tie = tie_col if tie_col is not None else (
        "turn_idx" if "turn_idx" in df.columns else None
    )

    def smooth(pdf: pd.DataFrame):
        # rows arrive sorted by keyed_map's partition-level (ts, tie)
        # sort — no per-group re-sort needed (r6, guide §4); the columnar
        # return skips the per-group DataFrame build
        x = _day_nums(pdf["ts"])
        y = pdf[value_col].to_numpy(dtype="float64")
        sm = lowess_xy(x, y, min_x_weighted=min_span_days, it=it)
        if subtract_first and len(sm):
            sm = sm - sm[0]
        return {
            KEY: pdf[KEY].to_numpy(),
            "ts": pdf["ts"].to_numpy(),
            value_col: y,
            "smooth": sm,
        }

    from insar_spark.operators.batched import keyed_map

    cols = [KEY, "ts", value_col] + ([tie] if tie else [])
    sort = ["ts", tie] if tie else ["ts"]
    return keyed_map(df.select(*cols), KEY, sort, smooth, schema)


def gaussian_time_filter(
    df: DataFrame,
    value_col: str = "v",
    sigma_sec: float = 3600.0,
    cutoff: float = 3.0,
) -> DataFrame:
    """W6: gaussian-weighted moving average over the time axis — the
    transcript analog of the reference's temporal gaussian filter
    (insar/solve_sbas.py:99-106 ``filter_aps``, time-axis part), adapted to
    irregular sampling: smooth_i = sum_j w_ij v_j / sum_j w_ij with
    w_ij = exp(-(dt/sigma)^2 / 2) over neighbors within ``cutoff``*sigma.

    Pure JVM: a RANGE window collects the (t, v) neighbor structs once per
    row, then a single aggregate expression folds the weighted sums — no
    UDF, no self-join shuffle (the window reuses the per-series sort).
    """
    from pyspark.sql import Column, Window

    from insar_spark.functions.shared_hash import let_col

    half_us = int(cutoff * sigma_sec * 1e6)

    def smooth(ps: Column, us_i: Column) -> Column:
        two_s2 = F.lit(2.0 * sigma_sec * sigma_sec)

        def merge(acc: Column, p: Column) -> Column:
            dt = (p["us"] - us_i) / F.lit(1e6)
            wgt = F.exp(-(dt * dt) / two_s2)
            return F.struct(
                (acc["n"] + wgt * p["v"]).alias("n"),
                (acc["d"] + wgt).alias("d"),
            )

        return F.aggregate(
            ps,
            F.struct(F.lit(0.0).alias("n"), F.lit(0.0).alias("d")),
            merge,
            lambda acc: acc["n"] / acc["d"],
        )

    return df.withColumn("_us", F.unix_micros("ts")).withColumn(
        "smooth",
        let_col(
            F.collect_list(
                F.struct(F.col("_us").alias("us"), F.col(value_col).alias("v"))
            ).over(
                Window.partitionBy(KEY)
                .orderBy("_us")
                .rangeBetween(-half_us, half_us)
            ),
            lambda ps: smooth(ps, F.col("_us")),
        ),
    ).drop("_us")


def polyfit_deg1(df: DataFrame, value_col: str = "v") -> DataFrame:
    """Closed-form linear fit per series: slope per day + intercept.

    Pure built-in aggregates (JVM, no UDF): the velocity-model tier of the
    engine, x = epoch-days. Equivalent to np.polyfit(date_nums, v, 1).
    """
    x = F.unix_micros("ts") / F.lit(1e6 * _SEC_PER_DAY)
    return df.groupBy(KEY).agg(
        F.regr_slope(F.col(value_col), x).alias("slope_per_day"),
        F.regr_intercept(F.col(value_col), x).alias("intercept"),
        F.regr_r2(F.col(value_col), x).alias("r2"),
        F.count(value_col).alias("n"),
    )


def detrend_linear(df: DataFrame, value_col: str = "v") -> DataFrame:
    """Per-series linear detrend — the transcript analog of deramp
    (insar/prepare.py deramp_and_shift_unws: remove the fitted ramp, keep
    the residual signal). Pure JVM: regr_slope/intercept per series, then
    a broadcastable join back and a subtract; no UDF, two exchanges max
    (one if the input is already partitioned by conv_id)."""
    x = F.unix_micros("ts") / F.lit(1e6 * _SEC_PER_DAY)
    fit = df.groupBy(KEY).agg(
        F.regr_slope(F.col(value_col), x).alias("_b"),
        F.regr_intercept(F.col(value_col), x).alias("_a"),
    )
    return (
        df.join(F.broadcast(fit), KEY)
        .withColumn(
            f"{value_col}_detrended",
            F.col(value_col) - (F.col("_a") + F.col("_b") * x),
        )
        .drop("_a", "_b")
    )


def polyfit_series(
    df: DataFrame, value_col: str = "v", degree: int = 2
) -> DataFrame:
    """Vandermonde least-squares polynomial fit per series (grouped UDF).

    Returns one row per series with coefficient array (ascending powers of
    epoch-days, like np.polynomial.polyvander) and the residual stddev used
    by the reference's weighted refit (insar/timeseries.py:857-878).
    """
    schema = f"{KEY} string, coeffs array<double>, resid_std double, n int"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows arrive sorted by ts (keyed_map contract)
        x = _day_nums(pdf["ts"])
        y = pdf[value_col].to_numpy(dtype="float64")
        mask = ~np.isnan(y)
        x, y = x[mask], y[mask]
        if len(x) <= degree:
            coeffs = [float("nan")] * (degree + 1)
            rs = float("nan")
        else:
            x0 = x - x[0]  # condition the Vandermonde
            V = np.vander(x0, degree + 1, increasing=True)
            coef, *_ = np.linalg.lstsq(V, y, rcond=None)
            resid = y - V @ coef
            rs = float(resid.std())
            coeffs = [float(c) for c in coef]
        return pd.DataFrame(
            {
                KEY: [pdf[KEY].iloc[0]],
                "coeffs": [coeffs],
                "resid_std": [rs],
                "n": [int(len(x))],
            }
        )

    from insar_spark.operators.batched import keyed_map

    return keyed_map(df.select(KEY, "ts", value_col), KEY, ["ts"], fit, schema)
