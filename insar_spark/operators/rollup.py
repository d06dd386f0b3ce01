"""Continuous aggregates: 1m/1h/1d retention-tier rollups + tier cascade.

The retention tiers are the engine's grouping-set analog of the reference's
stack averages (insar/prepare.py:258-348, insar/stackavg.py:34-105): a
NaN-aware sum/count per (series, window). Catalyst executes each rollup as a
partial (map-side) + final hash aggregate — the same two-phase pattern the
reference hand-codes with running accumulators.

Key scale property: the coarser tier is computed FROM the finer tier
(`cascade`), never from raw turns — at 10^12 turns the 1h rollup reads the
~60×-smaller 1m table, and the reaggregation is exact because every tier
carries decomposable stats (sums + counts, min/max, arg-min/arg-max by a
total order), never pre-divided averages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from insar_spark.operators.series import KEY, ord_key

# tier name -> date_trunc unit; ordered fine -> coarse
TIERS: dict[str, str] = {"1m": "minute", "1h": "hour", "1d": "day"}
_TIER_ORDER = list(TIERS)

# Decomposable per-window stats. avg/rates are derived columns computed at
# read time (finalize), so cascading stays exact.
_STATS = [
    ("n_turns", "sum"),  # count at tier 0, sum of counts after
    ("n_tool_calls", "sum"),
    ("sum_text_len", "sum"),
    ("min_text_len", "min"),
    ("max_text_len", "max"),
]


def rollup_turns(df: DataFrame, tier: str = "1m") -> DataFrame:
    """Tier-0 rollup: raw transcript turns -> per-(conv, window) aggregates.

    One shuffle on (conv_id, window_start); map-side partial agg handles
    mega-conversation skew for all stats here (every stat is decomposable, so
    hot keys are pre-reduced inside each input partition before the exchange).
    """
    unit = TIERS[tier]
    win = F.date_trunc(unit, F.col("ts")).alias("window_start")
    o = ord_key()
    return (
        df.select(
            KEY,
            win,
            F.length("text").cast("double").alias("text_len"),
            F.col("tool"),
            o,
        )
        .groupBy(KEY, "window_start")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count("tool").alias("n_tool_calls"),
            F.sum("text_len").alias("sum_text_len"),
            F.min("text_len").alias("min_text_len"),
            F.max("text_len").alias("max_text_len"),
            F.min_by("text_len", "ord").alias("first_text_len"),
            F.max_by("text_len", "ord").alias("last_text_len"),
            F.min("ord").alias("first_ord"),
            F.max("ord").alias("last_ord"),
        )
    )


def cascade(rolled: DataFrame, to_tier: str) -> DataFrame:
    """Re-aggregate a finer tier into ``to_tier`` (1m -> 1h -> 1d).

    Exact partial->final reaggregation: sums of sums, counts of counts,
    min/max of min/max, and first/last carried by the total-order key — the
    identity rollup_1h(turns) == cascade(rollup_1m(turns), '1h') is a test
    invariant (FIXTURES.md §4).
    """
    unit = TIERS[to_tier]
    win = F.date_trunc(unit, F.col("window_start")).alias("window_start")
    return (
        rolled.groupBy(KEY, win)
        .agg(
            F.sum("n_turns").alias("n_turns"),
            F.sum("n_tool_calls").alias("n_tool_calls"),
            F.sum("sum_text_len").alias("sum_text_len"),
            F.min("min_text_len").alias("min_text_len"),
            F.max("max_text_len").alias("max_text_len"),
            F.min_by("first_text_len", "first_ord").alias("first_text_len"),
            F.max_by("last_text_len", "last_ord").alias("last_text_len"),
            F.min("first_ord").alias("first_ord"),
            F.max("last_ord").alias("last_ord"),
        )
    )


def finalize(rolled: DataFrame, tier: str) -> DataFrame:
    """Derive the presentation metrics from the decomposable stats.

    turns/min and tool-call rate are the transcript analogs of the
    reference's stack-average layer (insar/stackavg.py:93-105): totals
    normalized by window span.
    """
    minutes = {"1m": 1.0, "1h": 60.0, "1d": 1440.0}[tier]
    return rolled.select(
        KEY,
        "window_start",
        "n_turns",
        "n_tool_calls",
        (F.col("n_turns") / F.lit(minutes)).alias("turns_per_min"),
        (F.col("n_tool_calls") / F.col("n_turns")).alias("tool_call_rate"),
        (F.col("sum_text_len") / F.col("n_turns")).alias("avg_text_len"),
        "min_text_len",
        "max_text_len",
        (F.col("last_text_len") - F.col("first_text_len")).alias(
            "text_len_delta"
        ),
    )


def rollup_all_tiers(df: DataFrame) -> dict[str, DataFrame]:
    """Full tier cascade from raw turns: {'1m': ..., '1h': ..., '1d': ...}.

    The 1m tier is the only pass over raw data; 1h and 1d re-aggregate it.
    Callers persisting tiers should write 1m first and build the others from
    the written table (see sources.catalog.write_tier) so the raw scan
    happens exactly once per ingest.
    """
    out: dict[str, DataFrame] = {}
    out["1m"] = rollup_turns(df, "1m")
    out["1h"] = cascade(out["1m"], "1h")
    out["1d"] = cascade(out["1h"], "1d")
    return out
