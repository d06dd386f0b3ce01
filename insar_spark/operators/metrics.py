"""The north-star per-conversation event series, by name.

BASELINE.json: "builds strictly turn-ordered event series (turns/min,
tool-call rate, text-length deltas)". These are thin, named compositions of
the core operators — one long-format DataFrame per metric family, and a
combined long table (conv_id, metric, ts, value) for downstream rollup/
compression/solve stages that operate per (conv_id, metric) series, the
(pixel, stack) analog of SURVEY.md §1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from insar_spark.operators.rollup import finalize, rollup_turns
from insar_spark.operators.series import turn_deltas, with_text_len


def turns_per_min(transcripts: DataFrame) -> DataFrame:
    """(conv_id, ts=window_start, value): per-minute turn rate."""
    r = finalize(rollup_turns(transcripts, "1m"), "1m")
    return r.select(
        "conv_id",
        F.col("window_start").alias("ts"),
        F.col("turns_per_min").alias("value"),
    )


def tool_call_rate(transcripts: DataFrame) -> DataFrame:
    """(conv_id, ts=window_start, value): tool calls / turns per minute."""
    r = finalize(rollup_turns(transcripts, "1m"), "1m")
    return r.select(
        "conv_id",
        F.col("window_start").alias("ts"),
        F.col("tool_call_rate").alias("value"),
    )


def text_len_deltas(transcripts: DataFrame) -> DataFrame:
    """(conv_id, ts, value): adjacent-turn text-length delta (turn-level)."""
    d = turn_deltas(with_text_len(transcripts), "text_len")
    return d.select("conv_id", "ts", F.col("delta_v").alias("value")).filter(
        F.col("value").isNotNull()
    )


def all_metrics_long(transcripts: DataFrame) -> DataFrame:
    """Union of the three series in long format (conv_id, metric, ts, value).

    One pass over raw turns for the two rollup-derived metrics (shared
    subplan), one window pass for the delta metric.
    """
    r = finalize(rollup_turns(transcripts, "1m"), "1m")
    rates = r.select(
        "conv_id",
        F.col("window_start").alias("ts"),
        F.expr(
            "stack(2, 'turns_per_min', turns_per_min, "
            "'tool_call_rate', tool_call_rate) AS (metric, value)"
        ),
    ).select("conv_id", "metric", "ts", "value")
    deltas = text_len_deltas(transcripts).select(
        "conv_id", F.lit("text_len_delta").alias("metric"), "ts", "value"
    )
    return rates.unionByName(deltas)
