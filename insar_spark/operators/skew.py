"""Explicit skew handling for mega-conversations.

A single conv_id with 10^5+ turns makes (a) its rollup cell and (b) its
series window a straggler task. Three tools, composable:

* ``salted_two_phase_rollup`` — rollup where even a single (conv, window)
  cell is hot: pre-aggregate on (conv, window, salt) then finalize. This is
  the explicit form of Catalyst's partial agg, needed when the *reduce* key
  itself is hot (partial agg alone still funnels one cell to one reducer;
  salting splits that cell across ``n_salt`` reducers first).
* ``chunked_turn_deltas`` — W1 deltas for series too big for one window
  task: chunk by turn_idx range (salt = turn_idx / chunk), lag within each
  chunk, and repair the chunk-boundary deltas with a tiny self-join of
  boundary rows (the reference's tile-overlap concept, insar/tile.py:117-121).
  Bit-identical to the unchunked operator (tested).
* ``route_by_size`` — measure per-key cardinality (one cheap count agg),
  route mega keys through the chunked path and the long tail through the
  plain path, union the results. The detect-and-split pattern AQE applies
  to joins, applied to windows where AQE can't help.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from insar_spark.operators.series import KEY, turn_deltas


def salted_two_phase_rollup(
    df: DataFrame,
    tier_unit: str = "minute",
    n_salt: int = 16,
    value_col: str | None = None,
    tool_col: str = "tool",
) -> DataFrame:
    """Rollup with an explicit salt pre-phase on the hot reduce key.

    ``value_col``/``tool_col`` generalize beyond the transcript shape
    (default: text length / tool) so the same salted plan runs over any
    per-turn metric column.
    """
    win = F.date_trunc(tier_unit, F.col("ts")).alias("window_start")
    salt = F.pmod(F.col("turn_idx"), F.lit(n_salt)).alias("salt")
    val = (
        F.length("text").cast("double")
        if value_col is None
        else F.col(value_col).cast("double")
    )
    partial = (
        df.select(
            KEY,
            win,
            salt,
            val.alias("text_len"),
            F.col(tool_col).alias("tool"),
        )
        .groupBy(KEY, "window_start", "salt")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count("tool").alias("n_tool_calls"),
            F.sum("text_len").alias("sum_text_len"),
            F.min("text_len").alias("min_text_len"),
            F.max("text_len").alias("max_text_len"),
        )
    )
    return partial.groupBy(KEY, "window_start").agg(
        F.sum("n_turns").alias("n_turns"),
        F.sum("n_tool_calls").alias("n_tool_calls"),
        F.sum("sum_text_len").alias("sum_text_len"),
        F.min("min_text_len").alias("min_text_len"),
        F.max("max_text_len").alias("max_text_len"),
    )


def chunked_turn_deltas(
    df: DataFrame, value_col: str = "text_len", chunk_size: int = 10_000
) -> DataFrame:
    """W1 deltas with bounded task size for mega-series.

    Requires ``turn_idx`` to be the CONTIGUOUS series order (0..n-1, the
    transcripts invariant) — chunk ids are then gap-free, so every chunk's
    head has a predecessor chunk tail to hand off from. The chunk id joins
    the partition key, so one task never holds more than ``chunk_size``
    rows of a series; boundary rows (the true first row of each chunk,
    identified by row_number — NOT by a NULL lag, which a legitimately
    NULL-valued predecessor row would also produce) get their delta from
    the previous chunk's last row via an equi-join on (conv_id, chunk-1) —
    a tiny shuffle (2 rows per chunk). Bit-identical to the unchunked
    operator, including around NULL values (tested).
    """
    chunked = df.withColumn("_chunk", F.floor(F.col("turn_idx") / chunk_size))
    w = Window.partitionBy(KEY, "_chunk").orderBy("ts", "turn_idx")
    intra = (
        chunked.withColumn("_rn", F.row_number().over(w))
        .withColumn("_pv", F.lag(value_col).over(w))
        .withColumn("_pt", F.lag("ts").over(w))
    )

    # last row of each chunk -> feeds the next chunk's head
    tail = (
        chunked.groupBy(KEY, "_chunk")
        .agg(
            F.max_by(F.col(value_col), "turn_idx").alias("_tail_v"),
            F.max_by(F.col("ts"), "turn_idx").alias("_tail_ts"),
        )
        .withColumn("_chunk", F.col("_chunk") + 1)
    )
    head = F.col("_rn") == 1
    repaired = (
        intra.join(tail, [KEY, "_chunk"], "left")
        .withColumn("_pv", F.when(head, F.col("_tail_v")).otherwise(F.col("_pv")))
        .withColumn("_pt", F.when(head, F.col("_tail_ts")).otherwise(F.col("_pt")))
    )
    return (
        repaired.withColumn("delta_v", F.col(value_col) - F.col("_pv"))
        .withColumn(
            "dt_sec",
            (F.unix_micros("ts") - F.unix_micros("_pt")) / F.lit(1_000_000.0),
        )
        .drop("_rn", "_pv", "_pt", "_chunk", "_tail_v", "_tail_ts")
    )


def key_sizes(df: DataFrame) -> DataFrame:
    return df.groupBy(KEY).agg(F.count(F.lit(1)).alias("n_rows"))


def route_by_size(
    df: DataFrame,
    value_col: str = "text_len",
    mega_threshold: int = 50_000,
    chunk_size: int = 10_000,
) -> DataFrame:
    """Deltas with mega-series routed through the chunked path.

    The mega-key list is tiny (broadcast); the long tail takes the plain
    single-window path.
    """
    sizes = key_sizes(df)
    mega = sizes.filter(F.col("n_rows") > mega_threshold).select(KEY)
    small = df.join(F.broadcast(mega), KEY, "left_anti")
    big = df.join(F.broadcast(mega), KEY, "left_semi")
    out_small = turn_deltas(small, value_col)
    out_big = chunked_turn_deltas(big, value_col, chunk_size)
    return out_small.unionByName(out_big)
