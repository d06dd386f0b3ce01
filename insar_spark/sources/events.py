"""Adapter: the driver's `events` table -> the engine's series shape.

The engine's native input is the transcripts table (conv_id, turn_idx, role,
text, tool, ts). The sandbox's oracle-checkable tables are TPC-H-ish; the
`events` stream table (event_id, ts, user_id, event_type, value, props) has
the same *shape* as a transcript stream, so the DuckDB-verified operator
queries run over a deterministic transcript-view of it:

    conv_id  := cast(user_id as string)       (series key)
    turn_idx := row_number() over (user, ts, event_id) - 1   (stable order)
    v        := value                         (metric, like text_len)
    tool     := event_type                    (categorical, like tool)

Both the Spark and the DuckDB derivation use the identical window ordering
(ts, event_id) so turn_idx is bit-identical on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# DuckDB CTE prefix mirrored by every oracle query (keep in sync with
# events_series below).
SERIES_CTE = """
WITH t AS (
  SELECT cast(user_id AS varchar)                                    AS conv_id,
         cast(row_number() OVER w - 1 AS int)                        AS turn_idx,
         ts,
         value                                                       AS v,
         event_type,
         epoch_ms(ts) * 1048576
           + (row_number() OVER w - 1)                               AS ord
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
"""


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread_scan(df: DataFrame, key: str = "conv_id") -> DataFrame:
    """Hash-repartition a narrow-split scan across the cluster BEFORE
    expression-heavy map work (r6, guide §2.6/§6).

    Parquet cannot split below a row group, and a small single-row-group
    file arrives as ONE input split — so every map-side expression
    (md5 chains, partial aggregates) of an aggregation-shaped query runs
    single-threaded until the first exchange. Spreading by a
    high-cardinality column moves only the raw bytes once and unlocks
    every core for the projection (measured: the HLL tier build dropped
    2.0 s -> 0.9 s at sf1.0). Hash (not round-robin) partitioning avoids
    the local sort round-robin repartition pays for retry determinism,
    and hash(key) co-locates series, so a downstream groupBy leading
    with ``key`` reuses the exchange. At 100-TB scale the source already
    has >= parallelism splits and this is a no-op. Worth it only when
    per-row map work dominates — cheap projections (e.g. the lb bucket
    math) lose more to the extra shuffle than they gain (measured
    0.78 s -> 1.11 s), so callers opt in per query."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want, key)
    return df


def events_series(
    spark: SparkSession,
    sf_dir: str,
    ts_min: str | None = None,
    ts_max: str | None = None,
) -> DataFrame:
    """Transcript-shaped series view over the events table (Spark side).

    ``ts_min``/``ts_max`` (F1 date-range filter) are applied to the raw scan
    so Catalyst pushes them into the parquet reader and turn_idx numbers the
    *filtered* network.
    """
    # UTC session TZ: required so date_trunc / epoch math agrees with the
    # (TZ-naive) DuckDB oracle regardless of the caller's session default.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # parquet ts is TIMESTAMP_NTZ; cast to TIMESTAMP under the UTC session TZ
    # (wall-clock preserving) so unix_micros/date_trunc work uniformly
    ev = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    if ts_min is not None:
        ev = ev.filter(F.col("ts") >= ts_min)
    if ts_max is not None:
        ev = ev.filter(F.col("ts") < ts_max)
    # Select conv_id FIRST and partition the row_number window by it: the
    # one raw-size exchange this induces is then reused by every downstream
    # per-series window/groupBy on conv_id (HashPartitioning(conv_id)
    # satisfies ClusteredDistribution(conv_id, ...)) — without this, each
    # operator pays a second raw-size shuffle on the casted key.
    ev = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        "ts",
        F.col("value").alias("v"),
        "event_type",
        "event_id",
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w) - F.lit(1)
    return ev.select(
        "conv_id",
        rn.cast("int").alias("turn_idx"),
        "ts",
        "v",
        "event_type",
        (
            F.floor(F.unix_micros("ts") / F.lit(1000)) * F.lit(1 << 20)
            + rn.cast("bigint")
        ).alias("ord"),
    )
