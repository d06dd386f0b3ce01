"""As-of join: align each left row with the latest right row at-or-before it.

The reference's GPS↔InSAR alignment (insar/scripts/create_east_up.py:287-302)
reindexes GPS to a daily calendar, forward-fills, then inner-joins on date —
i.e., a backward as-of join. Spark has no native ASOF; the scalable
re-expression is the union-and-ffill trick:

    union(left tagged L, right tagged R)
      -> window per key ordered by (ts, R-before-L on ties)
      -> last(right values, ignorenulls)  == the as-of match
      -> keep L rows

One shuffle on the key, no range-join explosion, no per-group pandas
(merge_asof) in the hot path. Tolerance is a post-filter on the matched
timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str = "conv_id",
    ts: str = "ts",
    right_value_cols: tuple[str, ...] = ("v",),
    tolerance_sec: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: values of the latest right row with
    right.ts <= left.ts (per key). Unmatched lefts keep NULLs; with
    ``tolerance_sec``, matches older than the tolerance are nulled too.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        key,
        ts,
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    ).withColumn("_side", F.lit(0))

    rv = [f"{c}{suffix}" for c in right_value_cols]
    for c in lcols:
        if c not in (key, ts) and c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in rv:
        l = l.withColumn(c, F.lit(None))
    u = l.unionByName(r.select(l.columns))

    # order: time, then right rows before left rows at equal ts (<=)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        *[c for c in u.columns if c not in rv],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in rv],
        F.last(F.when(F.col("_side") == 0, F.unix_micros(ts)), ignorenulls=True)
        .over(w)
        .alias("_rt"),
    ).filter(F.col("_side") == 1)

    if tolerance_sec is not None:
        stale = (
            F.unix_micros(ts) - F.col("_rt")
        ) > tolerance_sec * 1_000_000
        for c in rv:
            matched = matched.withColumn(
                c, F.when(stale | F.col("_rt").isNull(), None).otherwise(F.col(c))
            )
    return matched.drop("_side", "_rt")
