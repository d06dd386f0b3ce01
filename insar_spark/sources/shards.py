"""Deterministic training-shard export.

A 100-TB training-data pipeline ends with the corpus re-sharded into
fixed-count, hash-balanced output shards so downstream trainers can stream
them independently. Shard assignment is the engine-independent 60-bit md5
hash (functions/shared_hash.py) mod ``n_shards`` — reproducible across
engines and runs, so the DuckDB oracle and a re-run both land every doc in
the same shard.

Scale shape: assignment is a map-only projection; the write repartitions on
the shard column (one exchange, n_shards-way, balanced by the hash) and
writes one directory per shard via partitionBy — no driver collect, no
skew (md5 is uniform), each shard independently readable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from insar_spark.functions.shared_hash import h60_col, sql_h60


def assign_shards(
    df: DataFrame, n_shards: int = 64, key_col: str = "doc_id"
) -> DataFrame:
    """Add a deterministic ``shard`` column: h60(key) mod n_shards."""
    return df.withColumn(
        "shard",
        F.pmod(h60_col(F.col(key_col).cast("string")), F.lit(n_shards)).cast(
            "int"
        ),
    )


def sql_shard(key_expr: str, n_shards: int = 64) -> str:
    """DuckDB twin of the shard expression in :func:`assign_shards`."""
    return f"({sql_h60(f'cast({key_expr} as varchar)')} % {n_shards})"


def write_shards(
    df: DataFrame, path: str, n_shards: int = 64, key_col: str = "doc_id"
) -> None:
    """Write ``df`` as ``path/shard=K/`` parquet, one balanced directory
    per shard. Re-running with the same input reproduces the same layout
    (hash assignment, no randomness)."""
    out = assign_shards(df, n_shards=n_shards, key_col=key_col)
    out.repartition(n_shards, "shard").write.partitionBy("shard").mode(
        "overwrite"
    ).parquet(path)
