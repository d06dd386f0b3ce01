"""Compressed-series column: pack each series into Gorilla blobs in-flight.

The per-series blob is the transcript analog of the reference's
full-depth-chunk locality rule (insar/timeseries.py:152-153 — "always load a
full depth slice at once"): one row per series, timestamps and values each a
BinaryType blob, so downstream per-series work (solve, smooth, ship to a
feature store) moves one cell instead of N rows. Encoding/decoding happens
only inside Arrow batches (vectorized UDFs — no per-row Python crossing).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

COMPRESSED_SCHEMA = (
    "conv_id string, n_points int, ts_blob binary, v_blob binary, "
    "ts_min timestamp, ts_max timestamp"
)


def compress_series(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "v",
    n_partitions: int | None = None,
) -> DataFrame:
    """(key, ts, v) rows -> one blob row per series.

    Scale shape: repartition by key + sort within partitions, then ONE
    mapInPandas pass encodes every series in a partition — thousands of
    small series share an Arrow batch instead of paying one grouped-UDF
    invocation each. A series that straddles an Arrow batch boundary is
    carried over inside the per-partition iterator (rows of a key are
    contiguous after the sort), so output is identical at any batch size.
    Rows are encoded in (ts) order — fixed order is required both for
    delta-of-delta efficiency and bit-exact replay.
    """
    from typing import Iterator

    from insar_spark.functions.gorilla import encode_timestamps, encode_values

    def _encode_chunk(chunk: pd.DataFrame) -> pd.DataFrame:
        # columnar accumulation (r6): one output frame per chunk instead
        # of one dict->row per series — same rows, same order
        cols: dict[str, list] = {k: [] for k in (
            "conv_id", "n_points", "ts_blob", "v_blob", "ts_min", "ts_max"
        )}
        for _, g in chunk.groupby(key, sort=False):
            ts = g[ts_col].to_numpy("datetime64[us]").astype("int64")
            vals = g[value_col].to_numpy(dtype="float64")
            cols["conv_id"].append(g[key].iloc[0])
            cols["n_points"].append(len(ts))
            cols["ts_blob"].append(encode_timestamps(ts))
            cols["v_blob"].append(encode_values(vals))
            cols["ts_min"].append(g[ts_col].iloc[0])
            cols["ts_max"].append(g[ts_col].iloc[-1])
        return pd.DataFrame(
            {
                "conv_id": cols["conv_id"],
                "n_points": np.asarray(cols["n_points"], dtype="int32"),
                "ts_blob": pd.Series(cols["ts_blob"], dtype=object),
                "v_blob": pd.Series(cols["v_blob"], dtype=object),
                "ts_min": cols["ts_min"],
                "ts_max": cols["ts_max"],
            }
        )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            last_key = pdf[key].iloc[-1]
            head = pdf[pdf[key] != last_key]
            carry = pdf[pdf[key] == last_key]
            if len(head):
                yield _encode_chunk(head)
        if carry is not None and len(carry):
            yield _encode_chunk(carry)

    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(key, ts_col, value_col)
        .repartition(parts, key)
        .sortWithinPartitions(key, ts_col)
        .mapInPandas(pack, schema=COMPRESSED_SCHEMA)
    )


def decompress_series(blobs: DataFrame) -> DataFrame:
    """Inverse of compress_series: blob rows -> (conv_id, ts, v) rows."""
    from insar_spark.functions.gorilla import decode_timestamps, decode_values

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar accumulation (r6): flat per-column parts, one frame
            # per batch — not one frame per blob row
            keys: list[str] = []
            ts_parts, v_parts = [], []
            for row in pdf.itertuples(index=False):
                ts = decode_timestamps(bytes(row.ts_blob))
                vals = decode_values(bytes(row.v_blob))
                keys.extend([row.conv_id] * len(ts))
                ts_parts.append(ts.astype("datetime64[us]"))
                v_parts.append(vals)
            if keys:
                yield pd.DataFrame(
                    {
                        "conv_id": keys,
                        "ts": np.concatenate(ts_parts),
                        "v": np.concatenate(v_parts),
                    }
                )

    return blobs.mapInPandas(unpack, schema="conv_id string, ts timestamp, v double")
