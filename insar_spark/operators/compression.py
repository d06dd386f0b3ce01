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
) -> DataFrame:
    """(key, ts, v) rows -> one blob row per series.

    Rows are sorted by (ts) inside the group before encoding — fixed order
    is required both for delta-of-delta efficiency and bit-exact replay.
    """
    from insar_spark.functions.gorilla import encode_timestamps, encode_values

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        ts = pdf[ts_col].to_numpy("datetime64[us]").astype("int64")
        vals = pdf[value_col].to_numpy(dtype="float64")
        return pd.DataFrame(
            {
                "conv_id": [pdf[key].iloc[0]],
                "n_points": [len(ts)],
                "ts_blob": [encode_timestamps(ts)],
                "v_blob": [encode_values(vals)],
                "ts_min": [pdf[ts_col].iloc[0]],
                "ts_max": [pdf[ts_col].iloc[-1]],
            }
        )

    return (
        df.select(key, ts_col, value_col)
        .groupBy(key)
        .applyInPandas(pack, schema=COMPRESSED_SCHEMA)
    )


def decompress_series(blobs: DataFrame) -> DataFrame:
    """Inverse of compress_series: blob rows -> (conv_id, ts, v) rows."""
    from insar_spark.functions.gorilla import decode_timestamps, decode_values

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                ts = decode_timestamps(bytes(row.ts_blob))
                vals = decode_values(bytes(row.v_blob))
                frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": row.conv_id,
                            "ts": ts.astype("datetime64[us]"),
                            "v": vals,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return blobs.mapInPandas(unpack, schema="conv_id string, ts timestamp, v double")
