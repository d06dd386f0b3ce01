"""Property tests: Gorilla XOR + delta-of-delta round-trips bit-exactly."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from insar_spark.functions.gorilla import (
    compression_ratio,
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)


@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_values_roundtrip_any_float(vals):
    arr = np.array(vals, dtype=np.float64)
    out = decode_values(encode_values(arr))
    # bit-exact: compare raw uint64 views (NaN payloads preserved)
    np.testing.assert_array_equal(arr.view(np.uint64), out.view(np.uint64))


@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_timestamps_roundtrip_any_int64(ts):
    arr = np.array(ts, dtype=np.int64)
    out = decode_timestamps(encode_timestamps(arr))
    np.testing.assert_array_equal(arr, out)


def test_regular_cadence_compresses_hard():
    # perfectly regular 1s cadence + constant value: the Gorilla sweet spot
    ts = np.arange(0, 10_000, dtype=np.int64) * 1_000_000
    vals = np.full(10_000, 42.5)
    ratio = compression_ratio(ts, vals)
    assert ratio > 50  # ~1 bit/point vs 128 bits/point raw


def test_counter_like_values_compress():
    # integer-valued counters with runs of repeats: the realistic rollup
    # shape (n_turns per window); random-mantissa walks do NOT compress
    # under XOR and that's expected
    rng = np.random.default_rng(0)
    ts = np.cumsum(rng.integers(1, 5, 5000)).astype(np.int64) * 1_000_000
    vals = np.repeat(rng.integers(0, 30, 1000), 5).astype(np.float64)
    assert compression_ratio(ts, vals) > 2.0


def test_spark_compress_decompress_roundtrip(spark, transcripts):
    from pyspark.sql import functions as F

    from insar_spark.operators.compression import compress_series, decompress_series

    df = transcripts.select(
        "conv_id", "ts", F.length("text").cast("double").alias("v")
    )
    blobs = compress_series(df)
    back = decompress_series(blobs)
    a = df.orderBy("conv_id", "ts").toPandas()
    b = back.orderBy("conv_id", "ts").toPandas()
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["v"].to_numpy(), b["v"].to_numpy())
    np.testing.assert_array_equal(
        a["ts"].to_numpy("datetime64[us]"), b["ts"].to_numpy("datetime64[us]")
    )

    # blob payload is much smaller than 16 bytes/point on this data
    sizes = blobs.select(
        F.sum(F.length("ts_blob") + F.length("v_blob")).alias("enc"),
        F.sum(F.col("n_points") * 16).alias("raw"),
    ).first()
    assert sizes["enc"] < sizes["raw"]


def test_compress_series_batch_boundary_carry(spark, transcripts):
    """A series straddling Arrow batch boundaries encodes identically:
    the per-partition iterator carries the split series across batches."""
    from pyspark.sql import functions as F

    from insar_spark.operators.compression import compress_series

    df = transcripts.select(
        "conv_id", "ts", F.length("text").cast("double").alias("v")
    )
    normal = compress_series(df).toPandas().set_index("conv_id").sort_index()
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
        tiny = compress_series(df).toPandas().set_index("conv_id").sort_index()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(normal) == len(tiny)
    for cid in normal.index:
        assert normal.loc[cid, "n_points"] == tiny.loc[cid, "n_points"], cid
        assert bytes(normal.loc[cid, "ts_blob"]) == bytes(tiny.loc[cid, "ts_blob"])
        assert bytes(normal.loc[cid, "v_blob"]) == bytes(tiny.loc[cid, "v_blob"])


# ---------------------------------------------------------------- r6 parity
# The r6 vectorized encoders / buffered decoders must be BYTE-identical to
# the original bit-at-a-time implementations (kept as _*_py): the blob is a
# cross-stage contract (compress_series -> invert_blobs/decompress_series).

from insar_spark.functions.gorilla import (  # noqa: E402
    _decode_timestamps_py,
    _decode_values_py,
    _encode_timestamps_py,
    _encode_values_py,
)


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=0,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_timestamp_encoder_parity(ts):
    arr = np.array(ts, dtype=np.int64)
    enc = encode_timestamps(arr)
    assert enc == _encode_timestamps_py(arr)
    np.testing.assert_array_equal(
        decode_timestamps(enc), _decode_timestamps_py(enc)
    )


@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_value_encoder_parity(vals):
    arr = np.array(vals, dtype=np.float64)
    enc = encode_values(arr)
    assert enc == _encode_values_py(arr)
    np.testing.assert_array_equal(
        decode_values(enc).view(np.uint64),
        _decode_values_py(enc).view(np.uint64),
    )


def test_long_blob_fast_path_parity():
    # > 512-byte blobs take the buffered word-reader path; the vectorized
    # ts encoder falls back to the exact-int path past the 2^61 bound
    rng = np.random.default_rng(3)
    ts = np.cumsum(rng.integers(1, 10**9, 5000)).astype(np.int64)
    vs = np.round(rng.gamma(2.0, 60.0, 5000), 2)
    tb, vb = encode_timestamps(ts), encode_values(vs)
    assert tb == _encode_timestamps_py(ts)
    assert vb == _encode_values_py(vs)
    np.testing.assert_array_equal(decode_timestamps(tb), ts)
    np.testing.assert_array_equal(decode_values(vb), vs)
    big = rng.integers(-(2**62), 2**62, 1000).astype(np.int64)
    assert encode_timestamps(big) == _encode_timestamps_py(big)
    np.testing.assert_array_equal(
        decode_timestamps(encode_timestamps(big)), big
    )
