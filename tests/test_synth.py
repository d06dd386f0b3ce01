"""Determinism of the synthetic transcripts generator."""

from __future__ import annotations

import pandas as pd

from insar_spark.synth import synth_transcripts, synth_transcripts_pandas


def test_spark_matches_pandas_generator(spark):
    sdf = (
        synth_transcripts(spark, n_convs=10, seed=42, mega_every=0)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = (
        synth_transcripts_pandas(n_convs=10, seed=42, mega_every=0)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sdf, pdf, check_dtype=False)


def test_partitioning_invariance(spark):
    """Generated rows are a pure function of (conv_id, seed) — identical
    content at any parallelism (the property that lets bench scale runs
    compare local[8] vs local[32] on the same logical input)."""
    a = (
        synth_transcripts(spark, n_convs=9, seed=1, mega_every=0)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        synth_transcripts(spark, n_convs=9, seed=1, mega_every=0, shuffle=True)
        .coalesce(1)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_turn_idx_strictly_increasing_and_ts_monotone(spark):
    pdf = synth_transcripts_pandas(n_convs=20, seed=42, mega_every=0)
    for _, g in pdf.groupby("conv_id"):
        assert (g["turn_idx"].diff().dropna() == 1).all()
        assert g["ts"].is_monotonic_increasing


def test_schema(spark):
    df = synth_transcripts(spark, n_convs=2, seed=42, mega_every=0)
    assert [f.name for f in df.schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["turn_idx"] == "int"
    assert kinds["ts"] == "timestamp"
