"""Bucketed layout: zero-shuffle cascade + cross-session re-attach."""

from __future__ import annotations

import glob

import pandas as pd
from pyspark.sql import functions as F

from insar_spark.operators.rollup import cascade, rollup_turns
from insar_spark.sources.bucketed import attach_bucketed, write_bucketed
from insar_spark.synth import synth_transcripts


def _exchanges(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [l for l in plan.splitlines() if "Exchange" in l]


def test_bucketed_cascade_is_shuffle_free(spark, tmp_path):
    wh = spark.conf.get("spark.sql.warehouse.dir")
    t = synth_transcripts(spark, n_convs=50, seed=42, mega_every=0)
    write_bucketed(t, "tb_test", n_buckets=8)

    # aligned write: one file per bucket
    files = glob.glob(f"{wh.removeprefix('file:')}/tb_test/*.parquet")
    assert len(files) == 8

    turns = spark.table("tb_test")
    r1m = rollup_turns(turns, "1m")
    r1d = cascade(cascade(r1m, "1h"), "1d")
    assert _exchanges(r1d) == []  # the whole cascade: zero shuffles

    # results identical to the plain path
    direct = (
        rollup_turns(t, "1d")
        .toPandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    bucketed = (
        r1d.toPandas().sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(direct, bucketed, check_exact=True)
    spark.sql("DROP TABLE tb_test")


def test_attach_bucketed_registers_once(spark, tmp_path):
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    t = synth_transcripts(spark, n_convs=10, seed=1, mega_every=0)
    write_bucketed(t, "tb_attach_src", n_buckets=4)
    # simulate a fresh session's empty catalog: relocate the data files and
    # drop the managed table (drop deletes the original location)
    ext = str(tmp_path / "tb_attach")
    shutil.copytree(f"{wh}/tb_attach_src", ext)
    spark.sql("DROP TABLE tb_attach_src")

    df = attach_bucketed(spark, "tb_attach", ext, 4)
    assert df.count() == t.count()
    # second attach is a no-op
    df2 = attach_bucketed(spark, "tb_attach", ext, 4)
    assert df2.count() == df.count()
    # bucketing metadata restored: per-series agg needs no exchange
    agg = df.groupBy("conv_id").agg(F.count("*").alias("n"))
    assert _exchanges(agg) == []
    spark.sql("DROP TABLE tb_attach")
