"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "points_per_sec": ...}

``--scaling`` mode (north-rule evidence): run the flagship tier-rollup job
at local[8] and local[32] on the SAME input and report throughput at both
plus scaling efficiency (throughput ratio / core ratio). Results land in
BENCH.md.

Timing methodology: each query is materialized through the `noop` sink
(full execution, nothing skipped, no driver collect); output row counts
come from a Dataset observation on the same pass, so counting adds no
second execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# transcripts synthesis size per benchmark run: ~1.2M turns at default —
# big enough that per-task overhead is amortized, small enough for CI
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "4000"))


def run_timed(df: DataFrame) -> tuple[float, int]:
    obs = Observation()
    t0 = time.perf_counter()
    df.observe(obs, F.count(F.lit(1)).alias("rows")).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.perf_counter() - t0
    return dt, int(obs.get["rows"])


def transcript_pipeline(spark, n_convs: int):
    """The flagship engine job: synth transcripts → all three tier rollups.

    Returns list of (name, DataFrame). The 1m tier is cached-free: each tier
    cascades off the previous plan, so Spark runs raw-scan once per action.
    """
    from insar_spark.operators.rollup import cascade, rollup_turns
    from insar_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=n_convs, seed=42)
    r1m = rollup_turns(t, "1m")
    r1h = cascade(r1m, "1h")
    r1d = cascade(r1h, "1d")
    return [("tiers_1m", r1m), ("tiers_1h", r1h), ("tiers_1d", r1d)]


def headline_queries(spark):
    import __spark_entry__ as e

    sbas_names = ["sbas_invert_adjacent"]

    def sbas(spark, sf_dir):
        from insar_spark.operators import series as S
        from insar_spark.operators.sbas import invert_pairs

        t = e.events_series(spark, sf_dir)
        pairs = S.adjacent_pairs(t, "v", k=1)
        return invert_pairs(pairs, prefilter=False)

    qs = {
        n: e.queries()[n]
        for n in [
            "flagship_rollup_1m",
            "rollup_cascade_1h",
            "rollup_cascade_1d",
            "w1_turn_deltas",
            "w2_cumsum_reconstruct",
            "a12_rolling_mean_1h",
            "a4_temporal_coherence",
            "dedup_exact",
            "sim_cosine_vs_query",
        ]
    }
    qs["sbas_invert_adjacent"] = sbas
    return qs


def main() -> None:
    from insar_spark.session import get_spark

    if "--scaling" in sys.argv:
        return scaling_run()

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    times: dict[str, float] = {}
    total_points = 0
    for name, fn in headline_queries(spark).items():
        dt, rows = run_timed(fn(spark, SF_DIR))
        times[name] = round(dt, 3)
        total_points += rows
    for name, df in transcript_pipeline(spark, N_CONVS):
        dt, rows = run_timed(df)
        times[name] = round(dt, 3)
        total_points += rows
    total = sum(times.values())
    print(
        json.dumps(
            {
                "metric": "headline query wall time (tier rollups, window ops, "
                "SBAS solve, dedup, ANN) + transcript 3-tier pipeline",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "points_per_sec": round(total_points / total, 1),
                "output_points": total_points,
                "cpus": int(CPUS),
            }
        )
    )
    spark.stop()


def scaling_run() -> None:
    """Same flagship job at local[8] vs local[32]: the in-sandbox stand-in
    for the N→4N executor scaling-efficiency criterion (BASELINE.json)."""
    from insar_spark.session import get_spark

    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "8000"))
    results = {}
    for cores in (8, 32):
        spark = get_spark(
            f"bench_scale_{cores}", master=f"local[{cores}]", shuffle_partitions=cores
        )
        # warmup: JVM + codegen
        spark.range(1000).select(F.sum("id")).collect()
        t0 = time.perf_counter()
        rows = 0
        for _, df in transcript_pipeline(spark, n_convs):
            _, r = run_timed(df)
            rows += r
        dt = time.perf_counter() - t0
        results[cores] = {"sec": round(dt, 3), "points_per_sec": round(rows / dt, 1), "rows": rows}
        spark.stop()
    thr8 = results[8]["points_per_sec"]
    thr32 = results[32]["points_per_sec"]
    eff = (thr32 / thr8) / 4.0
    out = {
        "metric": "tier-rollup throughput scaling local[8] -> local[32]",
        "n_convs": n_convs,
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency_n_to_4n": round(eff, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
