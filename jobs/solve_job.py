"""Production SBAS-solve job (spark-submit entry).

The run_inversion analog (/root/reference/insar/timeseries.py:60-323):
read transcripts → per-series metric → pair network (adjacent, bandwidth-k,
or capped all-pairs) → filters (date range, max baseline) → distributed
solve → write the reconstructed series + quality tier to the store.

Usage:
    spark-submit --py-files insar_spark.zip jobs/solve_job.py \
        --input synth:500 --out /tmp/solution \
        [--network adjacent|allpairs] [--k 1] [--max-gap-turns 8] \
        [--ts-min 2025-01-01 --ts-max 2025-03-01] [--l1] [--use-b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(argv: list[str] | None = None) -> dict:
    from insar_spark.operators import series as S
    from insar_spark.operators.sbas import invert_pairs
    from insar_spark.session import get_spark
    from insar_spark.synth import synth_transcripts

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="parquet dir or synth:N")
    p.add_argument("--out", required=True, help="output parquet dir")
    p.add_argument("--network", default="adjacent", choices=["adjacent", "allpairs"])
    p.add_argument("--k", type=int, default=1, help="adjacent-pair bandwidth")
    p.add_argument("--max-gap-turns", type=int, default=8, help="F3 cap (allpairs)")
    p.add_argument("--ts-min", default=None)
    p.add_argument("--ts-max", default=None)
    p.add_argument("--l1", action="store_true", help="A9 robust IRLS solve")
    p.add_argument("--use-b", action="store_true", help="velocity (B-matrix) model")
    p.add_argument("--min-coherence", type=float, default=0.0)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    spark = get_spark("solve_job", master=args.master)
    t0 = time.perf_counter()
    if args.input.startswith("synth:"):
        turns = synth_transcripts(spark, n_convs=int(args.input.split(":")[1]))
    else:
        turns = spark.read.parquet(args.input).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
    if args.ts_min:
        turns = turns.filter(F.col("ts") >= args.ts_min)  # F1, pushed to scan
    if args.ts_max:
        turns = turns.filter(F.col("ts") < args.ts_max)

    df = S.with_text_len(turns)
    if args.network == "adjacent":
        pairs = S.adjacent_pairs(df, "text_len", k=args.k)
    else:
        pairs = S.all_pairs(df, "text_len", max_gap_turns=args.max_gap_turns)

    solved = invert_pairs(
        pairs, use_b_matrix=args.use_b, l1=args.l1, prefilter=True
    )
    if args.min_coherence > 0:  # F6 analog: quality threshold on output
        solved = solved.filter(F.col("temporal_coherence") >= args.min_coherence)

    solved.write.mode("overwrite").option("compression", "zstd").parquet(args.out)
    out_df = spark.read.parquet(args.out)
    metrics = {
        "rows": out_df.count(),
        "series": out_df.select("conv_id").distinct().count(),
        "wall_sec": round(time.perf_counter() - t0, 3),
        "network": args.network,
    }
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
