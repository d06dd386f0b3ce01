"""Per-query measurement harness for the optimization rounds (guide §1).

NOT part of the driver contract — bench.py is frozen; this file exists so
optimization work can (a) time any single registered query through the
noop sink (full materialization, no driver collect), (b) dump
``.explain("formatted")`` plans for the plan-diff evidence in
OPTIMIZATION_r06.md, and (c) repeat runs to separate host noise from real
change.

Usage:
    python bench_extra.py [--sf DIR] [--runs N] [--plans OUTDIR] [query ...]

With no query names: the full bench.py headline set. ``--plans`` writes
one ``<query>.txt`` explain file per query into OUTDIR.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    import __spark_entry__ as e
    from bench import headline_queries, run_timed
    from insar_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 2
    plans_dir = None
    while args and args[0].startswith("--"):
        if args[0] == "--sf":
            sf_dir = args[1]
            args = args[2:]
        elif args[0] == "--runs":
            runs = int(args[1])
            args = args[2:]
        elif args[0] == "--plans":
            plans_dir = args[1]
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench_extra", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.range(1000).select(F.sum("id")).collect()  # JVM/codegen warmup

    qs = headline_queries(spark)
    # also allow any registered query, not just the headline set
    for name, fn in e.queries().items():
        qs.setdefault(name, fn)
    names = args or list(headline_queries(spark).keys())

    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, sf_dir)
        if plans_dir:
            import contextlib
            import io

            os.makedirs(plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for _ in range(runs):
            dt, rows = run_timed(df)
            samples.append(round(dt, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(
            json.dumps(
                {"query": name, "best": min(samples), "samples": samples,
                 "rows": rows, "sf": sf_dir}
            ),
            flush=True,
        )
    print(json.dumps({"total_best": round(sum(min(s) for s in out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
