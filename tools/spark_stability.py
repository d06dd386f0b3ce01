"""Spark-side run-stability audit: is every query byte-stable?

Executes every __spark_entry__.queries() entry N times (default 2) in ONE
Spark session at a given scale factor and strict-compares the normalized
results BYTE-FOR-BYTE (float columns compared on their raw int64 bit
patterns, so -0.0 vs 0.0 and any last-ulp drift count as instability).

Why this matters: Spark's shuffle-fetch arrival order varies run to run,
so a float aggregation that feeds a rounding boundary can flip a digit
between two executions of the same plan on the same data — the
engine-side analog of DuckDB's parallel-sum wobble that made a 6dp
lowess row a per-run lottery in round 4 (BENCH.md §0b.3). Every query
in the contract rounds/casts its outputs so that post-rounding nothing
moves; this tool is the proof.

Usage: python tools/spark_stability.py [sf_dir] [--runs N] [query ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from insar_spark.session import get_spark  # noqa: E402

from check_oracle import normalize  # noqa: E402  (same normalization)


def snapshot(pdf: pd.DataFrame) -> dict[str, bytes]:
    """Byte image per column of the normalized frame (floats via their
    int64 bit patterns; NaNs canonicalized to one bit pattern so a NaN
    payload difference does not false-positive)."""
    out: dict[str, bytes] = {}
    for c in pdf.columns:
        v = pdf[c]
        if pd.api.types.is_float_dtype(v):
            a = v.to_numpy("float64").copy()
            a[np.isnan(a)] = np.nan  # canonical quiet NaN
            out[c] = a.tobytes()
        else:
            out[c] = v.astype(str).str.cat(sep="\x1f").encode()
    return out


def main() -> int:
    args = sys.argv[1:]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark("spark_stability", master="local[32]")
    queries = entry_mod.queries()
    unstable = []
    t0 = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        base = None
        bad = False
        for r in range(runs):
            pdf = normalize(fn(spark, sf_dir).toPandas())
            snap = snapshot(pdf)
            if base is None:
                base = snap
            elif snap != base:
                cols = [c for c in base if snap.get(c) != base[c]]
                print(f"UNSTABLE {name}: run {r + 1} differs in cols {cols}")
                unstable.append(name)
                bad = True
                break
        if not bad:
            print(f"OK   {name} ({runs} runs byte-identical)")
    n = len(only) if only else len(queries)
    print(
        f"\n{'UNSTABLE: ' + ', '.join(unstable) if unstable else 'all stable'}"
        f" ({n} queries x {runs} runs, {time.time() - t0:.0f}s)"
    )
    return 1 if unstable else 0


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/tools")
    raise SystemExit(main())
