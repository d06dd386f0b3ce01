"""Local mirror of the driver's correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin at a
given scale factor, compares row count, column names, and values
(order-insensitive: columns sorted by name, rows sorted by all columns).

Usage: python tools/check_oracle.py [sf_dir] [--runs N] [query ...]

``--runs N`` (default 1) executes each DuckDB oracle N times and flags
queries whose ORACLE output is not identical across runs — DuckDB's
parallel aggregation combines partials in run-varying order, so a
rounding boundary inside the cross-engine wobble makes a query a per-run
lottery rather than deterministically green/red (measured round 4:
a 6dp lowess row flipped between two runs of the same query on the same
data). Use ``--runs 3`` before concluding a float mismatch is a defect.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from insar_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), na_position="first").reset_index(
        drop=True
    )


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns differ: spark={sorted(got.columns)} duck={sorted(exp.columns)}"]
    # Driver-hash trap gate (learned from the r3 shard_stats red row): the
    # driver byte-hashes values BEFORE any dtype normalization, so an
    # integer column on the Spark side vs a float column on the DuckDB side
    # (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float64 "149174.0") hash-breaks
    # even when every value is equal. normalize() below would mask that, so
    # flag the dtype-kind mismatch itself.
    for c in sorted(got.columns):
        gk, ek = got[c].dtype.kind, exp[c].dtype.kind
        if {gk, ek} == {"i", "f"} or {gk, ek} == {"u", "f"}:
            side = "duck" if ek == "f" else "spark"
            problems.append(
                f"col {c}: DTYPE-KIND mismatch spark={got[c].dtype} "
                f"duck={exp[c].dtype} — {side} side is float where the other "
                f"is integer; the driver's byte-hash will break (cast the "
                f"oracle, e.g. sum(x)::bigint)"
            )
    if problems:
        return problems
    if len(got) != len(exp):
        problems.append(f"row count: spark={len(got)} duck={len(exp)}")
        return problems
    g, e = normalize(got), normalize(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if pd.api.types.is_float_dtype(gv):
            ok = np.isclose(
                gv.to_numpy(), ev.to_numpy("float64"), rtol=0, atol=1e-9, equal_nan=True
            )
        else:
            ok = (gv == ev) | (gv.isna() & ev.isna())
            ok = ok.to_numpy()
        n_bad = int((~ok).sum())
        if n_bad:
            i = int(np.argmax(~ok))
            problems.append(
                f"col {c}: {n_bad}/{len(g)} mismatched, first at row {i}: "
                f"spark={gv.iloc[i]!r} duck={ev.iloc[i]!r}"
            )
        elif pd.api.types.is_float_dtype(gv):
            # Driver-style strict hash: byte-identical floats (catches
            # -0.0 vs 0.0, which isclose does not).
            ga, ea = gv.to_numpy("float64"), ev.to_numpy("float64")
            nan = np.isnan(ga) & np.isnan(ea)
            if ga[~nan].tobytes() != ea[~nan].tobytes():
                d = ga.copy()
                d[nan] = 0.0
                e2 = ea.copy()
                e2[nan] = 0.0
                i = int(np.argmax(d.view("int64") != e2.view("int64")))
                problems.append(
                    f"col {c}: HASH mismatch (value-equal), first byte-diff "
                    f"row {i}: spark={gv.iloc[i]!r} duck={ev.iloc[i]!r}"
                )
    return problems


def main() -> int:
    args = sys.argv[1:]
    runs = 1
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    con = duckdb.connect()
    # An in-memory DuckDB has NO temp directory, so blocking operators
    # cannot spill and a big unrolled oracle (robust lowess at sf0.1
    # materializes ~3 windowed self-join CTEs) dies with an OOM while the
    # Spark JVM holds its heap next door. Give it a spill dir and a cap
    # well under the JVM's share. The cap is host-dependent: default to
    # ~1/3 of physical RAM (40GB on the 125GiB bench host), overridable
    # via ORACLE_MEM for other machines.
    mem = os.environ.get("ORACLE_MEM")
    if not mem:
        try:
            kb = int(
                next(
                    line.split()[1]
                    for line in open("/proc/meminfo")
                    if line.startswith("MemTotal:")
                )
            )
            mem = f"{max(1, kb // (3 * 1024 * 1024))}GB"
        except (OSError, StopIteration):
            mem = "4GB"
    con.execute("SET temp_directory='/tmp/duck_oracle_spill'")
    con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    spark = get_spark("oracle_check")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp = con.execute(oracles[name]).df()
            unstable = []
            for r in range(1, runs):
                exp2 = con.execute(oracles[name]).df()
                if compare(name, exp2, exp):
                    unstable.append(r)
            if unstable:
                failed.append(name)
                print(
                    f"FAIL {name}: ORACLE UNSTABLE across runs {unstable} "
                    f"— a rounding boundary sits inside DuckDB's "
                    f"parallel-sum wobble; coarsen the query's rounding"
                )
                continue
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        problems = compare(name, got, exp)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{len(failed)} failed" if failed else "\nall green")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
