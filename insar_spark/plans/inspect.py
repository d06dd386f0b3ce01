"""Physical-plan hygiene: programmatic checks over executed plans.

The reference hand-plans its physical execution (block shapes, chunk
layout — SURVEY.md §4); in this engine Catalyst plans, and these helpers
make the *properties we rely on* (shuffle counts, scan pushdown, broadcast
choices, codegen coverage) assertable in tests and auditable in PLANS.md,
so a regression that silently adds a raw-size shuffle fails CI instead of
surfacing at 100 TB.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanAudit:
    exchanges: list[str]
    broadcasts: int
    pushed_filters: list[str]
    read_schemas: list[str]
    partial_agg_ops: int
    python_stages: int

    @property
    def n_exchanges(self) -> int:
        return len(self.exchanges)

    @property
    def n_exchanges_unique(self) -> int:
        """Exchanges after collapsing textually-identical subtrees (modulo
        expression ids): repeated branches of a DAG (e.g. the candidate
        pipeline referenced by both sides of a verify join) print one
        Exchange per occurrence, but Spark's ReuseExchange executes the
        shuffle once — this is the count that reflects runtime cost."""
        norm = set()
        for e in self.exchanges:
            e = e[e.index("Exchange"):]  # drop tree-drawing prefix
            norm.add(re.sub(r"#\d+L?|\[plan_id=\d+\]", "", e))
        return len(norm)


def audit(df: DataFrame) -> PlanAudit:
    plan = executed_plan(df)
    lines = plan.splitlines()
    exchanges = [
        l.strip() for l in lines if re.search(r"\bExchange (hash|range|Single)", l)
    ]
    broadcasts = sum("BroadcastExchange" in l for l in lines)
    pushed = re.findall(r"DataFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    # under AQE the pre-execution plan carries no codegen markers; the
    # scale-relevant property is map-side partial aggregation (absorbs
    # hot-key skew before the exchange)
    codegen = sum("partial_" in l for l in lines)
    python_stages = sum(
        1 for l in lines
        if "ArrowEvalPython" in l or "FlatMapGroupsInPandas" in l or "MapInPandas" in l
        or "BatchEvalPython" in l
    )
    return PlanAudit(exchanges, broadcasts, pushed, schemas, codegen, python_stages)


def assert_max_exchanges(df: DataFrame, n: int, what: str = "") -> None:
    a = audit(df)
    assert a.n_exchanges <= n, (
        f"{what or 'plan'}: expected <= {n} exchanges, got {a.n_exchanges}:\n"
        + "\n".join(a.exchanges)
    )


def assert_no_rowwise_python(df: DataFrame, what: str = "") -> None:
    plan = executed_plan(df)
    assert "BatchEvalPython" not in plan, (
        f"{what or 'plan'}: row-at-a-time Python UDF in the plan (forbidden; "
        "use Arrow/pandas UDFs)"
    )
