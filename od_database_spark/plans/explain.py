"""Physical-plan inspection helpers (SURVEY.md §4).

The engine adds no custom Catalyst rules — everything is expressed so the
built-in optimizer produces the right physical shape.  These helpers make
that shape assertable (tests/test_plans.py) and debuggable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lines of every scan in the plan."""
    out = []
    for line in plan_string(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line[len("PushedFilters:"):].strip())
    return out


def join_strategies(df: DataFrame) -> list[str]:
    """Which join operators the plan uses (BroadcastHashJoin /
    SortMergeJoin / ShuffledHashJoin / BroadcastNestedLoopJoin)."""
    plan = plan_string(df)
    return [
        j
        for j in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
        )
        if j in plan
    ]


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan has map-side partial + final hash aggregation."""
    return plan_string(df).count("HashAggregate") >= 2


def exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges — the scale-cost currency of the plan.
    BroadcastExchange is deliberately excluded: broadcasts ship a small
    table once per executor, not the data-proportional rows."""
    # "simple" mode keeps operator arguments inline ("Exchange
    # hashpartitioning(...)"); formatted mode splits them onto detail lines
    plan = plan_string(df, "simple")
    return sum(
        plan.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition",
                     "RoundRobinPartitioning")
    )
