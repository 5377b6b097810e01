"""Plan-shape regression guards: the physical properties that make these
queries survive a 100x scale-up (pushdown, pruning, broadcast, partial aggs)
must not silently disappear."""

import pytest

from od_database_spark.queries import REGISTRY


def plan_of(spark, sf_dir, name) -> str:
    fn, _ = REGISTRY[name]
    df = fn(spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filtered_search_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filtered_search")
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(l_quantity,10.0)" in plan
    assert "In(l_returnflag, [A,R])" in plan
    # column pruning: only the needed columns are read
    assert "l_extendedprice" not in plan


def test_join_is_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_deleted_default")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_aggregations_partial_final(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ext_breakdown")
    assert plan.count("HashAggregate") >= 2  # map-side partial + final
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort


def test_topk_early_termination(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "website_scatter")
    assert "TakeOrderedAndProject" in plan


def test_scan_schema_pruned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ext_breakdown")
    assert "ReadSchema: struct<lang:string,n_chars:bigint>" in plan
