"""Plan-shape regression guards: the physical properties that make these
queries survive a 100x scale-up (pushdown, pruning, broadcast, partial aggs)
must not silently disappear."""

import pytest

from od_database_spark.plans import explain as PL
from od_database_spark.queries import REGISTRY


def plan_of(spark, sf_dir, name) -> str:
    fn, _ = REGISTRY[name]
    return PL.plan_string(fn(spark, sf_dir))


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


def test_plan_helpers(spark, sf_dir):
    fn, _ = REGISTRY["join_deleted_default"]
    df = fn(spark, sf_dir)
    assert PL.join_strategies(df) == ["BroadcastHashJoin"]
    fn2, _ = REGISTRY["ext_breakdown"]
    df2 = fn2(spark, sf_dir)
    assert PL.has_partial_aggregation(df2)
    assert PL.exchange_count(df2) >= 1
    fn3, _ = REGISTRY["filtered_search"]
    assert PL.pushed_filters(fn3(spark, sf_dir))
