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


def test_ivf_centroids_fixed_and_broadcast(spark, sf_dir):
    """IVF scale contract, round-3 form: the O(N·K) assignment lives in the
    ann_store BUILD (tests/test_ann_store.py covers the probe pruning); the
    query plan only ranks K centroids, broadcast-probes the cells table, and
    top-5s — no SortMergeJoin, no corpus-wide aggregation at query time."""
    plan = plan_of(spark, sf_dir, "embedding_ivf_search")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ivf_cents_" in plan and "ivf_cells_" in plan


def test_politeness_full_rows_never_shuffle(spark):
    """The politeness split must be a broadcast join on the full-row side:
    the only exchanges in the due-plan are on the slim ranking projection
    (url_hash/host/priority/seq), never on rows carrying the url string."""
    from pyspark.sql import functions as F

    from od_database_spark.operators import frontier as fr
    from od_database_spark.plans import explain as PL

    frontier = spark.range(2000).select(
        F.format_string("http://h%d.t/d%d/", F.pmod("id", F.lit(37)), F.col("id")).alias("url"),
        F.xxhash64("id").alias("url_hash"),
        F.lit(1).cast("long").alias("website_id"),
        F.format_string("h%d.t", F.pmod("id", F.lit(37))).alias("host"),
        (F.pmod("id", F.lit(3)) + 1).cast("int").alias("priority"),
        F.lit(0).cast("int").alias("depth"),
        F.col("id").alias("discovery_seq"),
    ).localCheckpoint(eager=True)
    robots = spark.createDataFrame(
        [(f"h{i}.t", 1.0, []) for i in range(37)],
        "host string, crawl_delay double, disallow_prefixes array<string>",
    )
    due, carry, cutoffs = fr.politeness_select(frontier, robots, round_seconds=10)
    for df in (due, carry):
        plan = PL.plan_string(df)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # the due/carry plans contain no exchange at all: the frontier comes
        # from a checkpoint and the cutoffs come in via broadcast
        assert PL.exchange_count(df) == 0, plan
    # selection semantics sanity: per-host due counts obey the budget
    per_host = due.groupBy("host").count().collect()
    assert per_host and all(r["count"] <= 10 for r in per_host)
    cutoffs.unpersist()


def test_banded_lsh_pair_join_is_slim(spark, sf_dir):
    """Candidate generation must not carry embedding arrays through the
    bucket self-join: the join keys/payload are (bucket, vec_id) only, and
    embeddings join back only after distinct pairs."""
    from od_database_spark.plans import explain as PL
    from od_database_spark.queries import t as load

    from od_database_spark.operators.dedup import embedding_near_dup

    e = load(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup(e, "embedding", "vec_id", threshold=0.25)
    plan = PL.plan_string(pairs, "simple")
    # candidate generation and the pair-distinct must shuffle slim key rows
    # only; embeddings join back per side (broadcast at this SF, keyed by id
    # at scale) — assert NO shuffle exchange ever carries the array column
    import re

    m = re.findall(r"Exchange (?:hash|range)partitioning[^\n]*", plan)
    assert m, plan  # the distinct-pairs exchange at minimum
    assert all("embedding" not in line for line in m), m


def test_bloom_recheck_never_shuffles_seen(spark):
    """With the bloom prefilter on, the exact re-check must stream over the
    seen table via broadcast joins — zero shuffle exchanges in the whole
    filter_unseen plan (the seen side is only scanned)."""
    from pyspark.sql import functions as F

    from od_database_spark.functions.urls import with_canonical
    from od_database_spark.operators import seen as seen_ops
    from od_database_spark.plans import explain as PL

    seen_df = with_canonical(
        spark.createDataFrame(
            [(f"http://h{i}.t/",) for i in range(300)], "url string"
        )
    ).select(F.col("canon_url").alias("url"), "url_hash").localCheckpoint(eager=True)
    cand = with_canonical(
        spark.createDataFrame(
            [(f"http://h{i}.t/",) for i in range(250, 400)], "url string"
        )
    ).localCheckpoint(eager=True)
    bloom = seen_ops.PartitionedBloom.build(seen_df, n_parts=8)
    out = seen_ops.filter_unseen(cand, seen_df, bloom)
    assert PL.exchange_count(out) == 0, PL.plan_string(out, "simple")
    # and it still answers exactly
    got = {r["canon_url"] for r in out.collect()}
    assert got == {f"http://h{i}.t/" for i in range(300, 400)}
