"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (A1 ext-breakdown shape) on sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 (SQL-expressible
  ones via od_database_spark.queries.REGISTRY) plus the crawl-pipeline
  operators (frontier round, submit dedup, image fetch/verify), which run on
  the deterministic synthetic world and carry rows-only checks.
- ``oracle_sql()``: DuckDB equivalents for every REGISTRY entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from od_database_spark import queries as Q
from od_database_spark import schema
from od_database_spark.datagen import world
from od_database_spark.operators import fetch as fetch_ops
from od_database_spark.operators import frontier as fr

_N_HOSTS = 12  # small deterministic world for the crawl demos
_memo: dict = {}


def _world(spark: SparkSession):
    key = ("world", id(spark))
    if key not in _memo:
        pages = world.gen_pages(spark, _N_HOSTS).cache()
        robots = world.gen_robots(spark, _N_HOSTS).cache()
        blacklist = world.gen_blacklist(spark, _N_HOSTS)
        pages.count()
        _memo[key] = (pages, robots, blacklist)
    return _memo[key]


def _submitted(spark: SparkSession) -> DataFrame:
    key = ("submitted", id(spark))
    if key not in _memo:
        pages, robots, blacklist = _world(spark)
        seeds = world.gen_seeds(spark, _N_HOSTS)
        empty = spark.createDataFrame([], schema.SEEN)
        _memo[key] = fr.submit_seeds(spark, seeds, empty, blacklist, pages).localCheckpoint(
            eager=True
        )
    return _memo[key]


def _round1(spark: SparkSession):
    """Shared round-1 expansion for the crawl demo queries — each queries()
    callable is invoked separately by the driver, so the common prefix is
    memoized per session."""
    key = ("round1", id(spark))
    if key not in _memo:
        pages, robots, _ = _world(spark)
        state = fr.initial_state(_submitted(spark))
        state, fetched, image_urls = fr.expand_round(state, pages, robots)
        _memo[key] = (state, fetched, image_urls)
    return _memo[key]


def q_crawl_submit_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: the FULL submit-time dedup chain (views.py:269-302 — validity,
    seen, prefix, blacklist, is_od) over the synthetic world's seed list.
    The serial-resolution core (resolve_intra_batch) is oracle-gated as the
    registry's ``submit_dedup``; this demo keeps the whole chain (which
    needs the page model DuckDB can't see) visible, pytest-verified vs
    tests/oracle.py."""
    return _submitted(spark).select("url", "host", "submit_seq").orderBy("submit_seq")


def q_crawl_frontier_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5/C7/C9: one politeness-budgeted BFS round; returns the next frontier
    in discovery order."""
    from pyspark.sql import Window

    state, _, _ = _round1(spark)
    # discovery_seq values are packed (run-specific); expose the
    # deterministic queue rank instead
    w = Window.orderBy(F.desc("priority"), F.asc("discovery_seq"))
    return (
        state.frontier.withColumn("queue_rank", F.row_number().over(w))
        .drop("discovery_seq")
        .orderBy("queue_rank")
    )


def q_fetch_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/§2.9.4: image fetch+decode through Arrow batches (bytes summarized
    as lengths so the result is hashable)."""
    _, _, image_urls = _round1(spark)
    imgs = fetch_ops.fetch_images(image_urls)
    return imgs.select(
        "image_id", "w", "h", "fmt", "caption", "phash",
        F.length("bytes").alias("n_bytes"),
    ).orderBy("image_id")


def q_image_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint invariant: per-row decoded-pixel + caption + phash checks,
    aggregated."""
    _, _, image_urls = _round1(spark)
    verified = fetch_ops.verify_images(fetch_ops.fetch_images(image_urls))
    return verified.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.min(F.col("pixel_ok").cast("int")).alias("all_pixel_ok"),
        F.min(F.col("caption_ok").cast("int")).alias("all_caption_ok"),
        F.min(F.col("phash_ok").cast("int")).alias("all_phash_ok"),
        F.round(F.min("psnr"), 2).alias("min_psnr"),
    ).orderBy("fmt")


def q_image_phash_reencode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-side near-dup detection over REAL fetched images: 64-bit
    perceptual-hash hamming pairs via multi-probe sub-block banding
    (operators/dedup.image_phash_near_pairs).  The banding operator itself
    is oracle-gated as the registry's ``image_phash_neardup``; this demo
    runs it over the crawl's decoded images with planted deterministic
    're-encodes' (2 flipped phash bits), pytest-verified against a
    brute-force numpy oracle."""
    from od_database_spark.operators.dedup import image_phash_near_pairs

    _, _, image_urls = _round1(spark)
    imgs = fetch_ops.fetch_images(image_urls).select("image_id", "phash")
    reenc = imgs.filter(F.xxhash64("image_id") % 7 == 0).select(
        F.concat(F.col("image_id"), F.lit("_re")).alias("image_id"),
        F.col("phash").bitwiseXOR(F.lit(0b101)).alias("phash"),
    )
    return image_phash_near_pairs(imgs.unionByName(reenc), max_hamming=6).orderBy(
        "id_a", "id_b"
    )


_CRAWL_QUERIES = {
    "crawl_submit_chain": q_crawl_submit_chain,
    "crawl_frontier_round": q_crawl_frontier_round,
    "fetch_images": q_fetch_images,
    "image_verify": q_image_verify,
    "image_phash_reencode": q_image_phash_reencode,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's signature stats aggregation (A1/A4 ext
    breakdown, search/search.py:255-273) on sf0.001."""
    return Q.q_ext_breakdown(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: fn for name, (fn, _sql) in Q.REGISTRY.items()
    }
    out.update(_CRAWL_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in Q.REGISTRY.items() if sql}
