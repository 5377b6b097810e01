"""Full pipeline integration: submit → crawl → files index → search/stats →
export — everything a reference user runs, end to end on the synthetic world."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from od_database_spark import crawl
from od_database_spark.datagen import world
from od_database_spark.operators import search as S
from od_database_spark.sources import ndjson


@pytest.fixture(scope="module")
def pipeline(spark):
    n = 25
    pages = world.gen_pages(spark, n).cache()
    robots = world.gen_robots(spark, n).cache()
    result = crawl.run(
        spark, world.gen_seeds(spark, n), pages, robots,
        world.gen_blacklist(spark, n), fetch=True,
    )
    files = None
    for fetched in result.fetched_pages:
        part = ndjson.files_from_crawl(fetched)
        files = part if files is None else files.unionByName(part)
    files = files.cache()
    files.count()
    return result, files


def test_crawl_produced_files_index(pipeline):
    result, files = pipeline
    assert files.count() > 50
    exts = {r["ext"] for r in files.select("ext").distinct().collect()}
    assert {"jpg", "png", "txt"} & exts
    assert files.filter(F.col("size") < 0).count() == 0


def test_stats_over_crawled_index(pipeline):
    _, files = pipeline
    stats = S.global_stats(files)
    fs = stats["file_stats"].collect()[0]
    assert fs["count"] == files.count()
    scatter = stats["website_scatter"].collect()
    assert len(scatter) > 3  # several crawled sites
    assert scatter[0]["doc_count"] >= scatter[-1]["doc_count"]


def test_search_over_crawled_index(pipeline):
    _, files = pipeline
    hits = S.search(files, "photo", match_all=True, per_page=20)
    rows = hits.collect()
    assert rows, "image files named photo_* should match"
    assert all("photo" in r["name"] for r in rows)
    # per-site stats for the busiest site
    top_site = (
        files.groupBy("website_id").count().orderBy(F.desc("count")).first()["website_id"]
    )
    per_site = S.get_stats(files, top_site).collect()
    assert per_site and per_site[0]["doc_count"] > 0


def test_export_crawled_index(pipeline, spark):
    result, files = pipeline
    websites = (
        files.select("website_id").distinct()
        .withColumn("url", F.concat(F.lit("http://site-"), F.col("website_id"), F.lit("/")))
    )
    tmp = tempfile.mkdtemp(prefix="oddb_e2e_")
    try:
        path = ndjson.export_csv(files, websites, tmp)
        back = spark.read.option("header", True).csv(path)
        assert back.count() == files.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_images_verified_end_to_end(pipeline):
    result, _ = pipeline
    from od_database_spark.operators import fetch as fetch_ops

    assert result.images is not None
    verified = fetch_ops.verify_images(result.images)
    bad = verified.filter(
        ~F.col("pixel_ok") | ~F.col("caption_ok") | ~F.col("phash_ok")
    ).count()
    assert bad == 0
