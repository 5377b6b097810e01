"""Bucketed seen-set table: the co-located-join storage layout for the
exact anti-join (the bloomless scale path; complements operators/seen.py).

The durable seen set is a catalog table BUCKETED BY url_hash (bucketBy +
sortBy).  With subset co-partitioning enabled (session.py sets
``spark.sql.requireAllClusterKeysForCoPartition=false``), the exact
anti-join on (url_hash, url) accepts the table's HashPartitioning(url_hash)
— the 10^10-row seen side is NEVER shuffled; only the (much smaller)
candidate batch exchanges, hashed to the bucket layout.  Appends preserve
the bucket spec, so incremental growth keeps the property.

This is the storage-level alternative to the bloom prefilter in seen.py
(which gets to zero exchanges by broadcasting the maybe-seen sliver): use
the bloom path inside a crawl run, and this table as the durable,
query-anytime form.  Correctness is identical either way — the join keys
include the full url string, so hash collisions can never drop a URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 64


def create_seen_table(
    seen: DataFrame, table: str, n_buckets: int = N_BUCKETS
) -> None:
    """Initial build: (url, url_hash) rows into a bucketed, bucket-sorted
    catalog table."""
    (
        seen.select("url", "url_hash")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "url_hash")
        .sortBy("url_hash")
        .format("parquet")
        .saveAsTable(table)
    )


def append_seen(delta: DataFrame, table: str, n_buckets: int = N_BUCKETS) -> None:
    """Incremental growth: append a round's new urls; the bucket spec must
    match the table's, so each append adds one file set per bucket."""
    (
        delta.select("url", "url_hash")
        .write.mode("append")
        .bucketBy(n_buckets, "url_hash")
        .sortBy("url_hash")
        .format("parquet")
        .saveAsTable(table)
    )


def filter_unseen_bucketed(
    spark: SparkSession, candidates: DataFrame, table: str
) -> DataFrame:
    """Exact anti-join against the bucketed table: candidates carry
    (canon_url, url_hash); the seen side reads bucket-aligned (no exchange),
    the candidate side shuffles once on url_hash to match the buckets."""
    tbl = spark.table(table)
    cond = (candidates["url_hash"] == tbl["url_hash"]) & (
        candidates["canon_url"] == tbl["url"]
    )
    return candidates.join(tbl, on=cond, how="left_anti")


def seen_count(spark: SparkSession, table: str) -> int:
    return spark.table(table).count()
