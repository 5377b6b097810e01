"""Explicit StructTypes for every table in the engine (SURVEY.md §1).

The reference declares schemas twice (SQL DDL init_script.sql; ES mapping
search/search.py:76-87) and never infers.  We do the same: every reader and
generator in this package takes one of these StructTypes — nothing is inferred.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Dim table: crawl roots.  Ref: init_script.sql:3-10, database.py:16-23.
WEBSITES = T.StructType(
    [
        T.StructField("website_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("logged_ip", T.StringType(), True),
        T.StructField("logged_useragent", T.StringType(), True),
        T.StructField("last_modified", T.TimestampType(), True),
    ]
)

# Fact table: indexed file documents.  Ref: ES mapping search/search.py:76-87
# (path text, name text+nGram, mtime epoch_second, size long, website_id int,
# ext keyword, routing=website_id → we partition/bucket by website_id).
FILES = T.StructType(
    [
        T.StructField("website_id", T.LongType(), False),
        T.StructField("path", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("ext", T.StringType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("mtime", T.TimestampType(), True),
    ]
)

# NDJSON crawl-result line, pre-derivation.  Ref: search/search.py:141-148
# (`ext` is derived at ingest, `website_id` injected).
CRAWL_RESULT_LINE = T.StructType(
    [
        T.StructField("path", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("mtime", T.LongType(), True),  # epoch seconds on the wire
    ]
)

# Frontier entry ≈ reference Task (tasks.py:26-45) generalized to URL
# granularity for BFS rounds; hash64=website_id (tasks.py:158) becomes the
# host partition key.
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("website_id", T.LongType(), True),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("discovery_seq", T.LongType(), False),
    ]
)

# URL-seen set: ground truth for dedup (database.py:78-90).  url kept for
# prefix-membership checks (database.py:129-136); url_hash for cheap anti-join.
SEEN = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
    ]
)

# Blacklist dim, stored scheme://netloc.  Ref: init_script.sql:18-21,
# database.py:270-272.
BLACKLIST = T.StructType(
    [
        T.StructField("blacklist_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
    ]
)

# Politeness dim (north_rule; absent from the reference snapshot, which
# delegated politeness to the external Go crawler — README.md:29-30).
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay", T.DoubleType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), True),
    ]
)

# Synthetic page graph (stand-in for live HTTP; od_util.py:167-213 semantics).
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("link_tag_count", T.IntegerType(), False),
        T.StructField("script_tag_count", T.IntegerType(), False),
        T.StructField("redirects", T.BooleanType(), False),
    ]
)

# Image+caption rows (BASELINE.json input_hint — authoritative shape).
IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# Search log (init_script.sql:28-39, writer database.py:302-313).
QUERY_LOG = T.StructType(
    [
        T.StructField("search_time", T.TimestampType(), True),
        T.StructField("remote_addr", T.StringType(), True),
        T.StructField("forwarded_for", T.StringType(), True),
        T.StructField("query", T.StringType(), True),
        T.StructField("extensions", T.StringType(), True),
        T.StructField("page", T.IntegerType(), True),
        T.StructField("blocked", T.BooleanType(), True),
        T.StructField("results", T.LongType(), True),
        T.StructField("took", T.LongType(), True),
    ]
)

# Per-partition lineage manifest: the task-id / upload-slot analog
# (tasks.py:167-176) — one row per (round, partition) write.
LINEAGE = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("token", T.StringType(), False),  # deterministic, not uuid (X9)
    ]
)
