"""NDJSON crawl-result ingestion (SURVEY.md §2.1 S1/S2/S5).

Reference behavior being matched (search/search.py:134-158):
- one JSON object per line with (name, path, size, mtime)
- ``ext`` DERIVED at ingest: splitext on name, lowercased, '' for none;
  ``name`` keeps only the root
- ``website_id`` injected by the caller
- malformed lines are skipped, never fail the batch (logged in the
  reference; quarantined to a _corrupt column here)
- delete-then-reimport per website = idempotent replace (tasks.py:114-129)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schema
from ..functions.urls import ext_from_name, name_root

RAW_LINE = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("mtime", T.LongType(), True),  # epoch seconds on the wire
    ]
)


def read_crawl_ndjson(spark: SparkSession, path: str, website_id: int) -> DataFrame:
    """S1+S2: scan NDJSON, derive ext/name, inject website_id.  PERMISSIVE
    parse: bad lines land in _corrupt and are dropped (the reference logs and
    skips them, search/search.py:149-150)."""
    raw = spark.read.schema(
        T.StructType(RAW_LINE.fields + [T.StructField("_corrupt", T.StringType(), True)])
    ).option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt").json(path)
    ok = raw.filter(F.col("_corrupt").isNull() & F.col("name").isNotNull())
    return ok.select(
        F.lit(website_id).cast("long").alias("website_id"),
        F.coalesce(F.col("path"), F.lit("")).alias("path"),
        name_root(F.col("name")).alias("name"),
        ext_from_name(F.col("name")).alias("ext"),
        F.col("size"),
        F.to_timestamp(F.from_unixtime(F.col("mtime"))).alias("mtime"),
    )


def replace_website_docs(files: DataFrame, new_docs: DataFrame, website_id: int) -> DataFrame:
    """S4+S5: delete-then-reimport for one website — the reference's
    scroll-delete + bulk-import pair (search/search.py:91-176) collapses to a
    partition-filtered anti-union.  With an Iceberg/Delta catalog this is
    `replaceWhere website_id = ?`; on plain DataFrames/parquet it is an
    anti-filter + union by name."""
    kept = files.filter(F.col("website_id") != website_id)
    return kept.unionByName(new_docs)


def export_csv(files: DataFrame, websites: DataFrame, out_dir: str) -> str:
    """S7: full-index CSV export with website URL join (export.py:20-63).
    The reference lz4-frames the stream; lz4 isn't in this container, so gzip
    stands in (same one-codec-per-file contract, built-in quoting)."""
    joined = files.join(
        F.broadcast(websites.select("website_id", F.col("url").alias("website_url"))),
        on="website_id",
        how="left",
    ).select(
        "website_id",
        F.coalesce("website_url", F.lit("[DELETED]")).alias("website_url"),
        "path", "name", "ext", "size",
        F.unix_timestamp("mtime").alias("mtime"),
    )
    path = os.path.join(out_dir, "export_csv")
    joined.write.mode("overwrite").option("compression", "gzip").option(
        "header", True
    ).csv(path)
    return path


def list_downloads(spark: SparkSession, dl_dir: str) -> DataFrame:
    """S13+F15 (views.py:25-51): list the downloads directory as a DataFrame —
    csv files only (the reference's `name.find(".csv") != -1` substring
    check, quirk preserved), dirs dropped, with size and mtime stats."""
    rows = []
    if os.path.isdir(dl_dir):
        for name in os.listdir(dl_dir):
            if name.find(".csv") == -1:
                continue
            full = os.path.join(dl_dir, name)
            if not os.path.isfile(full):
                continue  # "Remove any dirs placed accidentally"
            st = os.stat(full)
            rows.append((name, full, int(st.st_size), int(st.st_mtime)))
    return spark.createDataFrame(
        rows, "name string, path string, size long, mtime long"
    ).orderBy("name")


def files_from_crawl(fetched_pages: DataFrame) -> DataFrame:
    """Derive the `files` fact table from crawl rounds: every non-directory
    link of a fetched page becomes a file document (the reference receives
    these as NDJSON uploads; ours come straight from the frontier expansion).
    size/mtime are deterministic functions of the file URL."""
    rows = fetched_pages.select(
        F.col("website_id"),
        F.col("url").alias("page_url"),
        F.explode("links").alias("link"),
    ).filter(~F.col("link").endswith("/") & ~F.col("link").rlike("^[a-z]+://"))
    h = F.xxhash64(F.concat(F.col("page_url"), F.col("link")))
    return rows.select(
        "website_id",
        F.regexp_replace(
            F.regexp_replace(F.col("page_url"), r"^[a-z]+://[^/]+/", ""), r"/$", ""
        ).alias("path"),
        name_root(F.col("link")).alias("name"),
        ext_from_name(F.col("link")).alias("ext"),
        F.pmod(h, F.lit(10**9)).alias("size"),
        F.to_timestamp(F.from_unixtime(F.lit(1500000000) + F.pmod(h, F.lit(10**8)))).alias(
            "mtime"
        ),
    )
