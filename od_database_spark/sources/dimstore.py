"""Websites dimension store: the reference's Postgres Website table CRUD
(database.py:59-150) as a small versioned-parquet dim (SURVEY.md S8).

Dims are tiny relative to the fact table (one row per website vs millions of
files per site), so each mutation rewrites the dim — the parquet analog of
one Postgres transaction.  ids are deterministic xxhash64(url) (SURVEY X9:
the reference's SERIAL id is a Postgres artifact; replayability needs
content-derived ids).

Commit protocol (object-store portable): each mutation writes an IMMUTABLE
new version dir ``v{n}/`` beside the live ones, then atomically flips a tiny
``_LATEST`` pointer file (os.replace locally; a single-object PUT on S3/GCS
— no directory rename of big data, which object stores don't have).  Readers
resolve the pointer once per load and then read only that immutable dir, so
a reader concurrent with a commit sees either the old or the new version,
always complete; a crash mid-commit leaves the pointer on the old version.
The previous version is retained one generation for in-flight readers.

At 10^8 websites the dim is a few GB — versions write in parallel (no
coalesce(1)) and stay broadcastable on the query side (J1-J3).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEBSITES_DIM = T.StructType(
    [
        T.StructField("website_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("logged_ip", T.StringType(), True),
        T.StructField("logged_useragent", T.StringType(), True),
        T.StructField("last_modified", T.TimestampType(), True),
    ]
)


def _latest_version(path: str) -> str | None:
    """The committed version name from the pointer file, or None.

    A dim dir WITHOUT a pointer but WITH parquet content is a
    pre-versioned-layout store — RAISE rather than silently treat existing
    rows as an empty dim (the next insert would commit v00001 with only the
    new rows and permanently hide the old ones)."""
    ptr = os.path.join(path, "_LATEST")
    if not os.path.isfile(ptr):
        if os.path.isdir(path) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(path)
        ):
            raise ValueError(
                f"{path} holds a pre-versioned dim layout (parquet files, no "
                "_LATEST pointer) — migrate it by moving the files into a "
                "v00001/ subdir and writing 'v00001' to _LATEST."
            )
        return None
    with open(ptr) as f:
        v = f.read().strip()
    return v or None


def load(spark: SparkSession, path: str) -> DataFrame:
    v = _latest_version(path)
    if v is None:
        return spark.createDataFrame([], WEBSITES_DIM)
    return spark.read.schema(WEBSITES_DIM).parquet(os.path.join(path, v))


def _commit(dim: DataFrame, path: str) -> None:
    """Versioned commit: write an immutable v{n}/ dir, flip the _LATEST
    pointer atomically, GC versions older than the previous one."""
    os.makedirs(path, exist_ok=True)
    cur = _latest_version(path)
    n = int(cur[1:]) + 1 if cur else 1
    vdir = f"v{n:05d}"
    dim.write.mode("overwrite").parquet(os.path.join(path, vdir))
    tmp = os.path.join(path, "_LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(vdir)
    os.replace(tmp, os.path.join(path, "_LATEST"))  # single atomic pointer op
    keep = {vdir, cur}
    for d in os.listdir(path):
        if d.startswith("v") and d not in keep:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def insert_websites(spark: SparkSession, path: str, rows: DataFrame) -> DataFrame:
    """INSERT (database.py:66-76): new rows get website_id = xxhash64(url)
    and last_modified = now; existing urls are left untouched (the reference
    guards inserts with website_exists)."""
    cur = load(spark, path)
    fresh = (
        rows.join(cur.select("url"), on="url", how="left_anti")
        .select(
            F.xxhash64("url").alias("website_id"),
            "url",
            F.col("logged_ip").cast("string"),
            F.col("logged_useragent").cast("string"),
            F.current_timestamp().alias("last_modified"),
        )
    )
    out = cur.unionByName(fresh)
    _commit(out, path)
    return load(spark, path)


def update_website_date_if_exists(spark: SparkSession, path: str, website_id: int) -> DataFrame:
    """UPDATE last_modified=CURRENT_TIMESTAMP WHERE id=? (database.py:59-64)."""
    cur = load(spark, path)
    out = cur.withColumn(
        "last_modified",
        F.when(F.col("website_id") == website_id, F.current_timestamp()).otherwise(
            F.col("last_modified")
        ),
    )
    _commit(out, path)
    return load(spark, path)


def delete_website(spark: SparkSession, path: str, website_id: int) -> DataFrame:
    """DELETE FROM Website WHERE id=? (database.py:138-150; the reference
    also deletes the site's documents — pair with
    factstore.replace_website_docs_partitioned for that half)."""
    cur = load(spark, path)
    _commit(cur.filter(F.col("website_id") != website_id), path)
    return load(spark, path)


def get_website_by_url(dim: DataFrame, url: str) -> DataFrame:
    return dim.filter(F.col("url") == url)  # database.py:78-90


def websites_page(dim: DataFrame, per_page: int, page: int, url_prefix: str) -> DataFrame:
    """database.py:107-116: LIKE prefix + ORDER BY last_modified DESC page."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("last_modified"), F.asc("website_id"))
    return (
        dim.filter(F.col("url").startswith(url_prefix))
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") > page * per_page) & (F.col("_rn") <= (page + 1) * per_page)
        )
        .drop("_rn")
    )
