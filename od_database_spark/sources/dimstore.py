"""Websites dimension store: the reference's Postgres Website table CRUD
(database.py:59-150) as a small versioned-parquet dim (SURVEY.md S8).

Dims are tiny relative to the fact table (one row per website vs millions of
files per site), so each mutation rewrites the dim atomically — a temp dir +
rename, the parquet analog of one Postgres transaction.  ids are
deterministic xxhash64(url) (SURVEY X9: the reference's SERIAL id is a
Postgres artifact; replayability needs content-derived ids).

Readers (`load`) always see a complete committed version.  At 10^8 websites
the dim is a few GB — still a single overwrite, and still broadcastable
joins on the query side (J1-J3).
"""

from __future__ import annotations

import os
import shutil
import uuid

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


def load(spark: SparkSession, path: str) -> DataFrame:
    if not os.path.isdir(path):
        return spark.createDataFrame([], WEBSITES_DIM)
    return spark.read.schema(WEBSITES_DIM).parquet(path)


def _commit(dim: DataFrame, path: str) -> None:
    """Atomic replace: write a new version beside the live dir, then swap."""
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    dim.coalesce(1).write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


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
