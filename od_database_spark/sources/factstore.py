"""Bucket-partitioned fact-table layout + partition-scoped replace
(SURVEY.md §1.1 "partitioned by bucket(website_id)"; reference S3/S4/S5).

The reference's idempotent-reindex contract is delete-then-reimport per
website (tasks.py:114-129 driving search/search.py:91-176: scroll-delete by
website_id, then bulk import).  At 100 TB a whole-table rewrite per site is
not an option, so the fact table is laid out as parquet partitioned by
``bucket = pmod(website_id, N_BUCKETS)`` and a replace touches ONLY the
target bucket:

- reads prune to one partition directory (verified in tests via the file
  listing), so the job scans 1/N of the table;
- the write uses dynamic partition overwrite, so only that bucket's files
  are replaced — every other partition's files are byte-identical after.

With an Iceberg/Delta catalog the same operation is `replaceWhere
website_id = ?` / `overwritePartitions`; this module is the plain-parquet
equivalent with the same pruning and write-amplification properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 64


def bucket_of(website_id: int, n_buckets: int = N_BUCKETS) -> int:
    return website_id % n_buckets  # Python % matches Spark pmod for neg ids


def write_files_bucketed(
    files: DataFrame, path: str, n_buckets: int = N_BUCKETS
) -> None:
    """Initial layout: one ``bucket=K`` partition dir per website_id bucket."""
    (
        files.withColumn(
            "bucket", F.pmod(F.col("website_id"), F.lit(n_buckets)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_files_bucketed(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def append_docs(files: DataFrame, path: str, n_buckets: int = N_BUCKETS) -> None:
    """S3 bulk index sink (search/search.py:136,152-176): append-only batch
    ingest into the bucketed layout — new files land in their website's
    bucket partition, existing files untouched.  The reference's 10k-doc
    bulk batching collapses into Spark's task batching; retries = task
    retries."""
    (
        files.withColumn(
            "bucket", F.pmod(F.col("website_id"), F.lit(n_buckets)).cast("int")
        )
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(path)
    )


def replace_website_docs_partitioned(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    website_id: int,
    n_buckets: int = N_BUCKETS,
) -> None:
    """S4+S5 as a TRUE partition overwrite: rebuild only the target bucket
    (keep every other website's rows in it, swap in ``new_docs``), then
    dynamically overwrite that single partition.

    The replacement bucket is materialized (localCheckpoint) before the
    write both to cut the read-your-own-target dependency and because the
    overwrite must not re-scan the directory it is replacing."""
    bucket = bucket_of(website_id, n_buckets)
    cur = spark.read.parquet(path).filter(F.col("bucket") == bucket)
    kept = cur.filter(F.col("website_id") != website_id).drop("bucket")
    repl = (
        kept.unionByName(new_docs)
        .withColumn("bucket", F.lit(bucket).cast("int"))
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        repl.write.mode("overwrite").partitionBy("bucket").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        repl.unpersist()
