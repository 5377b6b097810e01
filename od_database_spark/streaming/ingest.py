"""Structured-Streaming wrapper over the batch ingest (SURVEY.md §1.4/§2.10).

The reference has no true stream — indexer threads poll the task tracker
every 5 s (tasks.py:93-112).  The streaming analog is a file-source stream
over the NDJSON upload directory with ``Trigger.AvailableNow``-style
semantics: each micro-batch applies the same delete-then-reimport contract
through foreachBatch, giving exactly-once table maintenance the reference's
retry loop only approximates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urls import ext_from_name, name_root
from ..sources.ndjson import RAW_LINE

# upload filename contract: {website_id}_{token}.NDJSON (tasks.py:175-176) —
# website_id is recovered from the file path, so one stream serves all sites
_FNAME_RE = r"([0-9]+)_[^/]*$"


def stream_crawl_results(spark: SparkSession, upload_dir: str) -> DataFrame:
    """readStream over the upload dir; derives ext/name and website_id the
    same way the batch path does (search/search.py:141-148)."""
    raw = (
        spark.readStream.schema(RAW_LINE)
        .option("maxFilesPerTrigger", 16)
        .json(upload_dir)
        .withColumn("_file", F.input_file_name())
    )
    return raw.filter(F.col("name").isNotNull()).select(
        F.regexp_extract(F.col("_file"), _FNAME_RE, 1).cast("long").alias("website_id"),
        F.coalesce(F.col("path"), F.lit("")).alias("path"),
        name_root(F.col("name")).alias("name"),
        ext_from_name(F.col("name")).alias("ext"),
        F.col("size"),
        F.to_timestamp(F.from_unixtime(F.col("mtime"))).alias("mtime"),
    )


def run_available_now(stream_df: DataFrame, sink_fn, checkpoint_dir: str):
    """Drain everything currently available through foreachBatch and stop —
    the polling loop's batch-equivalent.  ``sink_fn(batch_df, epoch_id)``
    applies the delete-then-reimport contract per site."""
    q = (
        stream_df.writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
