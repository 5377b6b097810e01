"""Small scalar parity utilities (SURVEY.md §2.8 X3/X7) + query-log append
(S8 SearchLogEntry analog, init_script.sql:28-39 / database.py:302-313)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schema


def truncate_path(path: str, max_len: int) -> str:
    """X3 semantics (od_util.py:20-27): collapse i leading directories into
    '.../' each, for the smallest i whose result fits max_len; when nothing
    fits, '.../'+basename; paths without '/' come back unchanged.  Quirks
    preserved: an optional leading '/' folds into the first collapsed
    segment, and each collapsed segment contributes its own '.../'.
    (Re-expressed as a segment join; the reference iterates a regex sub.)"""
    if "/" not in path:
        return path
    segs = path.lstrip("/").split("/")
    for i in range(1, path.count("/")):
        candidate = ".../" * i + "/".join(segs[i:])
        if len(candidate) < max_len:
            return candidate
    return ".../" + path.rsplit("/", maxsplit=1)[1]


def format_date_col(ts: Column) -> Column:
    """X7 (template_filters.py:13-19): render a timestamp for display."""
    return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")


def format_duration_col(seconds: Column) -> Column:
    """X7 (template_filters.py:22-35): humanized duration."""
    return (
        F.when(seconds < 60, F.concat(seconds.cast("long"), F.lit("s")))
        .when(seconds < 3600, F.concat(F.floor(seconds / 60).cast("long"), F.lit("m")))
        .when(seconds < 86400, F.concat(F.floor(seconds / 3600).cast("long"), F.lit("h")))
        .otherwise(F.concat(F.floor(seconds / 86400).cast("long"), F.lit("d")))
    )


def log_search(
    spark: SparkSession,
    remote_addr: str,
    forwarded_for: str | None,
    q: str,
    extensions: list[str],
    page: int,
    blocked: bool,
    results: int,
    took_ms: int,
) -> DataFrame:
    """One append-ready query_log row (database.py:302-313: extensions are
    comma-joined).  Caller unions/appends it to the query_log table."""
    return spark.createDataFrame(
        [
            (
                None,
                remote_addr,
                forwarded_for,
                q,
                ",".join(extensions),
                page,
                blocked,
                results,
                took_ms,
            )
        ],
        schema.QUERY_LOG,
    ).withColumn("search_time", F.current_timestamp())
