"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10 extension; north-rule "checkpointed frontier state" as a
continuous stream).

The reference's central server keeps per-website running counters while
crawl results stream in (tasks.py:93-129 polling loop + the website stats it
maintains).  The streaming-native form is a keyed stateful aggregation: one
state cell per host carrying (urls_total, batches_seen), updated per
micro-batch through Arrow — the applyInPandasWithState path Spark provides
for operators its built-in windowed aggs can't express (cumulative,
non-windowed, emitted every batch).

State is Spark-managed (HDFS/RocksDB state store on a cluster), so the
operator resumes from the streaming checkpoint exactly like the batch
crawl's parquet rounds.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

HOST_PROGRESS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("urls_total", T.LongType(), False),
        T.StructField("batches_seen", T.LongType(), False),
        T.StructField("batch_urls", T.LongType(), False),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("urls_total", T.LongType(), False),
        T.StructField("batches_seen", T.LongType(), False),
    ]
)


def _update_host(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch_urls = 0
    for pdf in pdfs:
        batch_urls += len(pdf)
    if state.exists:
        urls_total, batches_seen = state.get
    else:
        urls_total, batches_seen = 0, 0
    urls_total += batch_urls
    batches_seen += 1
    state.update((urls_total, batches_seen))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "urls_total": [urls_total],
            "batches_seen": [batches_seen],
            "batch_urls": [batch_urls],
        }
    )


def host_progress_stream(url_stream: DataFrame) -> DataFrame:
    """Per-host cumulative crawl progress over a streaming DataFrame that
    carries a ``host`` column: emits one row per (host, micro-batch) with the
    running totals.  Arrow-batched; one state cell per host."""
    return url_stream.groupBy("host").applyInPandasWithState(
        _update_host,
        outputStructType=HOST_PROGRESS,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
