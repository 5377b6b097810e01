"""Streaming ANN index maintenance: vector ingest keeps the persisted LSH /
IVF index tables (operators/ann_store.py) current incrementally, the same
way streaming/dedup.py keeps the seen set current — the reference's analog
is its indexer threads folding crawl results into the live ES index as they
arrive (tasks.py:93-112) rather than rebuilding per query.

Per micro-batch (foreachBatch):
  1. in-batch dedup on vec_id,
  2. exact anti-join against the index's existing vec_ids (replay safety:
     foreachBatch is at-least-once, so a batch can re-run after a crash —
     on replay every vector is already indexed, the anti-join drains the
     batch and the appends are no-ops),
  3. first batch ever BUILDS the tables (for IVF that is where the coarse
     quantizer trains — deterministic seeds + fixed Lloyd over the first
     batch; later vectors assign to the FROZEN centroids, the standard IVF
     append path; retraining is a rebuild decision, not an append),
  4. later batches append through ann_store.append_lsh_vectors /
     append_ivf_vectors, which preserve the bucket/partition layout (one
     file set per catalog bucket per append, inverted lists land in their
     cell partitions) — so lookups and co-located self-joins keep their
     plan properties as the stream grows.

The anti-join cost is bounded: at 10^10 vectors the vec_id probe reads one
slim column of the bucketed index; a production deployment would anti-join
against the LSH table only (the IVF cells hold the same id set by
construction), which is what this sink does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators import ann_store

EMB_STREAM = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


def stream_embeddings(spark: SparkSession, in_dir: str) -> DataFrame:
    """File-source stream of embedding rows (one JSON object per line)."""
    return (
        spark.readStream.schema(EMB_STREAM)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )


def index_sink(
    lsh_table: str,
    ivf_tables: tuple[str, str] | None = None,
    n_buckets: int = ann_store.N_BUCKETS,
):
    """foreachBatch sink implementing the incremental index protocol above.
    ``ivf_tables`` is (centroids_table, cells_table) to co-maintain the IVF
    index from the same stream; None maintains only the LSH table."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates(["vec_id"])
        if not spark.catalog.tableExists(lsh_table):
            batch = batch.localCheckpoint(eager=True)  # build reads it twice
            ann_store.build_lsh_table(batch, lsh_table, n_buckets)
            if ivf_tables is not None:
                ann_store.build_ivf_tables(batch, *ivf_tables)
            return
        seen_ids = spark.table(lsh_table).select("vec_id").distinct()
        new = batch.join(seen_ids, on="vec_id", how="left_anti").localCheckpoint(
            eager=True
        )
        ann_store.append_lsh_vectors(new, lsh_table, n_buckets)
        if ivf_tables is not None:
            ann_store.append_ivf_vectors(new, *ivf_tables)

    return sink


def run_stream_index(
    spark: SparkSession,
    in_dir: str,
    lsh_table: str,
    checkpoint_dir: str,
    ivf_tables: tuple[str, str] | None = None,
):
    """Drain everything currently available through the index sink and stop
    (availableNow) — call again after more vectors land; the streaming
    checkpoint assigns later files to later epochs and the index tables
    carry the state across invocations."""
    q = (
        stream_embeddings(spark, in_dir)
        .writeStream.foreachBatch(index_sink(lsh_table, ivf_tables))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
