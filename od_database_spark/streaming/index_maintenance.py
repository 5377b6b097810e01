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


def _recover_index_tables(
    spark: SparkSession,
    lsh_table: str,
    ivf_tables: tuple[str, str] | None,
    n_buckets: int,
) -> bool:
    """Cross-session resume: like the streaming seen table
    (streaming/dedup.py), the index tables are DURABLE state whose files
    survive a session while the in-memory catalog does not — a naive
    first-batch build would then CREATE over the surviving location and die
    with LOCATION_ALREADY_EXISTS (or worse, re-train the quantizer over one
    batch).  When the catalog entry is missing but the location holds
    files, re-register each table with its original layout (bucket spec for
    the LSH table, partition recovery for the IVF inverted lists).
    Returns True iff the index exists (pre-existing or recovered)."""
    from ..operators.ann_store import _fs, _table_dir

    def surviving(name: str) -> bool:
        loc = _table_dir(spark, name)
        fs, jpath = _fs(spark, loc)
        return bool(fs.exists(jpath) and fs.listStatus(jpath))

    if spark.catalog.tableExists(lsh_table):
        return True
    if not surviving(lsh_table):
        return False
    loc = _table_dir(spark, lsh_table)
    spark.sql(
        f"""CREATE TABLE {lsh_table} (vec_id BIGINT, bucket STRING)
            USING parquet
            CLUSTERED BY (bucket) SORTED BY (bucket) INTO {n_buckets} BUCKETS
            LOCATION '{loc}'"""
    )
    if ivf_tables is not None:
        cents_name, cells_name = ivf_tables
        if not spark.catalog.tableExists(cents_name) and surviving(cents_name):
            spark.sql(
                f"CREATE TABLE {cents_name} (cent_id BIGINT, cent ARRAY<DOUBLE>) "
                f"USING parquet LOCATION '{_table_dir(spark, cents_name)}'"
            )
        if not spark.catalog.tableExists(cells_name) and surviving(cells_name):
            spark.sql(
                f"""CREATE TABLE {cells_name}
                    (vec_id BIGINT, embedding ARRAY<FLOAT>, cell BIGINT)
                    USING parquet PARTITIONED BY (cell)
                    LOCATION '{_table_dir(spark, cells_name)}'"""
            )
            spark.sql(f"MSCK REPAIR TABLE {cells_name}")
    return True


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
        if not _recover_index_tables(spark, lsh_table, ivf_tables, n_buckets):
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
    # foreachBatch runs in a CLONED SparkSession whose inserts invalidate
    # only the clone's relation cache — a caller that read the table before
    # this drain keeps a stale file listing and silently misses the appended
    # rows.  Refresh in the caller's session so its next read re-lists.
    for name in (lsh_table, *(ivf_tables or ())):
        if spark.catalog.tableExists(name):
            spark.catalog.refreshTable(name)
    return q
