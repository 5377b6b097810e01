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


def _committed_files(spark: SparkSession, name: str) -> bool:
    """True iff the table location holds COMMITTED output (any entry not
    starting with '_'/'.') — a torn build leaves only ``_temporary``
    droppings, which must NOT be re-registered as an empty table (that would
    make the build branch unreachable forever).  A torn-only location is
    deleted so the build path can recreate it cleanly."""
    from ..operators.ann_store import _fs, _table_dir

    loc = _table_dir(spark, name)
    fs, jpath = _fs(spark, loc)
    if not fs.exists(jpath):
        return False
    entries = fs.listStatus(jpath)
    if any(not s.getPath().getName().startswith(("_", ".")) for s in entries):
        return True
    fs.delete(jpath, True)  # only uncommitted garbage at this location
    return False


def _have_table(spark: SparkSession, name: str, ddl: str, repair: bool = False) -> bool:
    """The table is usable: registered in the catalog, or recoverable from
    surviving COMMITTED files (cross-session resume — the in-memory catalog
    forgets tables the warehouse keeps; a naive re-CREATE would die with
    LOCATION_ALREADY_EXISTS, or worse re-train the quantizer over one
    batch).  Returns False when there is genuinely no prior state."""
    if spark.catalog.tableExists(name):
        return True
    if not _committed_files(spark, name):
        return False
    from ..operators.ann_store import _table_dir

    spark.sql(ddl.format(name=name, loc=_table_dir(spark, name)))
    if repair:
        spark.sql(f"MSCK REPAIR TABLE {name}")
    return True


def index_sink(
    lsh_table: str,
    ivf_tables: tuple[str, str] | None = None,
    n_buckets: int = ann_store.N_BUCKETS,
):
    """foreachBatch sink implementing the incremental index protocol above.
    ``ivf_tables`` is (centroids_table, cells_table) to co-maintain the IVF
    index from the same stream; None maintains only the LSH table.

    The LSH and IVF writes are NOT one atomic commit, so the build-vs-append
    decision and the replay anti-join run PER STRUCTURE: a crash between the
    LSH and IVF writes replays the epoch (foreachBatch is at-least-once and
    only commits the epoch after the sink returns), the already-written
    structure drains through its own anti-join, and the missing one builds
    or appends from the same replayed batch — keyed on one structure alone,
    the replay would drain the batch against the LSH table and the IVF
    side would either never be built or silently lose the batch's vectors."""
    lsh_ddl = (
        "CREATE TABLE {name} (vec_id BIGINT, bucket STRING) USING parquet "
        f"CLUSTERED BY (bucket) SORTED BY (bucket) INTO {n_buckets} BUCKETS "
        "LOCATION '{loc}'"
    )
    cents_ddl = (
        "CREATE TABLE {name} (cent_id BIGINT, cent ARRAY<DOUBLE>) "
        "USING parquet LOCATION '{loc}'"
    )
    cells_ddl = (
        "CREATE TABLE {name} (vec_id BIGINT, embedding ARRAY<FLOAT>, cell BIGINT) "
        "USING parquet PARTITIONED BY (cell) LOCATION '{loc}'"
    )

    def _drop_already_indexed(spark, batch: DataFrame, table: str) -> DataFrame:
        """Replay dedup with ZERO index-side exchange (r6, guide §2.4/§3.2):
        the former ``batch LEFT ANTI (index ids DISTINCT)`` shuffled the
        ENTIRE index by vec_id every micro-batch — O(history) network per
        epoch, exactly the pattern the bucketed seen store exists to avoid.
        The micro-batch is bounded (maxFilesPerTrigger), so instead probe
        the index scan with a BROADCAST semi-join on the batch's ids (index
        side streams map-side, column-pruned to vec_id) and anti-join the
        (≤ batch-sized) hit list back — per-epoch cost is O(index scan) +
        O(batch), no index shuffle, identical output."""
        from pyspark.sql import functions as F

        batch_ids = batch.select("vec_id")
        # no distinct on the hit list: duplicate keys are harmless to a
        # left_anti probe, and dropping it removes the last exchange — the
        # whole replay filter is exchange-free
        hits = (
            spark.table(table)
            .select("vec_id")
            .join(F.broadcast(batch_ids), on="vec_id", how="left_semi")
        )
        return batch.join(F.broadcast(hits), on="vec_id", how="left_anti")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates(["vec_id"]).localCheckpoint(eager=True)
        if _have_table(spark, lsh_table, lsh_ddl):
            new = _drop_already_indexed(spark, batch, lsh_table)
            ann_store.append_lsh_vectors(new, lsh_table, n_buckets)
        else:
            ann_store.build_lsh_table(batch, lsh_table, n_buckets)
        if ivf_tables is not None:
            cents_name, cells_name = ivf_tables
            if _have_table(spark, cents_name, cents_ddl) and _have_table(
                spark, cells_name, cells_ddl, repair=True
            ):
                new_c = _drop_already_indexed(spark, batch, cells_name)
                ann_store.append_ivf_vectors(new_c, cents_name, cells_name)
            else:
                # first build OR replay of a torn first build: both rebuild
                # from the SAME replayed batch (mode=overwrite), so a crash
                # between the cents and cells writes heals on retry
                ann_store.build_ivf_tables(batch, cents_name, cells_name)
        batch.unpersist()

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
