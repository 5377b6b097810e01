"""Streaming ANN index maintenance: incremental ingest through foreachBatch
must leave the LSH/IVF tables equal to a from-scratch rebuild, stay
idempotent under epoch replay, and survive two-invocation (availableNow)
drains."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from od_database_spark.operators import ann_store as AS
from od_database_spark.streaming import index_maintenance as IM


@pytest.fixture()
def env(spark):
    d = tempfile.mkdtemp(prefix="oddb_sindex_")
    tables = ("stream_lsh_test", "stream_ivf_cents_test", "stream_ivf_cells_test")
    for t in tables:
        AS._drop_stale(spark, t)
    yield d, tables
    for t in tables:
        AS._drop_stale(spark, t)
    shutil.rmtree(d, ignore_errors=True)


def _vec(i):
    # deterministic small vectors, ANN_DIM components
    from od_database_spark.queries import ANN_DIM

    return [((i * 31 + j * 7) % 19 - 9) / 10.0 for j in range(ANN_DIM)]


def _write_batch(in_dir, name, ids):
    os.makedirs(in_dir, exist_ok=True)
    with open(os.path.join(in_dir, name), "w") as f:
        for i in ids:
            f.write(json.dumps({"vec_id": i, "embedding": _vec(i)}) + "\n")


def _table_set(spark, name, cols):
    return sorted(map(tuple, spark.table(name).select(*cols).collect()))


def test_streamed_index_equals_full_rebuild(spark, env):
    d, (lsh, cents, cells) = env
    in_dir, ckpt = f"{d}/in", f"{d}/ckpt"
    _write_batch(in_dir, "b1.json", range(0, 40))
    IM.run_stream_index(spark, in_dir, lsh, ckpt, ivf_tables=(cents, cells))
    # read BETWEEN drains on purpose: foreachBatch appends happen in a
    # cloned session, and a pre-append read in THIS session would pin a
    # stale file listing without the runner's refreshTable (regression)
    from od_database_spark.queries import ANN_BANDS as _B

    assert spark.table(lsh).count() == 40 * _B
    _write_batch(in_dir, "b2.json", range(30, 70))  # 10 repeats + 30 new
    IM.run_stream_index(spark, in_dir, lsh, ckpt, ivf_tables=(cents, cells))
    assert spark.table(lsh).count() == 70 * _B  # the appended rows are visible

    all_ids = list(range(70))
    full = spark.createDataFrame(
        [(i, _vec(i)) for i in all_ids], "vec_id long, embedding array<float>"
    )
    # LSH: streamed table == full rebuild (set equality on the keyed rows)
    AS.build_lsh_table(full, "stream_lsh_ref")
    try:
        assert _table_set(spark, lsh, ["vec_id", "bucket"]) == _table_set(
            spark, "stream_lsh_ref", ["vec_id", "bucket"]
        )
    finally:
        AS._drop_stale(spark, "stream_lsh_ref")

    # IVF: every vector present exactly once, assigned to the FROZEN
    # first-batch centroids (the standard append contract — a full rebuild
    # would retrain the quantizer on all 70, a different index by design)
    got = {r["vec_id"]: r["cell"] for r in spark.table(cells).collect()}
    assert sorted(got) == all_ids
    want = {
        r["vec_id"]: r["cell"]
        for r in AS._assign_cells(full, spark.table(cents)).collect()
    }
    assert got == want


def test_cross_session_resume_recovers_index_tables(spark, env):
    """The index tables are durable state: after a session restart (catalog
    lost, warehouse files surviving) the sink must re-register them — not
    crash with LOCATION_ALREADY_EXISTS and not re-train the quantizer over
    one batch — so later batches keep appending to the same index."""
    import shutil as sh
    from urllib.parse import urlparse

    d, (lsh, cents, cells) = env
    in_dir, ckpt = f"{d}/in", f"{d}/ckpt"
    _write_batch(in_dir, "b1.json", range(0, 40))
    IM.run_stream_index(spark, in_dir, lsh, ckpt, ivf_tables=(cents, cells))
    cents_before = {
        r["cent_id"]: list(r["cent"]) for r in spark.table(cents).collect()
    }

    def loc(table):
        return urlparse(
            spark.conf.get("spark.sql.warehouse.dir").rstrip("/") + "/" + table
        ).path

    # simulate session death: files survive, catalog entries do not
    for table in (lsh, cents, cells):
        sh.copytree(loc(table), f"{d}/stash_{table}")
        spark.sql(f"DROP TABLE {table}")
        sh.copytree(f"{d}/stash_{table}", loc(table))
        assert not spark.catalog.tableExists(table)

    _write_batch(in_dir, "b2.json", range(30, 60))  # 10 repeats + 20 new
    IM.run_stream_index(spark, in_dir, lsh, ckpt, ivf_tables=(cents, cells))
    from od_database_spark.queries import ANN_BANDS

    assert spark.table(lsh).count() == 60 * ANN_BANDS  # repeats suppressed
    assert spark.table(cells).count() == 60
    # the quantizer was NOT retrained: same centroids as before the restart
    cents_after = {
        r["cent_id"]: list(r["cent"]) for r in spark.table(cents).collect()
    }
    assert cents_after == cents_before


def test_replay_heals_crash_between_lsh_and_ivf_writes(spark, env):
    """The LSH and IVF writes are not one atomic commit: an epoch that
    crashes after the LSH build but before the IVF build replays (foreach-
    Batch commits the epoch only after the sink returns), and the replay
    must BUILD the missing IVF side from the same batch — not drain the
    batch against the LSH table and leave the IVF index forever unbuildable."""
    d, (lsh, cents, cells) = env
    b1 = spark.createDataFrame(
        [(i, _vec(i)) for i in range(30)], "vec_id long, embedding array<float>"
    )
    # simulate the crash: only the LSH write of epoch 0 landed
    AS.build_lsh_table(b1, lsh)
    sink = IM.index_sink(lsh, ivf_tables=(cents, cells))
    sink(b1, 0)  # replay of the torn epoch
    from od_database_spark.queries import ANN_BANDS

    assert spark.table(lsh).count() == 30 * ANN_BANDS  # drained, no dup
    assert spark.table(cells).count() == 30  # IVF built on replay
    # ...and a crash between APPEND epochs heals the same way
    b2 = spark.createDataFrame(
        [(i, _vec(i)) for i in range(30, 50)], "vec_id long, embedding array<float>"
    )
    AS.append_lsh_vectors(b2, lsh)  # epoch 1 crashed after the LSH append
    sink(b2, 1)  # replay
    assert spark.table(lsh).count() == 50 * ANN_BANDS
    assert spark.table(cells).count() == 50  # the batch's vectors NOT lost


def test_torn_build_leftovers_do_not_register_empty_table(spark, env):
    """A location holding only a torn build's _temporary droppings must not
    be recovered as an (empty) table — that would make the build branch
    unreachable; the garbage is cleaned and the build proceeds."""
    import os
    from urllib.parse import urlparse

    d, (lsh, cents, cells) = env
    loc = urlparse(AS._table_dir(spark, lsh)).path
    os.makedirs(f"{loc}/_temporary/0", exist_ok=True)
    with open(f"{loc}/_temporary/0/part-stub", "w") as f:
        f.write("torn")
    sink = IM.index_sink(lsh, ivf_tables=(cents, cells))
    b1 = spark.createDataFrame(
        [(i, _vec(i)) for i in range(10)], "vec_id long, embedding array<float>"
    )
    sink(b1, 0)
    from od_database_spark.queries import ANN_BANDS

    assert spark.table(lsh).count() == 10 * ANN_BANDS  # built, not empty
    assert spark.table(cells).count() == 10


def test_index_sink_replay_is_idempotent(spark, env):
    d, (lsh, cents, cells) = env
    sink = IM.index_sink(lsh, ivf_tables=(cents, cells))
    b1 = spark.createDataFrame(
        [(i, _vec(i)) for i in range(30)], "vec_id long, embedding array<float>"
    )
    sink(b1, 0)
    from od_database_spark.queries import ANN_BANDS

    assert spark.table(lsh).count() == 30 * ANN_BANDS
    sink(b1, 0)  # replay of the BUILD epoch
    assert spark.table(lsh).count() == 30 * ANN_BANDS
    assert spark.table(cells).count() == 30
    b2 = spark.createDataFrame(
        [(i, _vec(i)) for i in range(20, 50)], "vec_id long, embedding array<float>"
    )
    sink(b2, 1)
    sink(b2, 1)  # replay of an APPEND epoch
    assert spark.table(lsh).count() == 50 * ANN_BANDS
    assert spark.table(cells).count() == 50
    assert spark.table(lsh).select("vec_id").distinct().count() == 50


def test_replay_dedup_plan_never_shuffles_the_index(spark, env):
    """The r6 replay-dedup restructure: per-epoch duplicate filtering must
    not exchange the index side (the old batch-LEFT-ANTI-distinct shuffled
    the whole index by vec_id every micro-batch — O(history)/epoch).  The
    plan for one epoch's 'new vectors' frame must show the index scans only
    under broadcast/semi probes: no Exchange hashpartitioning(vec_id) over
    the table scan."""
    import re

    d, (lsh, cents, cells) = env
    rows = [(i, _vec(i)) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    AS.build_lsh_table(emb, lsh)
    sink_fn = IM.index_sink(lsh)  # closure exposes _drop_already_indexed shape
    # reproduce the sink's frame directly (same code path builds it)
    batch = emb.limit(20)
    batch_ids = batch.select("vec_id")
    hits = (
        spark.table(lsh).select("vec_id")
        .join(F.broadcast(batch_ids), on="vec_id", how="left_semi")
    )
    new = batch.join(F.broadcast(hits), on="vec_id", how="left_anti")
    plan = new._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\(vec_id[^\n]*", plan)
    assert not exchanges, exchanges
    assert new.count() == 0  # all 20 already indexed

    # and the semantics: half-new batch appends exactly the new half
    batch2 = spark.createDataFrame(
        [(i, _vec(i)) for i in range(30, 50)], "vec_id long, embedding array<float>"
    )
    sink_fn(batch2, epoch_id=7)
    got = {r["vec_id"] for r in spark.table(lsh).select("vec_id").distinct().collect()}
    assert got == set(range(50))
