"""Persisted ANN index tables (operators/ann_store.py): build-once /
query-many semantics plus the plan properties that make the index worth
persisting — pushed bucket filters, co-located self-joins, and dynamic
partition pruning on the IVF cells."""

import re

import pytest
from pyspark.sql import functions as F

from od_database_spark.operators import ann_store as AS
from od_database_spark.plans import explain as PL
from od_database_spark.queries import ANN_BANDS, REGISTRY, t


@pytest.fixture(scope="module", autouse=True)
def _clean_tables(spark, sf_dir):
    yield
    key = AS._key(sf_dir)
    for name in (
        f"ann_buckets_{key}", f"ivf_cents_{key}", f"ivf_cells_{key}",
        f"simhash_fps_{key}", f"text_lsh_{key}", f"text_shingles_{key}",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        AS._forget(name)


def test_lsh_index_build_once_and_rebuild_on_mismatch(spark, sf_dir):
    name = AS.ensure_lsh_index(spark, sf_dir)
    n = t(spark, sf_dir, "embeddings").count()
    assert spark.table(name).count() == n * ANN_BANDS
    # second call is a memo hit — no rebuild (table object identity can't be
    # asserted; assert the validation memo instead)
    assert any(k[1] == name for k in AS._VALIDATED)
    assert AS.ensure_lsh_index(spark, sf_dir) == name
    # a stale table (wrong row count, e.g. source regenerated) rebuilds
    AS._forget(name)
    spark.sql(f"DROP TABLE {name}")
    AS._drop_stale(spark, name)
    spark.createDataFrame([(1, "0:0")], "vec_id long, bucket string").write.mode(
        "overwrite"
    ).format("parquet").saveAsTable(name)
    assert AS.ensure_lsh_index(spark, sf_dir) == name
    assert spark.table(name).count() == n * ANN_BANDS


def test_source_signature_triggers_rebuild(spark, sf_dir, tmp_path):
    """Regenerating the source IN PLACE with the same row count must rebuild
    the index — a count-only check would serve stale buckets for new data."""
    import shutil as sh

    src = str(tmp_path / "sfcopy")
    import os

    os.makedirs(src)
    src_pq = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(src_pq):
        sh.copytree(src_pq, f"{src}/embeddings.parquet")
    else:
        sh.copy(src_pq, f"{src}/embeddings.parquet")
    name = AS.ensure_lsh_index(spark, src)
    first = AS._read_sig(spark, name)
    assert first is not None
    # same rows, new file mtimes — the signature must change and ensure_*
    # must rebuild (memo AND sidecar both invalidated)
    emb = spark.read.parquet(f"{src}/embeddings.parquet").localCheckpoint(eager=True)
    if os.path.isdir(f"{src}/embeddings.parquet"):
        sh.rmtree(f"{src}/embeddings.parquet")
    else:
        os.remove(f"{src}/embeddings.parquet")
    emb.write.parquet(f"{src}/embeddings.parquet")
    assert AS._source_sig(spark, src, "embeddings") != first
    name2 = AS.ensure_lsh_index(spark, src)
    assert name2 == name
    assert AS._read_sig(spark, name) != first  # rebuilt against new source
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    AS._forget(name)


def test_bucket_search_reads_index_with_pushed_bucket_filter(spark, sf_dir):
    """The corpus side must NOT recompute bucket keys at query time: the
    only scans in the plan are (a) the index table with a pushed In(bucket)
    literal filter and (b) vec_id-filtered embeddings scans (the query row
    and the candidate join-back)."""
    fn, _ = REGISTRY["embedding_bucket_search"]
    plan = PL.plan_string(fn(spark, sf_dir))
    assert "ann_buckets_" in plan
    assert re.search(r"PushedFilters:.*In\(bucket", plan), plan
    assert "EqualTo(vec_id,0)" in plan  # the 1-row query-vector scan


def test_batch_ann_bucket_self_join_is_colocated(spark, sf_dir):
    """Both sides of the candidate join read the bucketed index table; with
    broadcast disabled the join must be exchange-free on both inputs (the
    only shuffles are the pair-distinct and the final ordering)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fn, _ = REGISTRY["embedding_batch_ann"]
        plan = PL.plan_string(fn(spark, sf_dir), "simple")
        assert plan.count("Bucketed: true") >= 2, plan
        ex = re.findall(r"Exchange (?:hash|range)partitioning\([^\n]*", plan)
        assert ex  # pair-distinct at minimum
        assert all("bucket" not in line for line in ex), ex
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ivf_probe_prunes_cells(spark, sf_dir):
    """The cells scan must carry a dynamic-partition-pruning filter on cell
    (only the nprobe probed inverted lists are read) and need no join back
    to the base table for the candidate embeddings."""
    fn, _ = REGISTRY["embedding_ivf_search"]
    plan = PL.plan_string(fn(spark, sf_dir))
    assert "ivf_cells_" in plan
    assert "dynamicpruning" in plan, plan
    assert "SortMergeJoin" not in plan


def test_text_lsh_store_matches_inline_and_join_colocated(spark, sf_dir):
    """The persisted band table equals an inline signature pass, the
    minhash_lsh candidate self-join reads it on both sides, and with
    broadcast disabled the join is exchange-free (bucketed both sides)."""
    from od_database_spark.queries import _minhash_bands, t as load

    name = AS.ensure_text_lsh_index(spark, sf_dir)
    inline = _minhash_bands(load(spark, sf_dir, "documents"))
    assert spark.table(name).exceptAll(inline).count() == 0
    assert inline.exceptAll(spark.table(name)).count() == 0
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fn, _ = REGISTRY["minhash_lsh"]
        plan = PL.plan_string(fn(spark, sf_dir), "simple")
        assert plan.count("Bucketed: true") >= 2, plan
        ex = re.findall(r"Exchange (?:hash|range)partitioning\([^\n]*", plan)
        assert all("bucket" not in line for line in ex), ex
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_shingle_store_matches_inline(spark, sf_dir):
    """The persisted inverted index holds exactly the distinct word-3-gram
    shingles per document, and the Jaccard verify reads it (no text split
    in the query plan)."""
    from pyspark.sql import functions as F2
    from od_database_spark.queries import t as load

    name = AS.ensure_shingle_index(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    words = F2.filter(F2.split("text", " "), lambda w: w != "")
    inline = docs.select(
        "doc_id",
        F2.explode(
            F2.array_distinct(
                F2.transform(
                    F2.sequence(F2.lit(1), F2.greatest(F2.size(words) - 2, F2.lit(0))),
                    lambda i: F2.concat_ws(" ", F2.slice(words, i, 3)),
                )
            )
        ).alias("shingle"),
    )
    assert spark.table(name).exceptAll(inline).count() == 0
    assert inline.exceptAll(spark.table(name)).count() == 0
    fn, _ = REGISTRY["ngram_jaccard"]
    plan = PL.plan_string(fn(spark, sf_dir))
    assert "text_shingles_" in plan
    assert "documents.parquet" not in plan  # nothing re-splits text


def test_simhash_store_matches_inline_and_prunes(spark, sf_dir):
    """Persisted fingerprints are bit-identical to an inline simhash pass,
    and the neardup query path reads the store (no text hashing at query
    time — the plan scans the fingerprint table, not documents.parquet)."""
    from od_database_spark.operators.dedup import simhash
    from od_database_spark.queries import t as load

    name = AS.ensure_simhash_index(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    inline = {r["doc_id"]: r["simhash"] for r in simhash(docs, "text", "doc_id").collect()}
    stored = {r["doc_id"]: r["simhash"] for r in spark.table(name).collect()}
    assert stored == inline
    fn, _ = REGISTRY["simhash_neardup"]
    plan = PL.plan_string(fn(spark, sf_dir))
    assert "simhash_fps_" in plan
    assert "documents.parquet" not in plan


def test_incremental_append_equals_full_rebuild(spark, sf_dir):
    """Appending a vector delta must leave both index tables equal to a
    from-scratch build over the grown corpus (IVF assigns new vectors to the
    FROZEN centroids, so equality needs the same centroid set — guaranteed
    here because the base corpus contains the deterministic selection)."""
    emb = t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 3)
    delta = emb.filter(F.col("vec_id") % 5 == 3)
    lsh_tbl, cents_tbl, cells_tbl = "lsh_inc_test", "ivf_cents_inc_test", "ivf_cells_inc_test"
    for name in (lsh_tbl, cents_tbl, cells_tbl):
        AS._drop_stale(spark, name)
    try:
        AS.build_lsh_table(base, lsh_tbl)
        AS.append_lsh_vectors(delta, lsh_tbl)
        from od_database_spark.operators.dedup import ann_band_buckets

        full = emb.select(
            "vec_id", F.explode(ann_band_buckets(F.col("embedding"))).alias("bucket")
        )
        assert spark.table(lsh_tbl).exceptAll(full).count() == 0
        assert full.exceptAll(spark.table(lsh_tbl)).count() == 0

        # IVF: build on the FULL corpus's centroid selection, cells on base,
        # then append the delta — cells must equal a full build
        AS.build_ivf_tables(emb, cents_tbl, cells_tbl)
        ref = spark.table(cells_tbl).select("vec_id", "cell").collect()
        want = {r["vec_id"]: r["cell"] for r in ref}
        AS._drop_stale(spark, cells_tbl)  # centroids table stays
        # rebuild cells from base only, then append the delta
        AS.append_ivf_vectors(base, cents_tbl, cells_tbl)
        AS.append_ivf_vectors(delta, cents_tbl, cells_tbl)
        got = {
            r["vec_id"]: r["cell"]
            for r in spark.table(cells_tbl).select("vec_id", "cell").collect()
        }
        assert got == want
    finally:
        for name in (lsh_tbl, cents_tbl, cells_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_queries_fall_back_inline_without_store(spark, sf_dir, monkeypatch):
    """The persisted index is an optimization, never a requirement: with
    every ensure_* raising (read-only warehouse), each store-backed query
    must fall back to the inline computation and return IDENTICAL rows."""
    reps = [
        "minhash_lsh", "ngram_jaccard", "simhash", "simhash_neardup",
        "embedding_bucket_search", "embedding_batch_ann",
        "embedding_ivf_search", "embedding_neardup", "embedding_dedup_keep",
        "embedding_lsh_ann",
    ]
    normal = {}
    for name in reps:
        fn, _ = REGISTRY[name]
        normal[name] = sorted(map(tuple, fn(spark, sf_dir).collect()))

    import od_database_spark.queries as Q

    def boom(*a, **k):
        raise OSError("no writable warehouse")  # an ENVIRONMENTAL failure

    for ens in (
        "ensure_lsh_index", "ensure_ivf_index", "ensure_text_lsh_index",
        "ensure_shingle_index", "ensure_simhash_index",
    ):
        monkeypatch.setattr(AS, ens, boom)
    try:
        for name in reps:
            fn, _ = REGISTRY[name]
            got = sorted(map(tuple, fn(spark, sf_dir).collect()))
            assert got == normal[name], name
        # the fallback decision is memoized: every ensure_* failure for this
        # sf_dir is recorded once, later calls skip the doomed build attempt
        assert any(k[-1] == sf_dir for k in Q._STORE_FAILED)
    finally:
        Q._STORE_FAILED.clear()  # don't poison later tests' store usage
        Q._IVF_FALLBACK.clear()


def test_store_bug_surfaces_not_swallowed(spark, sf_dir, monkeypatch):
    """A NON-environmental failure in the index build (a genuine bug: schema
    drift, broken validation) must propagate — only IO/catalog errors may
    degrade to the inline fallback."""
    import od_database_spark.queries as Q

    def bug(*a, **k):
        raise AssertionError("schema drift — a build bug, not an env failure")

    monkeypatch.setattr(AS, "ensure_simhash_index", bug)
    try:
        fn, _ = REGISTRY["simhash"]
        with pytest.raises(AssertionError, match="schema drift"):
            fn(spark, sf_dir).collect()
    finally:
        Q._STORE_FAILED.clear()


def test_ivf_nprobe_recall_monotone_and_exact_at_k(spark, sf_dir):
    """IVF recall contract: top-5 overlap with brute-force cosine is
    NON-DECREASING in nprobe (the multi-probe knob buys recall), and at
    nprobe=K the search degenerates to brute force (identical top-5, same
    order).  At nprobe=2 on random synthetic gaussians recall is modest by
    design — the knob, not the default, is the guarantee."""
    from pyspark.sql import functions as F2

    from od_database_spark.queries import REGISTRY

    fn_bf, _ = REGISTRY["embedding_topk"]
    brute = [r["vec_id"] for r in fn_bf(spark, sf_dir).collect()][:5]

    e = t(spark, sf_dir, "embeddings")
    cents_tbl, cells_tbl = AS.ensure_ivf_index(spark, sf_dir)
    cells = spark.table(cells_tbl)
    qrow = e.filter(F2.col("vec_id") == 0)
    qv = qrow.select(F2.col("embedding").alias("qe"))
    dot = F2.aggregate(
        F2.zip_with("embedding", "qe", lambda x, y: x.cast("double") * y.cast("double")),
        F2.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F2.sqrt(
        F2.aggregate(
            F2.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F2.lit(0.0),
            lambda acc, v: acc + v,
        )
    )

    def top5(nprobe):
        qcells = AS.query_cells(qrow, spark.table(cents_tbl), nprobe=nprobe)
        cands = (
            cells.filter(F2.col("vec_id") != 0)
            .join(F2.broadcast(qcells), on=F2.col("cell") == F2.col("qc"))
            .crossJoin(F2.broadcast(qv))
        )
        out = (
            cands.select(
                "vec_id",
                F2.round(dot / (norm(F2.col("embedding")) * norm(F2.col("qe"))), 4).alias("cos"),
            )
            .orderBy(F2.desc("cos"), F2.asc("vec_id"))
            .limit(5)
        )
        return [r["vec_id"] for r in out.collect()]

    overlaps = [len(set(top5(np_)) & set(brute)) for np_ in (2, 8, 16)]
    assert overlaps == sorted(overlaps), overlaps  # recall monotone in nprobe
    assert top5(16) == brute  # exhaustive probe == brute force, exact order


def _copy_source(sf_dir, tmp_path, table="embeddings"):
    import os
    import shutil as sh

    src = str(tmp_path / "sfcopy")
    os.makedirs(src, exist_ok=True)
    src_pq = f"{sf_dir}/{table}.parquet"
    if os.path.isdir(src_pq):
        sh.copytree(src_pq, f"{src}/{table}.parquet")
    else:
        sh.copy(src_pq, f"{src}/{table}.parquet")
    return src


def _meta_fs_path(spark, name):
    from urllib.parse import urlparse

    return urlparse(AS._table_dir(spark, name)).path + "/_META"


def test_append_then_ensure_survives_revalidation(spark, sf_dir, tmp_path):
    """Appended vectors that are NOT in the source dir must survive a
    revalidation outside the in-session memo (the round-3 gap: appends
    never updated the row-count expectation, so the next cold ensure_* saw
    a mismatch and silently rebuilt the appends away)."""
    src = _copy_source(sf_dir, tmp_path)
    name = AS.ensure_lsh_index(spark, src)
    base_rows = spark.table(name).count()
    emb = t(spark, src, "embeddings")
    delta = emb.orderBy("vec_id").limit(3).select(
        (F.col("vec_id") + 10**9).alias("vec_id"), "embedding"
    )
    AS.append_lsh_vectors(delta, name)
    grown = base_rows + 3 * ANN_BANDS
    assert spark.table(name).count() == grown
    AS._VALIDATED.clear()  # simulate a fresh session's empty memo
    assert AS.ensure_lsh_index(spark, src) == name
    # NOT rebuilt: the appended rows are still there
    assert spark.table(name).count() == grown
    # same for the IVF inverted lists
    cents_tbl, cells_tbl = AS.ensure_ivf_index(spark, src)
    cells_base = spark.table(cells_tbl).count()
    AS.append_ivf_vectors(delta, cents_tbl, cells_tbl)
    AS._VALIDATED.clear()
    AS.ensure_ivf_index(spark, src)
    assert spark.table(cells_tbl).count() == cells_base + 3
    for n in (name, cents_tbl, cells_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        AS._forget(n)


def test_session_restart_recovers_index_without_rebuild(spark, sf_dir, tmp_path):
    """Catalog loss over surviving committed files must RE-REGISTER the
    index (schema + bucket/partition layout), not rebuild it: build-once /
    query-many has to hold across sessions.  Incl. the partitioned IVF
    cells (partition recovery) and validation-after-recovery (a stale
    survivor still rebuilds)."""
    import shutil as sh
    from urllib.parse import urlparse

    src = _copy_source(sf_dir, tmp_path)
    lsh = AS.ensure_lsh_index(spark, src)
    cents, cells = AS.ensure_ivf_index(spark, src)
    before = {
        lsh: sorted(map(tuple, spark.table(lsh).collect())),
        cells: sorted(map(tuple, spark.table(cells).select("vec_id", "cell").collect())),
    }

    stash_n = [0]

    def restart_loss(table):
        loc = urlparse(AS._table_dir(spark, table)).path
        stash_n[0] += 1
        stash = str(tmp_path / f"stash_{table}_{stash_n[0]}")
        sh.copytree(loc, stash)
        spark.sql(f"DROP TABLE {table}")  # managed DROP deletes files...
        sh.rmtree(loc, ignore_errors=True)  # ...external DROP leaves them
        sh.copytree(stash, loc)
        assert not spark.catalog.tableExists(table)

    for t_ in (lsh, cents, cells):
        restart_loss(t_)
    AS._VALIDATED.clear()

    # mark build entry points so a rebuild is detectable
    import unittest.mock as mock

    with mock.patch.object(AS, "build_lsh_table", side_effect=AssertionError("rebuilt")), \
         mock.patch.object(AS, "build_ivf_tables", side_effect=AssertionError("rebuilt")):
        assert AS.ensure_lsh_index(spark, src) == lsh
        assert AS.ensure_ivf_index(spark, src) == (cents, cells)
    assert sorted(map(tuple, spark.table(lsh).collect())) == before[lsh]
    assert (
        sorted(map(tuple, spark.table(cells).select("vec_id", "cell").collect()))
        == before[cells]
    )
    # stale survivor: corrupt the sig → recovery registers it, validation
    # rejects it, and the normal rebuild path runs
    meta = AS._read_meta(spark, lsh)
    restart_loss(lsh)
    AS._VALIDATED.clear()
    AS._write_meta(spark, lsh, "0" * 32, meta["rows"])
    assert AS.ensure_lsh_index(spark, src) == lsh  # rebuilds (no mock now)
    assert sorted(map(tuple, spark.table(lsh).collect())) == before[lsh]
    for t_ in (lsh, cents, cells):
        spark.sql(f"DROP TABLE IF EXISTS {t_}")
        AS._forget(t_)


def test_torn_meta_never_validates_stale(spark, sf_dir, tmp_path):
    """A sidecar write interrupted mid-way (partial JSON) must read as
    'untrusted' and trigger a rebuild — it may invalidate a good table
    (safe) but can never validate a stale one."""
    src = _copy_source(sf_dir, tmp_path)
    name = AS.ensure_lsh_index(spark, src)
    full = spark.table(name).count()
    meta_path = _meta_fs_path(spark, name)
    with open(meta_path, "w") as f:
        f.write('{"sig": "abcd1234", "ro')  # torn mid-write
    assert AS._read_meta(spark, name) is None
    AS._VALIDATED.clear()
    assert AS.ensure_lsh_index(spark, src) == name  # rebuilds
    assert spark.table(name).count() == full
    meta = AS._read_meta(spark, name)
    assert meta is not None and meta["rows"] == full  # sidecar healed
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    AS._forget(name)


def test_missing_meta_is_untrusted(spark, sf_dir, tmp_path):
    """A table without its sidecar (e.g. crash between table write and meta
    commit) must rebuild, not validate."""
    import os

    src = _copy_source(sf_dir, tmp_path)
    name = AS.ensure_lsh_index(spark, src)
    os.remove(_meta_fs_path(spark, name))
    AS._VALIDATED.clear()
    assert not AS._table_ok(spark, name, AS._source_sig(spark, src, "embeddings"))
    AS.ensure_lsh_index(spark, src)
    assert AS._read_meta(spark, name) is not None
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    AS._forget(name)


def test_scaled_geometry_store_is_separate_and_larger(spark, sf_dir, tmp_path):
    """A non-default (bands, rows) geometry gets its OWN table whose bucket
    key space grows as bands × 2^rows — the scaled-corpus path never
    clobbers the oracle-parity default index."""
    src = _copy_source(sf_dir, tmp_path)
    default = AS.ensure_lsh_index(spark, src)
    scaled = AS.ensure_lsh_index(spark, src, bands=ANN_BANDS, rows=9)
    assert scaled != default
    assert scaled.endswith(f"_b{ANN_BANDS}r9")
    n_def = spark.table(default).select("bucket").distinct().count()
    n_scl = spark.table(scaled).select("bucket").distinct().count()
    assert n_scl > n_def
    assert n_scl <= ANN_BANDS * 2**9
    # same vectors, one row per (vector, band) in both geometries
    assert spark.table(scaled).count() == spark.table(default).count()
    for n in (default, scaled):
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        AS._forget(n)


def test_scaled_occupancy_agg_is_bucket_local(spark, sf_dir):
    """The scaled-geometry occupancy histogram must exploit the store's
    bucketed layout: both aggregate phases run on the co-located scan with
    NO hash exchange (only the final ordering exchanges), reading only the
    bucket column."""
    fn, _ = REGISTRY["embedding_lsh_scaled"]
    plan = PL.plan_string(fn(spark, sf_dir), "simple")
    assert "Bucketed: true" in plan, plan
    assert "ReadSchema: struct<bucket:string>" in plan, plan
    ex = re.findall(r"Exchange hashpartitioning\([^\n]*", plan)
    assert not ex, ex  # the groupBy never reshuffles the index rows


def test_ivf_cell_stats_reads_no_data_columns(spark, sf_dir):
    """The cell-occupancy view must come from partition METADATA: the cells
    scan reads zero data columns (ReadSchema: struct<>) — at 10^10 vectors
    the histogram costs a file listing, not an embedding-array read."""
    fn, _ = REGISTRY["ivf_cell_stats"]
    plan = PL.plan_string(fn(spark, sf_dir))
    assert "ivf_cells_" in plan
    assert "ReadSchema: struct<>" in plan, plan


def test_ivf_k_parameterizes_quantizer(spark, sf_dir):
    """The coarse quantizer sizes to the corpus: k cells materialize (every
    vector assigned exactly once), and probing ALL k cells degenerates to
    the full corpus — the k ≈ √N scaling rule is a parameter choice, not a
    rebuild of the operator."""
    emb = t(spark, sf_dir, "embeddings")
    n = emb.count()
    for k in (4, 64):
        cents, cells = AS.ivf_frames(emb, k=k)
        n_cells = cents.count()
        assert n_cells <= k
        occ = cells.groupBy("cell").agg(F.count("*").alias("c"))
        assert occ.count() == n_cells
        assert cells.count() == n
        assert cells.select("vec_id").distinct().count() == n


def test_trained_centroids_balance_cells(spark, sf_dir):
    """The fixed-iteration Lloyd refinement must not worsen cell balance vs
    the raw md5 sample (at 10^10 vectors an unbalanced cell is a hot probe),
    must keep every vector assigned exactly once, and must stay
    deterministic (two builds produce identical centroids)."""
    from od_database_spark.queries import IVF_K

    emb = t(spark, sf_dir, "embeddings")
    seeds = (
        emb.select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent"))
        .orderBy(F.md5(F.col("cent_id").cast("string")), F.asc("cent_id"))
        .limit(IVF_K)
    )

    def occupancy(cells):
        return {r["cell"]: r["cnt"] for r in
                cells.groupBy("cell").agg(F.count("*").alias("cnt")).collect()}

    sampled = occupancy(AS._assign_cells(emb, seeds))
    cents, cells = AS.ivf_frames(emb)
    trained = occupancy(cells)
    assert sum(trained.values()) == sum(sampled.values()) == emb.count()
    assert max(trained.values()) <= max(sampled.values())
    # deterministic: a second build yields identical centroid arrays
    cents2, _ = AS.ivf_frames(emb)
    a = {r["cent_id"]: list(r["cent"]) for r in cents.collect()}
    b = {r["cent_id"]: list(r["cent"]) for r in cents2.collect()}
    assert a == b


def test_store_backed_results_match_inline_recompute(spark, sf_dir):
    """The persisted keys are bit-identical to a fresh recompute."""
    from od_database_spark.operators.dedup import ann_band_buckets

    name = AS.ensure_lsh_index(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    inline = emb.select(
        "vec_id", F.explode(ann_band_buckets(F.col("embedding"))).alias("bucket")
    )
    assert spark.table(name).exceptAll(inline).count() == 0
    assert inline.exceptAll(spark.table(name)).count() == 0
