"""Persisted ANN index tables: build-once / query-many.

The round-2 ANN queries recomputed bucket keys / IVF cell assignments over
the whole corpus on every invocation.  The reference's analog is the ES
inverted/trigram index (search/search.py:59-87) — built once at ingest,
READ per query.  This module is that ingest step for the vector side:

- ``ensure_lsh_index``: the banded-LSH bucket table — slim (vec_id, bucket)
  rows, one per (vector, band), stored BUCKETED + SORTED BY ``bucket``.
  Lookups filter on literal bucket keys (pushed + bucket-pruned to the
  matching bucket files); batch self-joins on ``bucket`` are co-located on
  both sides (zero exchange of the index rows).  The banding geometry is a
  PARAMETER (bands, rows): the default serves the oracle-parity queries, and
  scaled geometries (more rows per band → bands × 2^rows buckets) get their
  own tables so a grown corpus keeps in-bucket candidate work bounded.
- ``ensure_ivf_index``: the IVF coarse index — a K-row centroid table
  (deterministic md5-sample seeds refined by IVF_LLOYD fixed Lloyd
  iterations — replayable k-means, balances cell occupancy) plus the
  inverted lists: (vec_id, embedding) PARTITIONED BY cell, so probing
  nprobe cells reads nprobe/K of the data (partition pruning / DPP) and the
  candidate embeddings come straight off the index, no join back.

Build cost is one pass over the corpus per index (the same expressions the
inline queries used — results are bit-identical); the tables live in the
session catalog keyed by the source path, and rebuild whenever the source
CONTENT signature (file names/sizes/mtimes + index params) changes or the
stored row count diverges from the ``_META`` sidecar — a count-only check
would silently serve a stale index after an in-place source regeneration.

All metadata IO goes through the Hadoop FileSystem API resolved from the
path's scheme — the same code path works on local FS, HDFS, and S3A
warehouses (no ``os``/``shutil`` on warehouse paths).  The ``_META`` sidecar
(JSON: source signature + expected row count) is committed via
tmp-write + delete + rename: a crash at any point leaves either the old
sidecar or none at all — a torn write can invalidate a good table (rebuild,
safe) but can never validate a stale one.  Incremental appends
(``append_lsh_vectors``/``append_ivf_vectors``) bump the sidecar's row
count, so appended vectors that are not in the source dir survive
revalidation in later sessions instead of being silently rebuilt away.

At 10^10 vectors the build is the ingest job and the queries here are the
steady-state path.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import ANN_BANDS, ANN_ROWS, IVF_K, IVF_LLOYD, t

N_BUCKETS = 16  # catalog bucket count for the LSH table (files per append)

# per-application memo: (applicationId, table name) -> source signature it
# was validated against.  Keyed by the Spark APPLICATION, not just the name:
# a process that stops its context and starts a new one gets a fresh
# in-memory catalog, and a name-only memo would short-circuit ensure_* with
# a table the new catalog has never seen (TABLE_OR_VIEW_NOT_FOUND at read
# time, which the narrowed env-error catch would then mis-file as a broken
# store).  The signature itself is a filesystem stat pass — cheap enough to
# recompute per ensure_* call, so even IN-SESSION source regeneration
# triggers a rebuild.
_VALIDATED: dict[tuple[str, str], str] = {}


def _memo_key(spark: SparkSession, name: str) -> tuple[str, str]:
    return (spark.sparkContext.applicationId, name)


def _forget(name: str) -> None:
    """Drop every application's memo entry for ``name`` (test/teardown
    helper — pairs with DROP TABLE so a later ensure_* revalidates instead
    of trusting a memo for a table that no longer exists)."""
    for k in [k for k in _VALIDATED if k[1] == name]:
        _VALIDATED.pop(k, None)


def _key(sf_dir: str) -> str:
    return hashlib.md5(sf_dir.encode()).hexdigest()[:10]


# --- portable filesystem helpers (Hadoop FS API via the session JVM) -------


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path``, resolved by the path's scheme through
    the session's Hadoop conf — local file, hdfs:// and s3a:// all route
    through the same API (the cluster-portability contract)."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def _default_params() -> str:
    from ..queries import ANN_BANDS, ANN_ROWS, IVF_K, IVF_LLOYD, MH_A, MH_B

    return f"{ANN_BANDS}:{ANN_ROWS}:{IVF_K}:{IVF_LLOYD}:{MH_A}:{MH_B}"


def _source_sig(
    spark: SparkSession, sf_dir: str, table: str, params: str | None = None
) -> str:
    """Content signature of a source parquet path: file names + sizes +
    mtimes (a filesystem stat pass, no data read) plus the index params.
    Catches in-place source regeneration with UNCHANGED row counts — a
    count-only check would silently serve a stale index for new data —
    and any banding/quantizer param change."""
    path = f"{sf_dir.rstrip('/')}/{table}.parquet"
    fs, jpath = _fs(spark, path)
    parts = []
    if fs.exists(jpath):
        st = fs.getFileStatus(jpath)
        if st.isDirectory():
            stats = sorted(fs.listStatus(jpath), key=lambda s: s.getPath().getName())
            for s in stats:
                parts.append(
                    f"{s.getPath().getName()}:{s.getLen()}:{s.getModificationTime()}"
                )
        else:
            parts.append(f"{st.getLen()}:{st.getModificationTime()}")
    params = _default_params() if params is None else params
    return hashlib.md5(("|".join(parts) + "#" + params).encode()).hexdigest()


def _table_dir(spark: SparkSession, name: str) -> str:
    """The managed table's warehouse location (tables here are all created
    by this module under the session warehouse)."""
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    return f"{wh}/{name.lower()}"


def _read_meta(spark: SparkSession, name: str) -> dict | None:
    """The table's ``_META`` sidecar ({sig, rows}), or None when absent or
    torn (unparseable JSON from an interrupted write) — both mean 'do not
    trust the table', never 'assume valid'."""
    loc = _table_dir(spark, name)
    fs, _ = _fs(spark, loc)
    jvm = spark.sparkContext._jvm
    dst = jvm.org.apache.hadoop.fs.Path(f"{loc}/_META")
    # a sidecar that cannot be read or parsed (torn write, checksum
    # mismatch, concurrent delete) is UNTRUSTED — that forces a rebuild,
    # which is the safe direction; a genuinely broken filesystem then fails
    # loudly at the rebuild's write path instead of here
    from py4j.protocol import Py4JError

    try:
        if not fs.exists(dst):
            return None
        stream = fs.open(dst)
        try:
            raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
        meta = json.loads(raw)
        if not isinstance(meta, dict) or "sig" not in meta or "rows" not in meta:
            return None
        return meta
    except (ValueError, TypeError, OSError, Py4JError):
        return None


def _read_sig(spark: SparkSession, name: str) -> str | None:
    meta = _read_meta(spark, name)
    return meta["sig"] if meta else None


def _write_meta(spark: SparkSession, name: str, sig: str, rows: int) -> None:
    """Commit the sidecar via tmp-write + delete + rename (one small object;
    on S3 the rename is a single-object copy+delete, on HDFS an atomic
    rename).  A crash before the rename leaves the OLD sidecar (or none) —
    a reader can see a missing/torn sidecar and rebuild, but never a
    signature claiming a half-written state is valid."""
    loc = _table_dir(spark, name)
    fs, _ = _fs(spark, loc)
    jvm = spark.sparkContext._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(f"{loc}/_META.tmp")
    dst = jvm.org.apache.hadoop.fs.Path(f"{loc}/_META")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps({"sig": sig, "rows": int(rows)}).encode()))
    finally:
        out.close()
    fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"could not commit {loc}/_META")


def _bump_meta_rows(spark: SparkSession, name: str, delta_rows: int) -> None:
    """Incremental-append bookkeeping: grow the sidecar's expected row count
    so the next out-of-session ensure_* validates the grown table instead of
    rebuilding it from the (smaller) source.  A table without a sidecar
    (built directly via build_*, not ensure_*) has no expectation to
    maintain — skip."""
    meta = _read_meta(spark, name)
    if meta is not None:
        _write_meta(spark, name, meta["sig"], meta["rows"] + int(delta_rows))


# DDL to re-register each index table over its surviving files after a
# session restart (the in-memory catalog forgets tables; the warehouse does
# not).  Without this, every fresh session REBUILT every index from scratch
# — build-once/query-many only held within one session (measured: 17-60 s
# rebuild per process vs ~1 s re-register+validate).  On a cluster with a
# persistent metastore this path simply never triggers.
_RECOVER_DDL = {
    "ann_buckets": (
        "(vec_id BIGINT, bucket STRING)",
        f"CLUSTERED BY (bucket) SORTED BY (bucket) INTO {N_BUCKETS} BUCKETS",
        None,
    ),
    "text_lsh": (
        "(doc_id BIGINT, bucket STRING)",
        f"CLUSTERED BY (bucket) SORTED BY (bucket) INTO {N_BUCKETS} BUCKETS",
        None,
    ),
    "text_shingles": (
        "(doc_id BIGINT, shingle STRING)",
        f"CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO {N_BUCKETS} BUCKETS",
        None,
    ),
    "simhash_fps": ("(doc_id BIGINT, simhash BIGINT)", "", None),
    # cent is ARRAY<DOUBLE> only because Lloyd means are doubles; with zero
    # Lloyd iterations the stored seed centroids would be the source's
    # ARRAY<FLOAT> and this recovery DDL would mismatch the parquet files
    "ivf_cents": ("(cent_id BIGINT, cent ARRAY<DOUBLE>)", "", None),
    "ivf_cells": (
        "(vec_id BIGINT, embedding ARRAY<FLOAT>, cell BIGINT)",
        "",
        "cell",
    ),
}

# the ivf_cents recovery DDL above hardcodes ARRAY<DOUBLE> — only valid
# while at least one Lloyd iteration runs (see the comment on the entry)
assert IVF_LLOYD >= 1, "ivf_cents recovery DDL assumes double (Lloyd) centroids"


def _recover_registration(spark: SparkSession, name: str) -> bool:
    """Re-register a surviving index table after catalog loss: files at the
    warehouse location plus a READABLE ``_META`` sidecar (only this module
    writes those) are re-exposed with the original schema and bucket or
    partition layout.  Signature/row validation still runs AFTER recovery —
    a stale survivor gets re-registered and then fails validation into the
    normal rebuild path.  Returns True iff the table is now registered."""
    ddl = None
    for key, spec in _RECOVER_DDL.items():
        if name.startswith(key + "_"):
            ddl = spec
            break
    if ddl is None:
        return False
    if _read_meta(spark, name) is None:
        return False  # no sidecar → not a table this module committed
    loc = _table_dir(spark, name)
    fs, jpath = _fs(spark, loc)
    if not fs.exists(jpath) or not fs.listStatus(jpath):
        return False
    cols, layout, partition = ddl
    if partition:
        spark.sql(
            f"CREATE TABLE {name} {cols} USING parquet "
            f"PARTITIONED BY ({partition}) LOCATION '{loc}'"
        )
        spark.sql(f"MSCK REPAIR TABLE {name}")
    else:
        spark.sql(f"CREATE TABLE {name} {cols} USING parquet {layout} LOCATION '{loc}'")
    return True


def _table_ok(spark: SparkSession, name: str, sig: str) -> bool:
    """Valid iff the catalog entry, the sidecar signature, and the stored
    row count all agree.  The count check is against the SIDECAR's
    expectation (build rows + appended rows), not a source-derived number —
    that is what lets incremental appends survive revalidation.  A missing
    catalog entry over surviving committed files is recovered first (session
    restarts must not rebuild a valid index)."""
    if not spark.catalog.tableExists(name) and not _recover_registration(spark, name):
        return False
    meta = _read_meta(spark, name)
    if meta is None or meta["sig"] != sig:
        return False
    return spark.table(name).count() == meta["rows"]


def _drop_stale(spark: SparkSession, name: str) -> None:
    """Fresh sessions get a fresh in-memory catalog, but managed-table files
    from an earlier session survive under the warehouse dir and block
    saveAsTable with LOCATION_ALREADY_EXISTS — drop both table and files
    (directory delete through the Hadoop FS API, portable to object
    stores)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = _table_dir(spark, name)
    fs, jpath = _fs(spark, loc)
    fs.delete(jpath, True)


# --- banded-LSH bucket table ------------------------------------------------


def build_lsh_table(
    emb: DataFrame,
    name: str,
    n_buckets: int = N_BUCKETS,
    tables: list | None = None,
) -> None:
    """One exploded (vec_id, bucket) row per (vector, band), bucketed+sorted
    by bucket.  Same ann_band_buckets expressions as the inline queries —
    the stored keys are bit-identical to a per-query recompute.  ``tables``
    selects a non-default banding geometry (queries.ann_planes)."""
    from .dedup import ann_band_buckets

    keyed = emb.select(
        "vec_id", F.explode(ann_band_buckets(F.col("embedding"), tables)).alias("bucket")
    )
    (
        keyed.write.mode("overwrite")
        .bucketBy(n_buckets, "bucket")
        .sortBy("bucket")
        .format("parquet")
        .saveAsTable(name)
    )


def lsh_table_name(sf_dir: str, bands: int | None = None, rows: int | None = None) -> str:
    """The deterministic catalog name ensure_lsh_index uses for this
    (source, geometry) — lets callers (bench fresh-build measurement, tests)
    address the table before it exists."""
    key = _key(sf_dir)
    if bands is None and rows is None:
        return f"ann_buckets_{key}"
    b = ANN_BANDS if bands is None else bands
    r = ANN_ROWS if rows is None else rows
    return f"ann_buckets_{key}_b{b}r{r}"


def ensure_lsh_index(
    spark: SparkSession, sf_dir: str, bands: int | None = None, rows: int | None = None
) -> str:
    """Idempotent build of the LSH bucket table for ``sf_dir``'s embeddings;
    returns the catalog table name.  Rebuilds when the source content
    signature, the index params, or the stored row count changes.  A
    non-default (bands, rows) geometry gets its OWN table (name + signature
    both carry the geometry) — the scaled-corpus path sizes the index to the
    data without touching the oracle-parity default."""
    name = lsh_table_name(sf_dir, bands, rows)
    if bands is None and rows is None:
        tables = None
        sig = _source_sig(spark, sf_dir, "embeddings")
    else:
        from ..queries import ann_planes

        b = ANN_BANDS if bands is None else bands
        r = ANN_ROWS if rows is None else rows
        tables = ann_planes(b, r)
        sig = _source_sig(spark, sf_dir, "embeddings", params=f"geom:{b}:{r}")
    if _VALIDATED.get(_memo_key(spark, name)) == sig:
        return name
    if not _table_ok(spark, name, sig):
        _drop_stale(spark, name)
        build_lsh_table(t(spark, sf_dir, "embeddings"), name, tables=tables)
        _write_meta(spark, name, sig, spark.table(name).count())
    _VALIDATED[_memo_key(spark, name)] = sig
    return name


def append_lsh_vectors(
    delta: DataFrame,
    name: str,
    n_buckets: int = N_BUCKETS,
    tables: list | None = None,
) -> None:
    """Ingest-incremental growth of the LSH index: explode the NEW vectors'
    band buckets and append with the table's bucket spec — one file set per
    catalog bucket per append, the seen_store growth pattern.  Lookups and
    co-located self-joins keep their plan properties across appends.  The
    ``_META`` row-count expectation is bumped by the appended rows, so the
    grown table revalidates in later sessions."""
    from .dedup import ann_band_buckets

    spark = delta.sparkSession
    keyed = delta.select(
        "vec_id", F.explode(ann_band_buckets(F.col("embedding"), tables)).alias("bucket")
    ).persist()
    n_new = keyed.count()
    # bump BEFORE the append commits: a crash in between leaves an OVER-count
    # that fails validation into a rebuild (correct — the append never
    # landed).  The reverse order had a window where a committed append with
    # no bump read as a row-count mismatch and silently REBUILT FROM SOURCE,
    # dropping the already-committed appended vectors.
    _bump_meta_rows(spark, name, n_new)
    (
        keyed.write.mode("append")
        .bucketBy(n_buckets, "bucket")
        .sortBy("bucket")
        .format("parquet")
        .saveAsTable(name)
    )
    keyed.unpersist()


# --- IVF coarse index -------------------------------------------------------


def _assign_cells(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast O(N·K) L2, map-side arg-min.
    THE single source of the assignment expression — build, incremental
    append, and the queries-side no-store fallback all call this, so the
    paths can never diverge."""
    l2 = F.aggregate(
        F.zip_with(
            "embedding",
            "cent",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    assigned = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cent_id", l2.alias("d2")
    )
    best = assigned.groupBy("vec_id").agg(
        F.min(F.struct(F.col("d2"), F.col("cent_id"))).alias("_m")
    )
    return emb.join(best, on="vec_id").select(
        "vec_id", "embedding", F.col("_m.cent_id").alias("cell")
    )


def _lloyd_refine(emb: DataFrame, cents: DataFrame, iters: int) -> DataFrame:
    """Fixed-iteration deterministic Lloyd: assign → per-cell component mean
    → new centroids, ``iters`` times.  Component means are rounded to 6
    decimals so the value is insensitive to float summation order (the
    cross-engine determinism rule — DuckDB's avg accumulates in a different
    order).  A cell that loses all members is dropped (standard k-means);
    surviving cells keep their seed's cent_id, so ids stay stable and
    replayable.  Each iteration's centroids are eagerly checkpointed — the
    next assignment broadcasts a K-row table, not a growing plan tree — and
    the DEAD previous generation is unpersisted once its successor is
    materialized (checkpoint blocks otherwise accumulate per invocation for
    the session's lifetime; only the returned final generation stays
    pinned, since callers' plans read its blocks)."""
    for i in range(iters):
        assigned = _assign_cells(emb, cents)
        ex = assigned.select("cell", F.posexplode("embedding").alias("pos", "v"))
        means = ex.groupBy("cell", "pos").agg(
            F.avg(F.col("v").cast("double")).alias("m")
        )
        prev = cents
        cents = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_s"))
            .select(
                F.col("cell").alias("cent_id"),
                F.transform("_s", lambda s: F.round(s["m"], 6)).alias("cent"),
            )
            .localCheckpoint(eager=True)
        )
        if i > 0:  # iteration 0's input is the caller's seeds frame — not ours
            prev.unpersist()
    return cents


def ivf_frames(emb: DataFrame, k: int = IVF_K) -> tuple[DataFrame, DataFrame]:
    """(centroids, cells) as DataFrames: deterministic K-seed selection
    (TakeOrdered on md5(vec_id) — a replayable uniform sample, total order)
    refined by IVF_LLOYD fixed Lloyd iterations (deterministic k-means —
    replayable because iteration count is fixed and means are
    order-insensitive after rounding; balances cell occupancy vs the raw
    sample, which at 10^10 vectors means no hot probe cells), plus the
    broadcast assignment.  Used by the table build AND as the queries-side
    fallback when the store can't be written.  ``k`` sizes the coarse
    quantizer to the corpus (the standard rule is k ≈ √N so probe cost
    O(k) and per-cell scan O(N·nprobe/k) balance); the default serves the
    oracle-parity queries."""
    seeds = (
        emb.select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent"))
        .orderBy(F.md5(F.col("cent_id").cast("string")), F.asc("cent_id"))
        .limit(k)
    )
    cents = _lloyd_refine(emb, seeds, IVF_LLOYD)
    return cents, _assign_cells(emb, cents)


def build_ivf_tables(
    emb: DataFrame, cents_name: str, cells_name: str, k: int = IVF_K
) -> None:
    """IVF build pass (ivf_frames persisted): the inverted lists
    (vec_id, embedding) land PARTITIONED BY cell so the query side prunes
    to its probed cells."""
    cents, cells = ivf_frames(emb, k)
    cents.write.mode("overwrite").format("parquet").saveAsTable(cents_name)
    (
        cells.write.mode("overwrite")
        .partitionBy("cell")
        .format("parquet")
        .saveAsTable(cells_name)
    )


def append_ivf_vectors(delta: DataFrame, cents_name: str, cells_name: str) -> None:
    """Ingest-incremental IVF growth: assign NEW vectors to the EXISTING
    (frozen) centroids — the standard IVF append path; re-training the
    coarse quantizer is a separate rebuild decision — and append them to
    their inverted-list partitions.  Bumps the cells table's ``_META`` row
    expectation so the grown index revalidates across sessions."""
    spark = delta.sparkSession
    cells = _assign_cells(delta, spark.table(cents_name)).persist()
    n_new = cells.count()
    # bump-before-write: see append_lsh_vectors — a crash between the two
    # steps must read as an invalid (over-counted) table, never as silent
    # loss of a committed append
    _bump_meta_rows(spark, cells_name, n_new)
    (
        cells.write.mode("append")
        .partitionBy("cell")
        .format("parquet")
        .saveAsTable(cells_name)
    )
    cells.unpersist()


def ivf_table_names(sf_dir: str, k: int | None = None) -> tuple[str, str]:
    """Deterministic (centroids, cells) catalog names for this (source, K) —
    non-default coarse-quantizer sizes get their own geometry-keyed tables,
    the ensure_lsh_index pattern."""
    key = _key(sf_dir)
    suffix = "" if k is None else f"_k{k}"
    return f"ivf_cents_{key}{suffix}", f"ivf_cells_{key}{suffix}"


def ensure_ivf_index(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> tuple[str, str]:
    """Idempotent IVF build; returns (centroids_table, cells_table).
    ``k`` sizes the coarse quantizer (k ≈ √N balances probe cost O(k)
    against per-cell scan O(N·nprobe/k)); the default (IVF_K) serves the
    oracle-parity queries, a scaled k gets its own geometry-keyed tables."""
    cents_name, cells_name = ivf_table_names(sf_dir, k)
    if k is None:
        sig = _source_sig(spark, sf_dir, "embeddings")
    else:
        sig = _source_sig(spark, sf_dir, "embeddings", params=f"ivfk:{k}")
    if _VALIDATED.get(_memo_key(spark, cells_name)) == sig:
        return cents_name, cells_name
    if not (_table_ok(spark, cents_name, sig) and _table_ok(spark, cells_name, sig)):
        _drop_stale(spark, cents_name)
        _drop_stale(spark, cells_name)
        build_ivf_tables(
            t(spark, sf_dir, "embeddings"), cents_name, cells_name,
            k=IVF_K if k is None else k,
        )
        _write_meta(spark, cents_name, sig, spark.table(cents_name).count())
        _write_meta(spark, cells_name, sig, spark.table(cells_name).count())
    _VALIDATED[_memo_key(spark, cells_name)] = sig
    return cents_name, cells_name


# --- text-side index tables -------------------------------------------------


def build_text_lsh_table(docs: DataFrame, name: str, n_buckets: int = N_BUCKETS) -> None:
    """Persist the text-side MinHash LSH bands (doc_id, bucket) — the
    shingle→minhash→band pipeline runs once at ingest; the candidate
    self-join then reads the table bucketed+sorted by bucket, co-located on
    both sides."""
    from ..queries import _minhash_bands

    (
        _minhash_bands(docs)
        .write.mode("overwrite")
        .bucketBy(n_buckets, "bucket")
        .sortBy("bucket")
        .format("parquet")
        .saveAsTable(name)
    )


def ensure_text_lsh_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build of the text band table for ``sf_dir``'s documents."""
    name = f"text_lsh_{_key(sf_dir)}"
    sig = _source_sig(spark, sf_dir, "documents")
    if _VALIDATED.get(_memo_key(spark, name)) == sig:
        return name
    if not _table_ok(spark, name, sig):
        _drop_stale(spark, name)
        build_text_lsh_table(t(spark, sf_dir, "documents"), name)
        _write_meta(spark, name, sig, spark.table(name).count())
    _VALIDATED[_memo_key(spark, name)] = sig
    return name


def build_shingle_table(docs: DataFrame, name: str, n_buckets: int = N_BUCKETS) -> None:
    """Persist the DISTINCT word-3-gram shingle rows (doc_id, shingle) — the
    text engine's inverted-index analog (the reference's ES index stores
    exactly this per-document term material; search/search.py:59-87).  The
    Jaccard verify stage then joins candidate pairs against these slim rows
    instead of re-splitting and re-exploding every document per query.
    Shingling expression single-sourced from queries._text_shingles so the
    store and the inline fallback can never diverge."""
    from ..queries import _text_shingles

    (
        docs.select(
            "doc_id", F.explode(F.array_distinct(_text_shingles())).alias("shingle")
        )
        .write.mode("overwrite")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .format("parquet")
        .saveAsTable(name)
    )


def ensure_shingle_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build of the shingle inverted index."""
    name = f"text_shingles_{_key(sf_dir)}"
    sig = _source_sig(spark, sf_dir, "documents")
    if _VALIDATED.get(_memo_key(spark, name)) == sig:
        return name
    if not _table_ok(spark, name, sig):
        _drop_stale(spark, name)
        build_shingle_table(t(spark, sf_dir, "documents"), name)
        _write_meta(spark, name, sig, spark.table(name).count())
    _VALIDATED[_memo_key(spark, name)] = sig
    return name


def build_simhash_table(docs: DataFrame, name: str) -> None:
    """Persist 60-bit SimHash fingerprints (16 B/doc): the text-hashing pass
    runs once at ingest; near-dup queries then read fingerprints instead of
    re-hashing every document per invocation.  Sorted by doc_id so id-range
    query filters prune row groups."""
    from .dedup import simhash

    (
        simhash(docs, "text", "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )


def ensure_simhash_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build of the fingerprint table for ``sf_dir``'s documents;
    returns the catalog table name."""
    name = f"simhash_fps_{_key(sf_dir)}"
    sig = _source_sig(spark, sf_dir, "documents")
    if _VALIDATED.get(_memo_key(spark, name)) == sig:
        return name
    if not _table_ok(spark, name, sig):
        _drop_stale(spark, name)
        build_simhash_table(t(spark, sf_dir, "documents"), name)
        _write_meta(spark, name, sig, spark.table(name).count())
    _VALIDATED[_memo_key(spark, name)] = sig
    return name


def query_cells(qv: DataFrame, cents: DataFrame, nprobe: int) -> DataFrame:
    """The query vector's ``nprobe`` nearest coarse cells (L2 to the K
    centroids — a K-row ranking, broadcast everywhere it's used)."""
    l2 = F.aggregate(
        F.zip_with(
            "embedding",
            "cent",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.orderBy(F.asc("d2"), F.asc("cent_id"))
    return (
        qv.crossJoin(F.broadcast(cents))
        .select(F.col("cent_id"), l2.alias("d2"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select(F.col("cent_id").alias("qc"))
    )
