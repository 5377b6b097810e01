"""Persisted ANN index tables: build-once / query-many.

The round-2 ANN queries recomputed bucket keys / IVF cell assignments over
the whole corpus on every invocation.  The reference's analog is the ES
inverted/trigram index (search/search.py:59-87) — built once at ingest,
READ per query.  This module is that ingest step for the vector side:

- ``ensure_lsh_index``: the banded-LSH bucket table — slim (vec_id, bucket)
  rows, one per (vector, band), stored BUCKETED + SORTED BY ``bucket``.
  Lookups filter on literal bucket keys (pushed + bucket-pruned to the
  matching bucket files); batch self-joins on ``bucket`` are co-located on
  both sides (zero exchange of the index rows).
- ``ensure_ivf_index``: the IVF coarse index — a K-row centroid table plus
  the inverted lists: (vec_id, embedding) PARTITIONED BY cell, so probing
  nprobe cells reads nprobe/K of the data (partition pruning / DPP) and the
  candidate embeddings come straight off the index, no join back.

Build cost is one pass over the corpus per index (the same expressions the
inline queries used — results are bit-identical); the tables live in the
session catalog keyed by the source path, and rebuild whenever the source
CONTENT signature (file names/sizes/mtimes + index params) or row count
changes — a count-only check would silently serve a stale index after an
in-place source regeneration.  At 10^10 vectors the build is the ingest job and the
queries here are the steady-state path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import ANN_BANDS, IVF_K, t

N_BUCKETS = 16  # catalog bucket count for the LSH table (files per append)

# per-session memo: table name -> source signature it was validated against
# (the signature is a filesystem stat pass — cheap enough to recompute per
# ensure_* call, so even IN-SESSION source regeneration triggers a rebuild)
_VALIDATED: dict[str, str] = {}


def _key(sf_dir: str) -> str:
    return hashlib.md5(sf_dir.encode()).hexdigest()[:10]


def _source_sig(sf_dir: str, table: str) -> str:
    """Content signature of a source parquet path: file names + sizes +
    mtimes (a filesystem stat pass, no data read) plus the index params.
    Catches in-place source regeneration with UNCHANGED row counts — a
    count-only check would silently serve a stale index for new data —
    and any banding/quantizer param change."""
    import os

    from ..queries import ANN_BANDS, ANN_ROWS, IVF_K, MH_A, MH_B

    path = os.path.join(sf_dir, f"{table}.parquet")
    parts = []
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, f))
            parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.isfile(path):
        st = os.stat(path)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    params = f"{ANN_BANDS}:{ANN_ROWS}:{IVF_K}:{MH_A}:{MH_B}"
    return hashlib.md5(("|".join(parts) + "#" + params).encode()).hexdigest()


def _sig_path(spark: SparkSession, name: str) -> str:
    import os
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    return os.path.join(wh, name, "_SRC_SIG")


def _read_sig(spark: SparkSession, name: str) -> str | None:
    import os

    p = _sig_path(spark, name)
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return f.read().strip()


def _write_sig(spark: SparkSession, name: str, sig: str) -> None:
    with open(_sig_path(spark, name), "w") as f:
        f.write(sig)


def _table_ok(spark: SparkSession, name: str, expected_rows: int, sig: str) -> bool:
    if not spark.catalog.tableExists(name):
        return False
    if _read_sig(spark, name) != sig:
        return False
    return spark.table(name).count() == expected_rows


def _drop_stale(spark: SparkSession, name: str) -> None:
    """Fresh sessions get a fresh in-memory catalog, but managed-table files
    from an earlier session survive under the warehouse dir and block
    saveAsTable with LOCATION_ALREADY_EXISTS — drop both table and files."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)


def build_lsh_table(emb: DataFrame, name: str, n_buckets: int = N_BUCKETS) -> None:
    """One exploded (vec_id, bucket) row per (vector, band), bucketed+sorted
    by bucket.  Same ann_band_buckets expressions as the inline queries —
    the stored keys are bit-identical to a per-query recompute."""
    from .dedup import ann_band_buckets

    keyed = emb.select(
        "vec_id", F.explode(ann_band_buckets(F.col("embedding"))).alias("bucket")
    )
    (
        keyed.write.mode("overwrite")
        .bucketBy(n_buckets, "bucket")
        .sortBy("bucket")
        .format("parquet")
        .saveAsTable(name)
    )


def ensure_lsh_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build of the LSH bucket table for ``sf_dir``'s embeddings;
    returns the catalog table name.  Rebuilds when the source content
    signature, the index params, or the stored row count changes."""
    name = f"ann_buckets_{_key(sf_dir)}"
    sig = _source_sig(sf_dir, "embeddings")
    if _VALIDATED.get(name) == sig:
        return name
    emb = t(spark, sf_dir, "embeddings")
    expected = emb.count() * ANN_BANDS
    if not _table_ok(spark, name, expected, sig):
        _drop_stale(spark, name)
        build_lsh_table(emb, name)
        _write_sig(spark, name, sig)
    _VALIDATED[name] = sig
    return name


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


def ivf_frames(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(centroids, cells) as DataFrames: deterministic K-centroid selection
    (TakeOrdered on md5(vec_id) — a replayable uniform sample, total order)
    plus the broadcast assignment.  Used by the table build AND as the
    queries-side fallback when the store can't be written."""
    cents = (
        emb.select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent"))
        .orderBy(F.md5(F.col("cent_id").cast("string")), F.asc("cent_id"))
        .limit(IVF_K)
    )
    return cents, _assign_cells(emb, cents)


def build_ivf_tables(emb: DataFrame, cents_name: str, cells_name: str) -> None:
    """IVF build pass (ivf_frames persisted): the inverted lists
    (vec_id, embedding) land PARTITIONED BY cell so the query side prunes
    to its probed cells."""
    cents, cells = ivf_frames(emb)
    cents.write.mode("overwrite").format("parquet").saveAsTable(cents_name)
    (
        cells.write.mode("overwrite")
        .partitionBy("cell")
        .format("parquet")
        .saveAsTable(cells_name)
    )


def append_lsh_vectors(
    delta: DataFrame, name: str, n_buckets: int = N_BUCKETS
) -> None:
    """Ingest-incremental growth of the LSH index: explode the NEW vectors'
    band buckets and append with the table's bucket spec — one file set per
    catalog bucket per append, the seen_store growth pattern.  Lookups and
    co-located self-joins keep their plan properties across appends."""
    from .dedup import ann_band_buckets

    keyed = delta.select(
        "vec_id", F.explode(ann_band_buckets(F.col("embedding"))).alias("bucket")
    )
    (
        keyed.write.mode("append")
        .bucketBy(n_buckets, "bucket")
        .sortBy("bucket")
        .format("parquet")
        .saveAsTable(name)
    )


def append_ivf_vectors(delta: DataFrame, cents_name: str, cells_name: str) -> None:
    """Ingest-incremental IVF growth: assign NEW vectors to the EXISTING
    (frozen) centroids — the standard IVF append path; re-training the
    coarse quantizer is a separate rebuild decision — and append them to
    their inverted-list partitions."""
    spark = delta.sparkSession
    cells = _assign_cells(delta, spark.table(cents_name))
    (
        cells.write.mode("append")
        .partitionBy("cell")
        .format("parquet")
        .saveAsTable(cells_name)
    )


def ensure_ivf_index(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Idempotent IVF build; returns (centroids_table, cells_table)."""
    key = _key(sf_dir)
    cents_name, cells_name = f"ivf_cents_{key}", f"ivf_cells_{key}"
    sig = _source_sig(sf_dir, "embeddings")
    if _VALIDATED.get(cells_name) == sig:
        return cents_name, cells_name
    emb = t(spark, sf_dir, "embeddings")
    n = emb.count()
    if not (
        _table_ok(spark, cents_name, min(IVF_K, n), sig)
        and _table_ok(spark, cells_name, n, sig)
    ):
        _drop_stale(spark, cents_name)
        _drop_stale(spark, cells_name)
        build_ivf_tables(emb, cents_name, cells_name)
        _write_sig(spark, cents_name, sig)
        _write_sig(spark, cells_name, sig)
    _VALIDATED[cells_name] = sig
    return cents_name, cells_name


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
    """Idempotent build of the text band table for ``sf_dir``'s documents.
    Validation: docs with ≥1 shingle (≥3 words) each contribute exactly
    MH_N/2 band rows — a cheap native scan, no re-hashing."""
    from ..queries import MH_N

    name = f"text_lsh_{_key(sf_dir)}"
    sig = _source_sig(sf_dir, "documents")
    if _VALIDATED.get(name) == sig:
        return name
    docs = t(spark, sf_dir, "documents")
    eligible = docs.filter(
        F.size(F.filter(F.split("text", " "), lambda w: w != "")) >= 3
    ).count()
    if not _table_ok(spark, name, eligible * (MH_N // 2), sig):
        _drop_stale(spark, name)
        build_text_lsh_table(docs, name)
        _write_sig(spark, name, sig)
    _VALIDATED[name] = sig
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
    """Idempotent build of the shingle inverted index.  Validation compares
    the stored distinct-doc count against the eligible-docs count (≥3
    words) — cheap native scan, no re-shingling."""
    name = f"text_shingles_{_key(sf_dir)}"
    sig = _source_sig(sf_dir, "documents")
    if _VALIDATED.get(name) == sig:
        return name
    docs = t(spark, sf_dir, "documents")
    eligible = docs.filter(
        F.size(F.filter(F.split("text", " "), lambda w: w != "")) >= 3
    ).count()
    if (
        not spark.catalog.tableExists(name)
        or _read_sig(spark, name) != sig
        or spark.table(name).select("doc_id").distinct().count() != eligible
    ):
        _drop_stale(spark, name)
        build_shingle_table(docs, name)
        _write_sig(spark, name, sig)
    _VALIDATED[name] = sig
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
    sig = _source_sig(sf_dir, "documents")
    if _VALIDATED.get(name) == sig:
        return name
    docs = t(spark, sf_dir, "documents")
    if not _table_ok(spark, name, docs.count(), sig):
        _drop_stale(spark, name)
        build_simhash_table(docs, name)
        _write_sig(spark, name, sig)
    _VALIDATED[name] = sig
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
