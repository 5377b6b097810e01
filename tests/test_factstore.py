"""Bucket-partitioned fact store: partition-scoped replace leaves every
other bucket's files byte-identical (the S4/S5 write-amplification contract,
tasks.py:114-129)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from od_database_spark.sources import factstore as FS


def _listing(path):
    """{relpath: (size, mtime_ns)} for every data file under path."""
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, path)] = (st.st_size, st.st_mtime_ns)
    return out


def test_partition_scoped_replace(spark):
    n_buckets = 8
    base = spark.range(200).select(
        (F.col("id") % 40).alias("website_id"),
        F.concat(F.lit("dir"), (F.col("id") % 7)).alias("path"),
        F.concat(F.lit("f"), F.col("id")).alias("name"),
        F.lit("txt").alias("ext"),
        (F.col("id") * 10).alias("size"),
    )
    d = tempfile.mkdtemp(prefix="oddb_fact_")
    try:
        FS.write_files_bucketed(base, d, n_buckets)
        before = _listing(d)
        target = 13  # bucket 5
        tb = FS.bucket_of(target, n_buckets)
        new_docs = spark.createDataFrame(
            [(target, "re", "new0", "bin", 1), (target, "re", "new1", "bin", 2)],
            "website_id long, path string, name string, ext string, size long",
        )
        FS.replace_website_docs_partitioned(spark, d, new_docs, target, n_buckets)
        after = _listing(d)

        changed_buckets = set()
        for rel in set(before) | set(after):
            if before.get(rel) != after.get(rel):
                part = [s for s in rel.split(os.sep) if s.startswith("bucket=")][0]
                changed_buckets.add(part)
        assert changed_buckets == {f"bucket={tb}"}, changed_buckets

        # content contract: target website fully replaced, everything else kept
        got = FS.read_files_bucketed(spark, d)
        assert got.filter(F.col("website_id") == target).count() == 2
        assert {r["name"] for r in
                got.filter(F.col("website_id") == target).collect()} == {"new0", "new1"}
        assert got.filter(F.col("website_id") != target).count() == 195
        # the read of one bucket prunes partitions (scan lists only that dir)
        plan = (
            spark.read.parquet(d).filter(F.col("bucket") == tb)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters" in plan and "bucket" in plan
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_replace_inserts_new_website(spark):
    """A website whose bucket exists but that has no rows yet: the replace is
    a pure insert into that bucket; other buckets untouched."""
    n_buckets = 4
    base = spark.range(40).select(
        (F.col("id") % 10).alias("website_id"),
        F.lit("p").alias("path"),
        F.concat(F.lit("f"), F.col("id")).alias("name"),
        F.lit("txt").alias("ext"),
        F.col("id").alias("size"),
    )
    d = tempfile.mkdtemp(prefix="oddb_fact2_")
    try:
        FS.write_files_bucketed(base, d, n_buckets)
        before = _listing(d)
        target = 101  # bucket 1; no existing rows for this website
        new_docs = spark.createDataFrame(
            [(target, "p", "n0", "bin", 1)],
            "website_id long, path string, name string, ext string, size long",
        )
        FS.replace_website_docs_partitioned(spark, d, new_docs, target, n_buckets)
        after = _listing(d)
        changed = {
            [s for s in rel.split(os.sep) if s.startswith("bucket=")][0]
            for rel in set(before) | set(after)
            if before.get(rel) != after.get(rel)
        }
        assert changed == {f"bucket={FS.bucket_of(target, n_buckets)}"}
        got = FS.read_files_bucketed(spark, d)
        assert got.count() == 41
        assert got.filter(F.col("website_id") == target).count() == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)
