"""Websites dim CRUD (S8, database.py:59-150 semantics) over the
versioned-parquet store."""

import shutil
import tempfile

from pyspark.sql import functions as F

from od_database_spark.sources import dimstore as DS


def test_dim_crud_roundtrip(spark):
    d = tempfile.mkdtemp(prefix="oddb_dim_")
    path = f"{d}/websites"
    try:
        rows = spark.createDataFrame(
            [("http://a.example/", "1.2.3.4", "ua1"),
             ("http://b.example/", "5.6.7.8", "ua2")],
            "url string, logged_ip string, logged_useragent string",
        )
        dim = DS.insert_websites(spark, path, rows)
        assert dim.count() == 2
        a_id = dim.filter(F.col("url") == "http://a.example/").collect()[0]["website_id"]

        # re-insert with one dup + one new: dup untouched (website_exists guard)
        more = spark.createDataFrame(
            [("http://a.example/", "9.9.9.9", "ua9"),
             ("http://c.example/", "1.1.1.1", "ua3")],
            "url string, logged_ip string, logged_useragent string",
        )
        dim = DS.insert_websites(spark, path, more)
        assert dim.count() == 3
        a = DS.get_website_by_url(dim, "http://a.example/").collect()[0]
        assert a["logged_ip"] == "1.2.3.4"  # original row kept

        # update_website_date_if_exists bumps last_modified for one id
        before = {r["website_id"]: r["last_modified"] for r in dim.collect()}
        dim = DS.update_website_date_if_exists(spark, path, a_id)
        after = {r["website_id"]: r["last_modified"] for r in dim.collect()}
        assert after[a_id] >= before[a_id]
        others = [k for k in before if k != a_id]
        assert all(after[k] == before[k] for k in others)

        # delete removes exactly one site
        dim = DS.delete_website(spark, path, a_id)
        assert dim.count() == 2
        assert dim.filter(F.col("website_id") == a_id).count() == 0

        # paging: prefix LIKE + last_modified DESC (database.py:107-116)
        page = DS.websites_page(dim, per_page=1, page=0, url_prefix="http://")
        assert page.count() == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_reader_mid_commit_sees_complete_version(spark):
    """The commit protocol must never leave a window where the live dim is
    missing or partial: a reader that resolved the pointer BEFORE the flip
    keeps reading its complete old version; one that resolves after sees the
    complete new one.  (The round-2 rename-swap had a window where no live
    dir existed at all.)"""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="oddb_dimv_")
    path = f"{d}/websites"
    try:
        rows = spark.createDataFrame(
            [("http://a.example/", "1.2.3.4", "ua1")],
            "url string, logged_ip string, logged_useragent string",
        )
        DS.insert_websites(spark, path, rows)
        v1 = DS._latest_version(path)
        old_reader = DS.load(spark, path)  # resolves the pointer NOW

        # simulate the first half of a commit: new version dir fully written,
        # pointer not yet flipped — the old reader and fresh loads both still
        # see the complete v1
        newdim = DS.load(spark, path).withColumn("logged_ip", F.lit("9.9.9.9"))
        newdim.write.mode("overwrite").parquet(os.path.join(path, "v00002"))
        assert DS._latest_version(path) == v1
        assert old_reader.count() == 1
        assert DS.load(spark, path).collect()[0]["logged_ip"] == "1.2.3.4"

        # a real commit flips the pointer atomically and retains v1 for the
        # in-flight reader
        more = spark.createDataFrame(
            [("http://b.example/", "5.6.7.8", "ua2")],
            "url string, logged_ip string, logged_useragent string",
        )
        DS.insert_websites(spark, path, more)
        assert DS._latest_version(path) != v1
        assert os.path.isdir(os.path.join(path, v1))  # previous gen retained
        assert old_reader.count() == 1  # old reader unbroken
        assert DS.load(spark, path).count() == 2

        # one more commit GCs v1 (two generations back)
        DS.update_website_date_if_exists(spark, path, 0)
        assert not os.path.isdir(os.path.join(path, v1))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_legacy_layout_raises_instead_of_reading_empty(spark):
    """A pre-versioned dim dir (parquet files, no _LATEST) must raise, not
    load as an empty dim — a silent empty load would let the next insert
    commit v00001 with only the new rows and hide all existing ones."""
    import os
    import tempfile

    import pytest

    d = tempfile.mkdtemp(prefix="oddb_dimlegacy_")
    path = f"{d}/websites"
    try:
        spark.createDataFrame(
            [(1, "http://a.example/")], "website_id long, url string"
        ).write.parquet(path)
        assert any(f == "_SUCCESS" for f in os.listdir(path))
        with pytest.raises(ValueError, match="pre-versioned"):
            DS.load(spark, path)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_append_docs_bucketed(spark):
    import tempfile as tf

    from od_database_spark.sources import factstore as FS

    d = tf.mkdtemp(prefix="oddb_append_")
    try:
        base = spark.createDataFrame(
            [(1, "p", "f1", "txt", 10), (2, "p", "f2", "txt", 20)],
            "website_id long, path string, name string, ext string, size long",
        )
        FS.write_files_bucketed(base, d, 4)
        more = spark.createDataFrame(
            [(1, "p", "f3", "txt", 30), (5, "p", "f4", "txt", 40)],
            "website_id long, path string, name string, ext string, size long",
        )
        FS.append_docs(more, d, 4)
        got = FS.read_files_bucketed(spark, d)
        assert got.count() == 4
        assert got.filter(F.col("website_id") == 1).count() == 2
        assert {r["bucket"] for r in got.select("bucket").distinct().collect()} == {1, 2}
    finally:
        shutil.rmtree(d, ignore_errors=True)
