"""Search/stats layer over the files table (SURVEY.md §2.2/2.4/2.5/2.6) +
NDJSON ingest + CSV export roundtrips."""

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from od_database_spark.operators import search as S
from od_database_spark.sources import ndjson


@pytest.fixture(scope="module")
def files_df(spark):
    rows = [
        # website_id, path, name, ext, size, mtime_epoch
        (1, "media", "holiday_video", "mp4", 5_000_000, 1500000000),
        (1, "media", "holiday_photo", "jpg", 300_000, 1500000100),
        (1, "", "readme", "txt", 1_000, 1400000000),
        (1, "backup", "archive", "zip", 900_000_000, 1450000000),
        (2, "pub", "lecture_video", "mp4", 7_000_000, 1600000000),
        (2, "pub", "notes", "txt", 2_000, 1600000100),
        (2, "pub/deep", "old_video", "avi", 2 * 10**12, 1300000000),  # clamped
        (3, "x", "noext", "", 10, 0),  # mtime 0 excluded from date hist
    ]
    df = spark.createDataFrame(
        [(w, p, n, e, s, m) for w, p, n, e, s, m in rows],
        "website_id long, path string, name string, ext string, size long, mtime_epoch long",
    ).select(
        "website_id", "path", "name", "ext", "size",
        F.to_timestamp(F.from_unixtime("mtime_epoch")).alias("mtime"),
    )
    return df.cache()


def test_get_stats_per_website(files_df):
    rows = S.get_stats(files_df, 1).collect()
    by_ext = {r["ext"]: (r["doc_count"], r["size_sum"]) for r in rows}
    assert by_ext["mp4"] == (1, 5_000_000)
    assert len(rows) == 4  # one bucket per ext of website 1


def test_global_stats_clamp_and_histograms(files_df):
    stats = S.global_stats(files_df)
    fs = stats["file_stats"].collect()[0]
    assert fs["count"] == 7  # the 2 TB row is clamped out
    assert fs["std_upper"] == pytest.approx(fs["avg"] + fs["std_deviation"])
    years = {r["year"] for r in stats["dates_histogram"].collect()}
    assert 1970 not in years  # mtime 0 excluded
    scatter = stats["website_scatter"].collect()
    assert scatter[0]["doc_count"] >= scatter[-1]["doc_count"]


def test_search_filters_and_score(files_df):
    # AND semantics: both tokens must hit
    hits = S.search(files_df, "holiday video").collect()
    assert [h["name"] for h in hits] == ["holiday_video"]
    # OR semantics via match_all flag (reference quirk: 'all' → or)
    hits = S.search(files_df, "holiday video", match_all=True).collect()
    assert {h["name"] for h in hits} >= {"holiday_video", "holiday_photo", "lecture_video"}
    # ext filter (F2) with messy input normalization
    hits = S.search(files_df, "video", extensions=[" .MP4 "], match_all=True).collect()
    assert {h["ext"] for h in hits} == {"mp4"}
    # size range (F3)
    hits = S.search(files_df, "video", match_all=True, size_min=6_000_000).collect()
    assert {h["name"] for h in hits} == {"lecture_video", "old_video"}
    # name^5 boost: exact name token beats trigram-only matches
    hits = S.search(files_df, "video", match_all=True)
    top = hits.collect()[0]
    assert "video" in top["name"]


def test_search_min_length_gate(files_df):
    assert S.search(files_df, "ab").count() == 0  # views.py:201


def test_sort_orders_and_pagination(files_df):
    hits = S.search(files_df, "video", match_all=True, sort_order="size_dsc").collect()
    sizes = [h["size"] for h in hits]
    assert sizes == sorted(sizes, reverse=True)
    page0 = S.search(files_df, "video", match_all=True, per_page=2, page=0).collect()
    page1 = S.search(files_df, "video", match_all=True, per_page=2, page=1).collect()
    assert len(page0) == 2 and page0 != page1


def test_highlight(files_df):
    hits = S.highlight(S.search(files_df, "video", match_all=True), "video")
    top = hits.collect()[0]
    assert "<mark>video</mark>" in top["name_hl"]


def test_link_list(files_df, spark):
    websites = spark.createDataFrame(
        [(1, "http://site1.example/"), (2, "http://site2.example/")],
        "website_id long, url string",
    )
    links = {r["link"] for r in S.get_link_list(files_df, websites, 1).collect()}
    assert "http://site1.example/media/holiday_video.mp4" in links
    assert "http://site1.example/readme.txt" in links  # empty path → no '/'


def test_ndjson_ingest_roundtrip(spark):
    tmp = tempfile.mkdtemp(prefix="oddb_ndjson_")
    try:
        lines = [
            json.dumps({"name": "movie.MP4", "path": "films", "size": 123, "mtime": 1500000000}),
            json.dumps({"name": ".bashrc", "path": "", "size": 1, "mtime": 1500000001}),
            json.dumps({"name": "noext", "path": "d", "size": 2, "mtime": 1500000002}),
            "{ this is not json",
        ]
        with open(f"{tmp}/part.ndjson", "w") as f:
            f.write("\n".join(lines))
        df = ndjson.read_crawl_ndjson(spark, tmp, website_id=42)
        rows = {r["name"]: r for r in df.collect()}
        assert len(rows) == 3  # malformed line skipped
        assert rows["movie"]["ext"] == "mp4"  # split + lowercase
        assert rows[".bashrc"]["ext"] == ""  # hidden file
        assert all(r["website_id"] == 42 for r in rows.values())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_replace_website_docs(files_df, spark):
    new_docs = spark.createDataFrame(
        [(1, "fresh", "newfile", "pdf", 5, None)],
        "website_id long, path string, name string, ext string, size long, mtime timestamp",
    )
    out = ndjson.replace_website_docs(files_df, new_docs, 1)
    assert out.filter(F.col("website_id") == 1).count() == 1  # old docs replaced
    assert out.filter(F.col("website_id") == 2).count() == 3  # others untouched


def test_export_csv(files_df, spark):
    websites = spark.createDataFrame(
        [(1, "http://site1.example/")], "website_id long, url string"
    )
    tmp = tempfile.mkdtemp(prefix="oddb_export_")
    try:
        path = ndjson.export_csv(files_df, websites, tmp)
        back = spark.read.option("header", True).csv(path)
        assert back.count() == files_df.count()
        assert back.filter(F.col("website_url") == "[DELETED]").count() == 4  # sites 2,3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_list_downloads_csv_only(spark, tmp_path):
    """S13+F15 (views.py:25-51): csv-substring filter, dirs dropped."""
    import os

    from od_database_spark.sources import ndjson as S

    d = tmp_path / "dl"
    d.mkdir()
    (d / "export.csv.gz").write_bytes(b"x" * 7)   # '.csv' substring -> kept
    (d / "export.csv").write_bytes(b"y" * 3)
    (d / "notes.txt").write_bytes(b"z")           # no '.csv' -> dropped
    (d / "stuff.csv.d").mkdir()                   # dir -> dropped
    got = S.list_downloads(spark, str(d)).collect()
    assert [r["name"] for r in got] == ["export.csv", "export.csv.gz"]
    assert {r["name"]: r["size"] for r in got} == {"export.csv": 3, "export.csv.gz": 7}
    assert all(os.path.isabs(r["path"]) or r["path"].startswith(str(d)) for r in got)
    # empty/missing dir -> empty frame, same schema
    assert S.list_downloads(spark, str(d / "missing")).count() == 0


def test_index_meta_stats_over_query_log(spark):
    """A9: log_search rows (database.py:302-313) aggregate through
    index_meta_stats (search/search.py:432-439 panel)."""
    from pyspark.sql import functions as F

    from od_database_spark.functions.text import log_search
    from od_database_spark.operators.search import index_meta_stats

    logs = None
    for i, (q, blocked, took) in enumerate(
        [("spark files", False, 120), ("bad term", True, 5), ("more", False, 80)]
    ):
        row = log_search(spark, f"10.0.0.{i}", None, q, ["mp4"], 0, blocked, i, took)
        logs = row if logs is None else logs.unionByName(row)
    ql = logs.select(F.col("took").alias("took_ms"), "blocked")
    files = spark.createDataFrame(
        [(1, 100), (2, 300)], "website_id long, size long"
    )
    got = index_meta_stats(files, ql).collect()[0]
    assert got["doc_count"] == 2 and got["store_bytes"] == 400
    assert got["query_count"] == 3
    assert abs(got["avg_took_ms"] - round((120 + 5 + 80) / 3, 4)) < 1e-9
    assert abs(got["blocked_rate"] - round(1 / 3, 4)) < 1e-9
