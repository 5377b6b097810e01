from od_database_spark.functions import text as X
from pyspark.sql import functions as F


def test_truncate_path():
    # expected values observed from the reference implementation
    # (od_util.py:20-27): successive leading dirs collapse into one '.../'
    # quirk preserved: each replaced dir becomes '.../' (longer than short
    # dir names), so intermediate attempts can GROW and fall through to the
    # '.../'+basename fallback
    assert X.truncate_path("a/b/c/d/file", 10) == ".../file"
    assert X.truncate_path("a/b/c/d/file", 15) == ".../b/c/d/file"
    assert X.truncate_path("short", 99) == "short"
    assert X.truncate_path("dir1/dir2/dir3/x", 14) == ".../x"


def test_format_cols(spark):
    df = spark.createDataFrame(
        [(30.0,), (120.0,), (7200.0,), (200000.0,)], "s double"
    ).select(X.format_duration_col(F.col("s")).alias("d"))
    assert [r["d"] for r in df.collect()] == ["30s", "2m", "2h", "2d"]


def test_log_search_row(spark):
    row = X.log_search(
        spark, "1.2.3.4", None, "query terms", ["mp4", "mkv"], 0, False, 42, 17
    ).collect()[0]
    assert row["extensions"] == "mp4,mkv"
    assert row["results"] == 42 and row["search_time"] is not None
