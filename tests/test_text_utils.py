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


def test_truncate_path_matches_reference_regex_form():
    """Property check: the segment-join rewrite equals the reference's
    regex-substitution algorithm (od_util.py:20-27) on a broad input grid."""
    import re

    from od_database_spark.functions.text import truncate_path

    def ref(path, max_len):
        pattern = re.compile(r"/?.*?/")
        for i in range(1, path.count("/")):
            new_path = pattern.sub(".../", path, i)
            if len(new_path) < max_len:
                return new_path
        return ".../" + path.rsplit("/", maxsplit=1)[1] if "/" in path else path

    paths = [
        "a", "a/b", "a/b/c", "a/b/c/d/e/file.txt", "/abs/path/to/thing",
        "trailing/dir/", "dou//ble", "/x/", "just_a_file.bin",
        "media/pictures/2019/holiday/beach/IMG_1234.JPG",
        # '//'-heavy forms with small max_len — the round-2 rewrite diverged
        # exactly here (empty segments + multi-leading slashes)
        "//a/b/c", "///x", "a//b//c", "//", "///", "a///b/c/d",
        "/a//", "//a//b///c//", "x//", "//file",
    ]
    for p in paths:
        for m in (1, 4, 5, 8, 12, 20, 64):
            assert truncate_path(p, m) == ref(p, m), (p, m)

    # fuzz: random slash-dense paths across tight and loose budgets
    import random

    rng = random.Random(1234)
    alphabet = ["a", "bb", "ccc", "", "d"]
    for _ in range(3000):
        p = "/".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
        if rng.random() < 0.5:
            p = "/" * rng.randint(1, 3) + p
        m = rng.randint(1, 30)
        assert truncate_path(p, m) == ref(p, m), (p, m)


def test_fold_properties():
    """Property checks on the full fold table: idempotent everywhere, pure
    ASCII on the covered Latin ranges, identity on plain ASCII."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from od_database_spark.functions.fold import fold_ascii_py

    latin = st.text(
        alphabet=st.one_of(
            st.characters(min_codepoint=0x20, max_codepoint=0x7E),
            st.characters(min_codepoint=0xC0, max_codepoint=0x24F),
            st.characters(min_codepoint=0x1E00, max_codepoint=0x1EFF),
        ),
        max_size=40,
    )

    from od_database_spark.functions.fold import FOLD_UNFOLDABLE

    @settings(max_examples=200, deadline=None)
    @given(latin)
    def check(s):
        folded = fold_ascii_py(s)
        assert fold_ascii_py(folded) == folded  # idempotent
        # covered ranges fold to ASCII except the documented residue (IPA /
        # click / tone letters with no Latin base, math signs)
        assert all(ord(c) < 128 or c in FOLD_UNFOLDABLE for c in folded), folded

    check()

    @settings(max_examples=100, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=40))
    def check_ascii_identity(s):
        assert fold_ascii_py(s) == s

    check_ascii_identity()


def test_fold_ascii_col_fast_path_matches_py(spark):
    """The r6 rlike fast path (skip the replace+translate chain for rows
    with no char in [U+00C0, U+FFFF]) must be invisible: Spark-side fold ==
    the pure-Python table on mixed corpora — pure-ASCII rows (guard skips),
    accented/ligature/typographic rows (chain runs), sub-U+00C0 non-ASCII
    (guard skips AND the table doesn't touch them), empty and NULL."""
    from od_database_spark.functions.fold import fold_ascii_col, fold_ascii_py

    rows = [
        "plain ascii only",
        "",
        "Ångström ﬁne ß straße",          # fold sources incl. multi-char
        "‘quoted’ — dash",       # typographic punctuation
        "«guillemets» ±5 ¿q?",                  # U+0080-00BF: untouched either way
        "mixed zürich and ascii tail",
        None,
    ]
    df = spark.createDataFrame([(s,) for s in rows], "s string")
    got = [r["f"] for r in df.select(fold_ascii_col(F.col("s")).alias("f")).collect()]
    want = [None if s is None else fold_ascii_py(s) for s in rows]
    assert got == want
