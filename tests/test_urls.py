"""URL semantics truth tables (SURVEY.md §5.1) + Spark/pure parity.

Contracts from the reference: od_util.py:153-172 (validity, extension,
externality), views.py:270 + database.py:270-272 (normalization),
database.py:129-136 (prefix membership), search/search.py:144-145 (ext split).
"""

import posixpath

import pytest
from pyspark.sql import functions as F

from od_database_spark.functions import urlpure
from od_database_spark.functions.categories import get_category
from od_database_spark.functions.urls import (
    blacklist_key_col,
    canonicalize_udf,
    category_col,
    ext_from_name,
    has_extension_col,
    is_valid_url_col,
    name_root,
    parent_prefixes_col,
)

VALID_CASES = [
    ("http://example.com/", True),
    ("https://example.com/files/", True),
    ("ftp://ftp.example.com/", True),
    ("http://example.com", False),  # no trailing slash
    ("gopher://example.com/", False),  # bad scheme
    ("example.com/", False),  # no scheme
    ("http:///", False),  # no host
    ("http://exa mple.com/", False),
    ("", False),
]

EXT_CASES = [
    # (name, expected_ext, expected_root) — splitext semantics
    ("movie.mp4", "mp4", "movie"),
    ("archive.tar.gz", "gz", "archive.tar"),
    ("UPPER.TXT", "txt", "UPPER"),
    ("noext", "", "noext"),
    ("trailingdot.", "", "trailingdot"),
    (".bashrc", "", ".bashrc"),
    (".x.y", "y", ".x"),
    ("x..y", "y", "x."),
    ("", "", ""),
]


@pytest.mark.parametrize("url,expected", VALID_CASES)
def test_is_valid_url_pure(url, expected):
    assert urlpure.is_valid_url(url) == bool(expected)


def test_split_ext_pure():
    for name, ext, root in EXT_CASES:
        r, e = urlpure.split_ext(name)
        assert e == ext, name
        assert r == root, name


def test_has_extension_matches_splitext():
    links = ["a/b/file.txt", "a/b/dir/", "http://x.com", "http://x.com/",
             "file", "a.tar.gz", ".hidden", "x."]
    for link in links:
        assert urlpure.has_extension(link) == (len(posixpath.splitext(link)[1]) > 0)


def test_is_external_link_substring_quirk():
    # Ref quirk (od_util.py:167-172): containment, not host comparison.
    assert not urlpure.is_external_link("http://a.com/", "http://a.com/sub/")
    assert urlpure.is_external_link("http://a.com/", "http://b.org/")
    # relative link resolves inside the base → internal
    assert not urlpure.is_external_link("http://a.com/d/", "sub/")
    # mirror containing the base string anywhere counts as internal (quirk)
    assert not urlpure.is_external_link("http://a.com/", "http://m.net/?u=http://a.com/")


def test_canonicalize():
    c = urlpure.canonicalize("HTTP://ExAmple.COM:80/a/../b/c?z=1&a=2#frag")
    assert c["url"] == "http://example.com/b/c/?a=2&z=1"
    assert c["host"] == "example.com"
    assert c["depth"] == 2
    assert c["valid"]
    # non-default port survives
    assert urlpure.canonicalize("http://e.com:8080/")["url"] == "http://e.com:8080/"
    # already-canonical is a fixpoint
    u = "https://files.example.org/pub/images/"
    assert urlpure.canonicalize(u)["url"] == u
    assert urlpure.canonicalize(urlpure.canonicalize(u)["url"])["url"] == u


def test_parent_prefixes_pure():
    assert urlpure.parent_prefixes("http://a.com/x/y/") == [
        "http://a.com/",
        "http://a.com/x/",
        "http://a.com/x/y/",
    ]
    assert urlpure.parent_prefixes("http://a.com/") == ["http://a.com/"]


def test_blacklist_key():
    assert urlpure.blacklist_key("http://A.com/x/") == "http://a.com"
    assert urlpure.blacklist_key("ftp://f.org:21/pub/") == "ftp://f.org:21"


def test_category_map():
    assert get_category("mp4") == "video"
    assert get_category("jpg") == "image"
    assert get_category("tar") == "archive"
    assert get_category("mka") == "video"  # reference quirk preserved
    assert get_category("pot") == "application"  # reference quirk preserved
    assert get_category("zzz") is None


# --- Spark parity ---------------------------------------------------------


def test_spark_ext_parity(spark):
    names = [c[0] for c in EXT_CASES]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    rows = df.select(
        "name", ext_from_name(F.col("name")).alias("ext"), name_root(F.col("name")).alias("root")
    ).collect()
    by_name = {r["name"]: (r["ext"], r["root"]) for r in rows}
    for name, ext, root in EXT_CASES:
        got_ext, got_root = by_name[name]
        assert got_ext == ext, name
        assert got_root == root, name


def test_spark_canonicalize_parity(spark):
    urls = [u for u, _ in VALID_CASES if u] + [
        "HTTP://ExAmple.COM:80/a/../b/c?z=1&a=2#frag",
        "https://Files.Example.org:443/pub/./images/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", canonicalize_udf(F.col("url")).alias("c")).collect()
    for r in rows:
        expect = urlpure.canonicalize(r["url"])
        got = r["c"].asDict()
        assert got["url"] == expect["url"], r["url"]
        assert got["host"] == expect["host"]
        assert got["valid"] == expect["valid"]
        assert got["depth"] == expect["depth"]


def test_spark_prefixes_parity(spark):
    urls = ["http://a.com/", "http://a.com/x/", "http://a.com/x/y/z/",
            "ftp://f.org/pub/"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", parent_prefixes_col(F.col("url")).alias("p")).collect()
    for r in rows:
        assert list(r["p"]) == urlpure.parent_prefixes(r["url"]), r["url"]


def test_spark_valid_url_col(spark):
    df = spark.createDataFrame([(u,) for u, _ in VALID_CASES if u], "url string")
    rows = df.select("url", is_valid_url_col(F.col("url")).alias("v")).collect()
    expected = {u: e for u, e in VALID_CASES}
    for r in rows:
        assert bool(r["v"]) == bool(expected[r["url"]]), r["url"]


def test_spark_has_extension_col(spark):
    links = ["a/b/file.txt", "a/b/dir/", "http://x.com/", "file", "a.tar.gz"]
    df = spark.createDataFrame([(u,) for u in links], "link string")
    rows = df.select("link", has_extension_col(F.col("link")).alias("h")).collect()
    for r in rows:
        assert bool(r["h"]) == urlpure.has_extension(r["link"]), r["link"]


def test_spark_blacklist_key_and_category(spark):
    df = spark.createDataFrame(
        [("HTTP://Evil.COM/x/y/", "mp4"), ("https://ok.org/", "jpg"), ("ftp://f.io/a/", "zzz")],
        "url string, ext string",
    )
    rows = df.select(
        blacklist_key_col(F.col("url")).alias("k"), category_col(F.col("ext")).alias("c")
    ).collect()
    assert rows[0]["k"] == "http://evil.com" and rows[0]["c"] == "video"
    assert rows[1]["k"] == "https://ok.org" and rows[1]["c"] == "image"
    assert rows[2]["k"] == "ftp://f.io" and rows[2]["c"] is None
