"""Spark-side URL functions: vectorized canonicalization UDF + native column
expressions for validity / ext-derivation / prefix expansion / categories.

Design rule (SURVEY.md §2.9): Python touches data ONLY inside Arrow-batched
pandas UDFs, and only where urllib-grade parsing is genuinely needed
(canonicalization).  Everything downstream of the canonical struct — hashing,
prefix explosion, validity gating, ext splitting, category lookup — is native
Catalyst expressions so it stays inside WholeStageCodegen at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .categories import CATEGORY_BY_EXT
from .urlpure import canonicalize

CANON_TYPE = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("scheme", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("valid", T.BooleanType()),
    ]
)


@F.pandas_udf(CANON_TYPE)
def canonicalize_udf(urls: pd.Series) -> pd.DataFrame:
    """Arrow-batched canonicalizer (north_rule C1).

    Semantics: lowercase host, strip fragment + default port, sort query
    params, resolve dot segments, force trailing '/'
    (views.py:270 os.path.join(url,''); database.py:270-272 netloc norm).
    """
    rows = [canonicalize(u) for u in urls]
    return pd.DataFrame.from_records(
        rows, columns=["url", "host", "scheme", "path", "depth", "valid"]
    )


def with_canonical(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach canonical struct + 64-bit key.

    The key is JVM-side ``xxhash64`` (no Python in the hot path); the
    reference keys tasks with hash64=website_id (tasks.py:158) — we key at
    URL granularity and keep the host for partition affinity.
    """
    c = canonicalize_udf(F.col(url_col))
    return (
        df.withColumn("_canon", c)
        .withColumn("canon_url", F.col("_canon.url"))
        .withColumn("host", F.col("_canon.host"))
        .withColumn("scheme", F.col("_canon.scheme"))
        .withColumn("depth", F.col("_canon.depth"))
        .withColumn("url_valid", F.col("_canon.valid"))
        .withColumn("url_hash", F.xxhash64(F.col("_canon.url")))
        .drop("_canon")
    )


# --- native column expressions -------------------------------------------


def ext_from_name(name: Column) -> Column:
    """Ingest ext derivation (search/search.py:144-145), splitext semantics:
    leading dots don't start an extension ('.bashrc' → ''), the split is on
    the LAST dot, the ext must be non-empty ('a.' → ''), and it's lowercased.
    Pure Catalyst — stays in WholeStageCodegen."""
    stripped = F.regexp_replace(name, r"^\.+", "")
    last = F.substring_index(stripped, ".", -1)
    return F.when(
        stripped.contains(".") & (F.length(last) > 0), F.lower(last)
    ).otherwise(F.lit(""))


def name_root(name: Column) -> Column:
    """The name with its extension split off (the reference stores
    name=splitext(name)[0] — search/search.py:144-146)."""
    stripped = F.regexp_replace(name, r"^\.+", "")
    last = F.substring_index(stripped, ".", -1)
    # splitext splits even when the ext part is a bare '.' ('a.' → root 'a'),
    # so the root drops len(last)+1 chars whenever the stripped name has a dot.
    has_split = stripped.contains(".")
    return F.when(
        has_split, F.substring(name, F.lit(1), F.length(name) - F.length(last) - 1)
    ).otherwise(name)


def is_valid_url_col(url: Column) -> Column:
    """Native approximation of od_util.py:153-160 for filtering at scale; the
    canonicalize UDF's ``valid`` field is the authoritative check."""
    return (
        url.endswith("/")
        & (url.startswith("http://") | url.startswith("https://") | url.startswith("ftp://"))
        & url.rlike(r"^(http|https|ftp)://([A-Za-z0-9]([A-Za-z0-9-]*[A-Za-z0-9])?\.)+[A-Za-z]{2,63}(:\d{1,5})?(/\S*)?$")
    )


def has_extension_col(link: Column) -> Column:
    """Native od_util.py:163-164: splitext on the whole link (quirk preserved:
    bare hosts have 'extension' .tld)."""
    base = F.substring_index(link, "/", -1)
    last = F.substring_index(base, ".", -1)
    return base.contains(".") & (last != base) & (F.length(last) > 0)


def parent_prefixes_col(canon_url: Column) -> Column:
    """array<string> of all '/'-boundary prefixes of a canonical URL,
    including the site root and the URL itself — the equi-ized form of the
    reference's prefix theta-join (database.py:129-136).  Pure Catalyst:
    no Python, explodes to ≤ depth+1 rows.

    Built as ONE cumulative fold over the path segments (r6): each step
    extends the running prefix and appends it — O(depth) concat work per
    row, vs the former transform(slice + array_join) which rebuilt every
    prefix from scratch (O(depth²); ~35% slower on the exploded prefix
    stage, measured sf1.0).  An empty path yields the fold's initial state
    [root], so the old sequence(1,0)-descends guard is unnecessary."""
    no_query = F.substring_index(canon_url, "?", 1)  # directory part only
    rest = F.regexp_replace(no_query, r"^[a-z]+://", "")
    scheme = F.regexp_extract(canon_url, r"^([a-z]+)://", 1)
    netloc = F.substring_index(rest, "/", 1)
    root = F.concat(scheme, F.lit("://"), netloc, F.lit("/"))
    path = F.substring(rest, F.length(netloc) + 2, F.lit(1 << 30))  # after 'netloc/'
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    return F.aggregate(
        segs,
        F.struct(root.alias("cur"), F.array(root).alias("out")),
        lambda acc, s: F.struct(
            F.concat(acc["cur"], s, F.lit("/")).alias("cur"),
            F.array_append(
                acc["out"], F.concat(acc["cur"], s, F.lit("/"))
            ).alias("out"),
        ),
    )["out"]


def blacklist_key_col(url: Column) -> Column:
    """scheme://netloc (database.py:270-272), natively."""
    scheme = F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    netloc = F.substring_index(F.substring_index(rest, "/", 1), "#", 1)
    return F.concat(F.lower(scheme), F.lit("://"), F.lower(netloc))


def category_col(ext: Column) -> Column:
    """X4: ext → category via a literal map (constant-folded by Catalyst;
    od_util.py:149-150)."""
    pairs: list[Column] = []
    for e, c in CATEGORY_BY_EXT.items():
        pairs.append(F.lit(e))
        pairs.append(F.lit(c))
    return F.create_map(*pairs)[ext]
