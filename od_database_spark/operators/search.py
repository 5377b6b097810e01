"""Search + stats layer over the `files` fact table — the reference's actual
query surface re-expressed as DataFrame plans (SURVEY.md §2.2, §2.4-2.6).

The ES cluster's physical tricks map to Catalyst equivalents: shard routing ≡
partition pruning on website_id; `bool.filter` context ≡ pushed predicates
computed before the scoring projection; bucket `size:` caps ≡
TakeOrderedAndProject.  Scoring is the documented approximation of Q3
(5×name + 2×trigram + path hits — BM25 parity is not a target).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RESULT_WINDOW_CAP = 10_000  # search/search.py:240
SIZE_CLAMP = 1_000_000_000_000  # 1 TB, search/search.py:323
SIZE_HIST_INTERVAL = 100_000_000  # 100 MB, search/search.py:388
MIN_DOC_COUNT = 500  # search/search.py:390,397

# search/search.py:23-30; score handled separately.  (col, ascending) pairs —
# Column objects can't be built at import time (no active SparkContext).
SORT_ORDERS = {
    "size_asc": [("size", True)],
    "size_dsc": [("size", False)],
    "date_asc": [("mtime", True)],
    "date_desc": [("mtime", False)],
    "none": [],
}


def _sort_cols(sort_order: str) -> list[Column]:
    return [
        F.asc(c) if asc else F.desc(c) for c, asc in SORT_ORDERS.get(sort_order, [])
    ]


def _clamped(files: DataFrame) -> DataFrame:
    return files.filter((F.col("size") >= 0) & (F.col("size") < SIZE_CLAMP))


def get_stats(files: DataFrame, website_id: int) -> DataFrame:
    """A1+A2: per-website ext breakdown, top 12 by doc count, plus bucket
    size sums (search/search.py:245-284).  The website_id filter prunes
    partitions when `files` is written partitioned by bucket(website_id)."""
    return (
        files.filter(F.col("website_id") == website_id)
        .groupBy("ext")
        .agg(F.count("*").alias("doc_count"), F.sum("size").alias("size_sum"))
        .orderBy(F.desc("doc_count"), F.asc("ext"))
        .limit(12)
    )


def global_stats(files: DataFrame) -> dict[str, DataFrame]:
    """A4-A8: the four global aggregation jobs the reference regenerates on a
    120-min schedule (search/search.py:316-458) — here one dict of lazy
    DataFrames a scheduled job can materialize to a stats table."""
    c = _clamped(files)
    ext_stats = (
        c.groupBy("ext")
        .agg(F.count("*").alias("doc_count"), F.sum("size").alias("size_sum"))
        .orderBy(F.desc("doc_count"), F.asc("ext"))
        .limit(40)
    )
    file_stats = c.agg(
        F.count("*").alias("count"),
        F.sum("size").alias("sum"),
        F.avg("size").alias("avg"),
        F.stddev_pop("size").alias("std_deviation"),
        F.var_pop("size").alias("variance"),
    ).select(
        "*",
        (F.col("avg") + F.col("std_deviation")).alias("std_upper"),
        (F.col("avg") - F.col("std_deviation")).alias("std_lower"),
    )
    sizes_histogram = (
        c.groupBy(
            (F.floor(F.col("size") / SIZE_HIST_INTERVAL) * SIZE_HIST_INTERVAL).alias("bucket")
        )
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") >= MIN_DOC_COUNT)
        .orderBy("bucket")
    )
    dates_histogram = (
        c.filter(F.unix_timestamp("mtime") > 0)
        .groupBy(F.year("mtime").alias("year"))
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") >= MIN_DOC_COUNT)
        .orderBy("year")
    )
    website_scatter = (
        c.groupBy("website_id")
        .agg(F.count("*").alias("doc_count"), F.sum("size").alias("size_sum"))
        .orderBy(F.desc("doc_count"), F.asc("website_id"))
        .limit(600)
    )
    return {
        "ext_stats": ext_stats,
        "file_stats": file_stats,
        "sizes_histogram": sizes_histogram,
        "dates_histogram": dates_histogram,
        "website_scatter": website_scatter,
    }


def _trigrams(col: Column) -> Column:
    """Q1: 3-gram set of a lowercased, whitespace-stripped string — the
    nGram(3,3)+lowercase analyzer (search/search.py:59-71) as a native
    expression."""
    s = F.lower(col)
    return F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(s) - 2, F.lit(0))),
                lambda i: F.substring(s, i, 3),
            ),
            lambda g: F.length(g) == 3,
        )
    )


def score_expr(q: str, fields: list[str]) -> Column:
    """Q2+Q3: multi-field match score with the reference's boosts
    (name^5, name.nGram^2, path^1 — views.py:185-199)."""
    tokens = [t for t in q.lower().split() if t]
    score = F.lit(0)
    if "name" in fields:
        name_words = F.split(F.lower(F.col("name")), r"[^a-z0-9]+")
        hits = sum(
            (F.array_contains(name_words, t).cast("int") for t in tokens),
            F.lit(0),
        )
        score = score + F.lit(5) * hits
    if "name.nGram" in fields:
        grams = _trigrams(F.col("name"))
        q_grams = [t[i : i + 3] for t in tokens for i in range(max(len(t) - 2, 0))]
        if q_grams:
            overlap = sum(
                (F.array_contains(grams, g).cast("int") for g in set(q_grams)),
                F.lit(0),
            )
            score = score + F.lit(2) * overlap
    if "path" in fields:
        path_words = F.split(F.lower(F.col("path")), r"[^a-z0-9]+")
        hits = sum(
            (F.array_contains(path_words, t).cast("int") for t in tokens),
            F.lit(0),
        )
        score = score + hits
    return score


def match_expr(q: str, fields: list[str], match_all: bool) -> Column:
    """Q2 operator semantics: AND unless match_all (views.py:183 maps the
    'all' flag to OR — quirk preserved: match_all=True means OR).

    A token with no applicable field predicate (e.g. fields=['name.nGram']
    with a sub-3-char token — a combination the reference UI allows via
    field_trigram) contributes FALSE; an empty tokenized query matches
    nothing — both mirror ES's graceful no-hit behavior."""
    tokens = [t for t in q.lower().split() if t]
    per_token = []
    for tk in tokens:
        cols = []
        if "name" in fields:
            cols.append(F.array_contains(F.split(F.lower(F.col("name")), r"[^a-z0-9]+"), tk))
        if "name.nGram" in fields and len(tk) >= 3:
            grams = [tk[i : i + 3] for i in range(len(tk) - 2)]
            g = _trigrams(F.col("name"))
            hit = F.array_contains(g, grams[0])
            for gr in grams[1:]:
                hit = hit & F.array_contains(g, gr)
            cols.append(hit)
        if "path" in fields:
            cols.append(F.array_contains(F.split(F.lower(F.col("path")), r"[^a-z0-9]+"), tk))
        tok_hit = cols[0] if cols else F.lit(False)
        for c in cols[1:]:
            tok_hit = tok_hit | c
        per_token.append(tok_hit)
    if not per_token:
        return F.lit(False)
    out = per_token[0]
    for p in per_token[1:]:
        out = (out | p) if match_all else (out & p)
    return out


def _search_matches(
    files: DataFrame,
    q: str,
    extensions: list[str] | None = None,
    size_min: int = 0,
    size_max: int = 0,
    match_all: bool = False,
    fields: list[str] | None = None,
    date_min: int = 0,
    date_max: int = 0,
) -> DataFrame:
    """The filter+match frame BEFORE score/sort/pagination — what
    ``hits.total`` counts (views.py:218-219)."""
    fields = fields or ["path", "name", "name.nGram"]
    exts = [e.strip().strip(".").lower() for e in (extensions or []) if e.strip()]

    df = files
    if exts:  # F2
        df = df.filter(F.col("ext").isin(exts))
    if size_min > 0:  # F3
        df = df.filter(F.col("size") >= size_min)
    if size_max:
        df = df.filter(F.col("size") <= size_max)
    if date_min > 0:  # F4
        df = df.filter(F.unix_timestamp("mtime") >= date_min)
    if date_max:
        df = df.filter(F.unix_timestamp("mtime") <= date_max)
    return df.filter(match_expr(q, fields, match_all))


def search(
    files: DataFrame,
    q: str,
    page: int = 0,
    per_page: int = 50,
    sort_order: str = "score",
    extensions: list[str] | None = None,
    size_min: int = 0,
    size_max: int = 0,
    match_all: bool = False,
    fields: list[str] | None = None,
    date_min: int = 0,
    date_max: int = 0,
) -> DataFrame:
    """The /search entry point (views.py:157-199 param semantics +
    search/search.py:191-241 query construction)."""
    if len(q) < 3:  # views.py:201
        return files.limit(0)
    df = _search_matches(
        files, q, extensions=extensions, size_min=size_min, size_max=size_max,
        match_all=match_all, fields=fields, date_min=date_min, date_max=date_max,
    )
    fields = fields or ["path", "name", "name.nGram"]
    df = df.withColumn("score", score_expr(q, fields))

    order = [F.desc("score")] if sort_order == "score" else _sort_cols(sort_order)
    order = order + [F.asc("website_id"), F.asc("path"), F.asc("name"), F.asc("ext")]
    start = min(page * per_page, RESULT_WINDOW_CAP - per_page)  # O2 cap
    w = Window.orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > start) & (F.col("rn") <= start + per_page))
        .drop("rn")
    )


# SearchLogEntry shape (init_script.sql:28-39; writer database.py:302-313):
# `took` is milliseconds, `extensions` the raw comma list, `blocked` the
# filter.py gate outcome, `results` the total hit count.
QUERY_LOG_SCHEMA = (
    "search_time timestamp, remote_addr string, forwarded_for string, "
    "query string, extensions string, page int, blocked boolean, "
    "results long, took_ms double"
)


def is_blocked_query(q: str, blocked_terms) -> bool:
    """The query blocklist gate (search/filter.py:20-31): ascii-fold +
    lowercase + whitespace-split + strip quote/slash chars + token-in-set.
    Driver-side pure Python — it gates ONE query string, the one place
    row-at-a-time is the right altitude."""
    from ..functions.fold import fold_ascii_py

    blocked = {t.lower() for t in blocked_terms}
    for tok in fold_ascii_py(q).lower().split():
        if tok.strip("\"'/\\") in blocked:
            return True
    return False


def search_and_log(
    spark,
    files: DataFrame,
    log_dir: str,
    q: str,
    blocked_terms=(),
    remote_addr: str = "",
    forwarded_for: str = "",
    page: int = 0,
    **kwargs,
) -> DataFrame:
    """The full /search entry point INCLUDING the reference's search logging
    (views.py:211-227 + database.py:302-313): gate the query against the
    blocklist, run the search, and append exactly one SearchLogEntry row —
    query, extensions, page, blocked flag, total hit count, wall ms — to the
    append-only ``query_log`` parquet dir (the A9 meta-stats input).  A
    blocked query logs blocked=True with zero results and returns no rows
    (the InvalidQueryException branch, with two DOCUMENTED divergences:
    the reference logs results=-1/took=-1 sentinels there — views.py:
    218-220 — where this logs the honest 0 and measured wall-ms; and
    is_blocked_query matches case-insensitively where the reference's
    SearchFilter compares file terms verbatim).

    The total-hits count is an action (the reference's hits.total is too);
    the returned page DataFrame stays lazy."""
    import time as _time

    t0 = _time.time()
    blocked = bool(blocked_terms) and is_blocked_query(q, blocked_terms)
    if blocked:
        results, out = 0, files.limit(0)
    else:
        out = search(files, q, page=page, **kwargs)
        # total hits = the match count BEFORE pagination (hits.total,
        # views.py:218-219) — no window, no cap
        match_kw = {
            k: v for k, v in kwargs.items()
            if k in ("extensions", "size_min", "size_max", "match_all",
                     "fields", "date_min", "date_max")
        }
        results = 0 if len(q) < 3 else _search_matches(files, q, **match_kw).count()
    took_ms = (_time.time() - t0) * 1000.0
    exts = ",".join(kwargs.get("extensions") or [])
    row = [(remote_addr, forwarded_for, q, exts, int(page), blocked,
            int(results), float(took_ms))]
    (
        spark.createDataFrame(
            row,
            "remote_addr string, forwarded_for string, query string, "
            "extensions string, page int, blocked boolean, results long, "
            "took_ms double",
        )
        .withColumn("search_time", F.current_timestamp())
        .select(
            "search_time", "remote_addr", "forwarded_for", "query",
            "extensions", "page", "blocked", "results", "took_ms",
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(log_dir)
    )
    return out


def read_query_log(spark, log_dir: str) -> DataFrame:
    return spark.read.schema(QUERY_LOG_SCHEMA).parquet(log_dir)


def highlight(df: DataFrame, q: str) -> DataFrame:
    """Q4: <mark>-wrap matched terms in name and path
    (search/search.py:233-239).  Tokens are regex-ESCAPED: the reference's ES
    highlighter never treats the query as a pattern, so 'c++' or '(foo' must
    highlight literally instead of crashing the Java regex compiler."""
    import re

    tokens = [t for t in q.lower().split() if t]
    if not tokens:
        return df.withColumn("name_hl", F.col("name")).withColumn(
            "path_hl", F.col("path")
        )
    pattern = "(?i)(" + "|".join(re.escape(t) for t in tokens) + ")"
    return df.withColumn(
        "name_hl", F.regexp_replace("name", pattern, "<mark>$1</mark>")
    ).withColumn("path_hl", F.regexp_replace("path", pattern, "<mark>$1</mark>"))


def index_meta_stats(files: DataFrame, query_log: DataFrame) -> DataFrame:
    """A9 (search/search.py:432-439): the reference's index meta-stats panel —
    ES store size + doc count + query count + average query latency — as one
    aggregation over the fact table and the query_log (database.py:302-313
    rows; blocked rate added from the SearchLogEntry.blocked column).

    Two single-row partial+final aggregations and a 1×1 cross join: no
    data-proportional shuffle at any scale."""
    idx = files.agg(
        F.count("*").alias("doc_count"), F.sum("size").alias("store_bytes")
    )
    ql = query_log.agg(
        F.count("*").alias("query_count"),
        F.round(F.avg("took_ms"), 4).alias("avg_took_ms"),
        F.round(F.avg(F.col("blocked").cast("double")), 4).alias("blocked_rate"),
    )
    return idx.crossJoin(ql)


def get_link_list(files: DataFrame, websites: DataFrame, website_id: int) -> DataFrame:
    """J5: reconstruct full URLs for one website's docs
    (search/search.py:286-305): base + path + '/'? + name + '.'? + ext."""
    base = websites.filter(F.col("website_id") == website_id).select(
        "website_id", F.col("url").alias("base_url")
    )
    docs = files.filter(F.col("website_id") == website_id).select(
        "website_id", "path", "name", "ext"
    )
    return docs.join(F.broadcast(base), on="website_id").select(
        F.concat(
            F.col("base_url"),
            F.col("path"),
            F.when(F.col("path") != "", "/").otherwise(""),
            F.col("name"),
            F.when(F.col("ext") != "", ".").otherwise(""),
            F.col("ext"),
        ).alias("link")
    )
