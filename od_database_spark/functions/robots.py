"""robots.txt → politeness dim, parsed with NATIVE expressions only.

The reference delegates fetching (and robots compliance) to its external
crawler fleet (README.md:29-30); the north rule makes robots.txt + crawl-
delay budgets part of this engine's scheduler.  The scheduler consumes the
parsed dim (host, crawl_delay, disallow_prefixes); this module produces that
dim from RAW robots.txt bodies so the fetch loop can feed /robots.txt
responses straight in.

Parsing is one `F.aggregate` fold over the split lines carrying a small
state struct — standard REP '*'-group semantics (a run of User-agent lines
forms one group; its directives apply iff '*' is among them), comments
stripped, blank-tolerant.  No Python in the loop: 10^8 robots bodies parse
as one whole-stage-codegen'd projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def robots_rules_col(txt: Column) -> Column:
    """Struct column (crawl_delay double, disallow_prefixes array<string>)
    for the '*' user-agent group of one robots.txt body."""
    lines = F.split(txt, r"\r?\n")
    init = F.struct(
        F.lit(False).alias("active"),
        F.lit(None).cast("double").alias("delay"),
        F.array().cast("array<string>").alias("prefixes"),
        F.lit(False).alias("in_ua"),
    )

    def step(acc: Column, raw: Column) -> Column:
        l2 = F.trim(F.regexp_replace(raw, "#.*$", ""))
        # a COMMENT-ONLY line is absent per RFC 9309 — it must not end a
        # User-agent run (previously 'User-agent: *\\n# c\\nUser-agent: x'
        # split the run and dropped the '*' group's rules).  True blank
        # lines keep their run-terminating behavior.
        is_comment_only = (F.trim(raw) != "") & (l2 == "")
        key = F.lower(F.trim(F.substring_index(l2, ":", 1)))
        val = F.trim(F.regexp_extract(l2, "^[^:]*:(.*)$", 1))
        is_ua = key == F.lit("user-agent")
        # a RUN of User-agent lines forms one group: '*' anywhere in the run
        # activates it; a UA line outside a run starts a fresh group
        active = (
            F.when(is_ua & (val == "*"), F.lit(True))
            .when(is_ua & acc["in_ua"], acc["active"])
            .when(is_ua, F.lit(False))
            .otherwise(acc["active"])
        )
        # only overwrite on a SUCCESSFUL parse: an unparseable value (e.g.
        # 'Crawl-delay: 10s' after a valid 'Crawl-delay: 10') must not null
        # out a captured delay — politeness_select would coalesce the null
        # to the 1.0s default and crawl faster than the site asked.
        # try_cast, not cast: under ANSI mode a malformed value in ONE
        # robots.txt would otherwise fail the whole parse job
        delay = F.when(
            ~is_ua & (key == F.lit("crawl-delay")) & acc["active"],
            F.coalesce(val.try_cast("double"), acc["delay"]),
        ).otherwise(acc["delay"])
        prefixes = F.when(
            ~is_ua & (key == F.lit("disallow")) & acc["active"] & (val != ""),
            F.array_append(acc["prefixes"], val),
        ).otherwise(acc["prefixes"])
        return F.when(is_comment_only, acc).otherwise(
            F.struct(
                active.alias("active"),
                delay.alias("delay"),
                prefixes.alias("prefixes"),
                is_ua.alias("in_ua"),
            )
        )

    return F.aggregate(
        lines,
        init,
        step,
        lambda acc: F.struct(
            acc["delay"].alias("crawl_delay"),
            acc["prefixes"].alias("disallow_prefixes"),
        ),
    )


def parse_robots(raw: DataFrame, host_col: str = "host", txt_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) → the scheduler's politeness dim
    (host, crawl_delay, disallow_prefixes).  A null/missing crawl-delay stays
    null — politeness_select coalesces it to the 1.0 s default."""
    rules = robots_rules_col(F.col(txt_col))
    return raw.select(
        F.col(host_col).alias("host"),
        rules["crawl_delay"].alias("crawl_delay"),
        rules["disallow_prefixes"].alias("disallow_prefixes"),
    )
