"""Deterministic synthetic crawl world (SURVEY.md §7 step 1, FIXTURES.md).

The reference crawled live open directories; this engine's tests and benches
need the same *shape* without the network: a host set with a skewed page-tree
distribution, per-page link lists obeying the od_util externality/threshold
semantics (od_util.py:167-213), image files whose bytes/captions derive purely
from their URL, a robots/crawl-delay dim, and a seed list exercising every
dedup path (exact dup, parent-prefix dup, blacklist, invalid —
views.py:269-302).

Everything is a pure function of (seed, host_id, path), generated
distributed-side via ``spark.range`` + ``mapInPandas`` — no driver-side
materialization, so the same generator shape scales to a 10^10-URL frontier
(rows are produced lazily per partition).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import schema

MAX_DEPTH = 3
SPAM_MOD = 13  # host_id % 13 == 5 → too many external links (is_od reject)
REDIRECT_MOD = 17  # host_id % 17 == 3 → redirect root (is_od reject)
MEGA_MOD = 29  # host_id % 29 == 0 → mega host (deep/wide tree, drives skew)


def _h64(*parts) -> int:
    d = hashlib.sha256("\x00".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(d[:8], "little")


def host_name(host_id: int) -> str:
    tld = ("net", "org", "com", "io")[host_id % 4]
    scheme_part = "ftp" if host_id % 11 == 7 else "files"
    return f"{scheme_part}{host_id}.oddb-w{host_id % 8}.{tld}"


def host_scheme(host_id: int) -> str:
    if host_id % 11 == 7:
        return "ftp"
    return "https" if host_id % 3 == 0 else "http"


def root_url(host_id: int) -> str:
    return f"{host_scheme(host_id)}://{host_name(host_id)}/"


def is_spam_host(host_id: int) -> bool:
    return host_id % SPAM_MOD == 5


def is_redirect_host(host_id: int) -> bool:
    return host_id % REDIRECT_MOD == 3


def _subdir_names(host_id: int, path: str) -> list[str]:
    depth = path.count("/") - 1
    if depth >= MAX_DEPTH:
        return []
    width = 4 if host_id % MEGA_MOD == 0 else 2
    n = _h64("sub", host_id, path) % (width + 1)
    if depth == 0 and host_id % MEGA_MOD == 0:
        n = width + 2  # mega hosts branch hard at the root
    names = []
    pool = ("media", "images", "backup", "pub", "data", "archive", "private", "misc")
    for i in range(n):
        names.append(pool[_h64("subname", host_id, path, i) % len(pool)] + f"{i}")
    # one literal 'private' dir at the root for robots disallow tests
    if depth == 0 and _h64("priv", host_id) % 3 == 0:
        names.append("private")
    return sorted(set(names))


def _image_files(host_id: int, path: str) -> list[str]:
    n = _h64("img", host_id, path) % 6
    exts = ("jpg", "png", "bmp", "jpeg", "gif")
    return [
        f"photo_{_h64('imgname', host_id, path, i) % 10**8:08d}."
        + exts[_h64("imgext", host_id, path, i) % len(exts)]
        for i in range(n)
    ]


def _other_files(host_id: int, path: str) -> list[str]:
    n = _h64("oth", host_id, path) % 4
    exts = ("txt", "mp4", "zip", "pdf", "iso", "mp3")
    return [
        f"file_{_h64('othname', host_id, path, i) % 10**6:06d}."
        + exts[_h64("othext", host_id, path, i) % len(exts)]
        for i in range(n)
    ]


def page_links(host_id: int, path: str) -> list[str]:
    """Ordered link list of one directory page: parent link, subdirs, files,
    then external links (count drives the is_od threshold)."""
    links = ["../"] if path != "/" else []
    links += [s + "/" for s in _subdir_names(host_id, path)]
    links += _image_files(host_id, path)
    links += _other_files(host_id, path)
    n_ext = 20 if is_spam_host(host_id) else _h64("next", host_id, path) % 4
    links += [
        f"http://ad{i}.external-w{_h64('ext', host_id, path, i) % 5}.example/"
        for i in range(n_ext)
    ]
    return links


def page_row(host_id: int, path: str) -> dict:
    url = root_url(host_id)[:-1] + path
    spam = is_spam_host(host_id)
    return {
        "url": url,
        "host": host_name(host_id),
        "links": page_links(host_id, path),
        "link_tag_count": 9 if spam else int(_h64("lt", host_id, path) % 5),
        "script_tag_count": 11 if spam else int(_h64("st", host_id, path) % 6),
        "redirects": is_redirect_host(host_id),
    }


def _walk_host(host_id: int) -> Iterator[dict]:
    stack = ["/"]
    while stack:
        path = stack.pop()
        yield page_row(host_id, path)
        for sub in _subdir_names(host_id, path):
            stack.append(path + sub + "/")


def gen_pages(spark: SparkSession, n_hosts: int, parallelism: int | None = None) -> DataFrame:
    """All directory pages of the synthetic world, one partition range per
    host block — embarrassingly parallel, no shuffle."""
    parallelism = parallelism or spark.sparkContext.defaultParallelism

    def emit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host_id in pdf["id"]:
                rows.extend(_walk_host(int(host_id)))
            if rows:
                yield pd.DataFrame(rows)

    return (
        spark.range(0, n_hosts, 1, parallelism)
        .mapInPandas(emit, schema=schema.PAGES)
    )


def gen_robots(spark: SparkSession, n_hosts: int, parallelism: int | None = None) -> DataFrame:
    """Politeness dim: crawl_delay 1-5s, literal /private/ disallowed for a
    third of hosts (north_rule C9; not present in the reference snapshot)."""
    parallelism = parallelism or spark.sparkContext.defaultParallelism

    def emit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host_id in pdf["id"]:
                host_id = int(host_id)
                rows.append(
                    {
                        "host": host_name(host_id),
                        "crawl_delay": float(1 + _h64("delay", host_id) % 5),
                        "disallow_prefixes": ["/private/"]
                        if _h64("priv", host_id) % 3 == 0
                        else [],
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return spark.range(0, n_hosts, 1, parallelism).mapInPandas(emit, schema=schema.ROBOTS)


def gen_blacklist(spark: SparkSession, n_hosts: int) -> DataFrame:
    """Every 19th host is blacklisted (scheme://netloc form,
    database.py:270-272)."""
    rows = [
        (int(i), f"{host_scheme(i)}://{host_name(i)}")
        for i in range(0, n_hosts, 19)
    ]
    return spark.createDataFrame(rows or [(0, "http://never.invalid")], schema.BLACKLIST)


def seed_urls(n_hosts: int) -> list[str]:
    """Raw submit-time seed list exercising every dedup path (§5.3):
    valid roots, messy-but-canonicalizable variants, exact dups, child paths
    (parent-prefix dups), blacklisted hosts, and invalid URLs.  Ordered —
    submit_seq is the list index (FIFO tie-break, tasks.py:91-112)."""
    seeds: list[str] = []
    for i in range(n_hosts):
        root = root_url(i)
        seeds.append(root)
        k = _h64("seedvar", i) % 8
        if k == 0:
            seeds.append(root.upper())  # canonicalizes to a dup
        elif k == 1:
            seeds.append(root[:-1])  # missing trailing slash → canonical dup
        elif k == 2:
            seeds.append(root + "media0/")  # nonexistent child: prefix-dup path
        elif k == 3:
            seeds.append(root + "#frag")  # fragment → dup
        elif k == 4:
            seeds.append("not a url " + str(i))  # invalid
        elif k == 5:
            subs = _subdir_names(i, "/")
            if subs:  # REAL child: get_top_directory climbs it back to root
                seeds.append(root + subs[0] + "/")
    return seeds


def gen_seeds(spark: SparkSession, n_hosts: int) -> DataFrame:
    urls = seed_urls(n_hosts)
    return spark.createDataFrame(
        [(u, i, 1) for i, u in enumerate(urls)],
        "url string, submit_seq long, priority int",
    )
