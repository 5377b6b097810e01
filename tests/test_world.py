"""Synthetic crawl-world generator invariants (FIXTURES.md §2-3, §6)."""

from od_database_spark.datagen import world
from od_database_spark.functions import urlpure


def test_world_deterministic(spark):
    a = world.gen_pages(spark, 20).collect()
    b = world.gen_pages(spark, 20).collect()
    assert sorted(r["url"] for r in a) == sorted(r["url"] for r in b)
    assert len(a) == len(b) and len(a) > 20


def test_page_urls_canonical(spark):
    rows = world.gen_pages(spark, 15).collect()
    for r in rows:
        c = urlpure.canonicalize(r["url"])
        assert c["url"] == r["url"], r["url"]  # generator emits canonical URLs
        assert c["host"] == r["host"]


def test_spam_hosts_exceed_thresholds():
    # is_od rejects: external>11 OR link_tags>5 OR script_tags>7 (od_util.py:196-207)
    spam = world.page_row(5, "/")  # 5 % 13 == 5 → spam
    ext = [l for l in spam["links"] if l.startswith("http://ad")]
    assert len(ext) > 11
    ok = world.page_row(1, "/")
    ext_ok = [l for l in ok["links"] if l.startswith("http://ad")]
    assert len(ext_ok) <= 11
    assert ok["link_tag_count"] <= 5 and ok["script_tag_count"] <= 7


def test_redirect_host_flag():
    assert world.page_row(3, "/")["redirects"]  # 3 % 17 == 3
    assert not world.page_row(1, "/")["redirects"]


def test_tree_depth_capped():
    for r in world._walk_host(0):  # mega host
        path = r["url"].split("/", 3)[-1]
        assert path.count("/") <= world.MAX_DEPTH


def test_seed_list_covers_dedup_cases():
    seeds = world.seed_urls(40)
    assert any(not urlpure.canonicalize(s)["valid"] for s in seeds)  # invalid
    canon = [urlpure.canonicalize(s)["url"] for s in seeds]
    assert len(set(canon)) < len(canon)  # exact dups post-canonicalization
    roots = set(world.root_url(i) for i in range(40))
    assert any(
        c not in roots and any(c.startswith(r) for r in roots) for c in canon
    )  # child paths → parent-prefix dups


def test_robots_and_blacklist(spark):
    robots = {r["host"]: r for r in world.gen_robots(spark, 30).collect()}
    assert len(robots) == 30
    assert all(1 <= r["crawl_delay"] <= 5 for r in robots.values())
    assert any(r["disallow_prefixes"] for r in robots.values())
    bl = world.gen_blacklist(spark, 40).collect()
    assert {r["url"] for r in bl} == {
        f"{world.host_scheme(i)}://{world.host_name(i)}" for i in (0, 19, 38)
    }
