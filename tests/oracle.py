"""Single-threaded pure-Python oracle replaying the reference's semantics.

Independent of the Spark operators (no DataFrames): dict/set based, serial,
modeled directly on the reference code paths —
- submit chain: views.py:269-302 (canonicalize → valid → exact seen →
  parent-prefix seen → blacklist → is_od), processed in submission order
- task queue: priority DESC then FIFO (tasks.py:149-166, task tracker)
- enqueue-time duplicate suppression: database.py:78-90, 129-136
- politeness budget: floor(round_seconds / crawl_delay) per host per round
  (north_rule C9)

Used to verify crawl-order + URL-seen-set equality bit-for-bit.
"""

from __future__ import annotations

import re

from od_database_spark.functions import urlpure

IMAGE_EXT_RE = re.compile(r"\.(jpg|jpeg|png|bmp|gif)$")


class Oracle:
    def __init__(self, pages: dict, robots: dict, blacklist: set):
        self.pages = pages  # url -> {"links": [...], "redirects": bool,
        #                    "link_tag_count": int, "script_tag_count": int}
        self.robots = robots  # host -> (crawl_delay, [disallow_prefixes])
        self.blacklist = blacklist  # {scheme://netloc}
        self.websites: dict[str, int] = {}  # canon url -> submit_seq
        self.seen: set[str] = set()
        self.frontier: list[dict] = []
        self.next_seq = 0
        self.crawl_order: list[tuple[str, int]] = []
        self.image_urls: set[str] = set()

    # --- submit ------------------------------------------------------------

    def _is_od(self, url: str) -> bool:
        if url.startswith("ftp://"):
            # od_util.py:180-185: FTP login liveness only, no tag heuristics
            return url in self.pages
        page = self.pages.get(url)
        if page is None or page["redirects"]:
            return False
        base = url
        ext = sum(
            1
            for l in page["links"]
            if urlpure.is_external_link(base, l)
        )
        if ext > 11 or page["link_tag_count"] > 5 or page["script_tag_count"] > 7:
            return False
        return True

    def _has_parent_dir(self, url: str) -> bool:
        """od_util.py:216-240: parent exists, links back to the child, and
        passes is_od."""
        path = re.sub(r"^[a-z]+://[^/]+", "", url)
        if path == "/" or url.startswith("ftp://"):
            return False
        m = re.search(r"([^/]+/)$", path)
        child = m.group(1) if m else ""
        parent = re.sub(r"[^/]+/$", "", url)
        page = self.pages.get(parent)
        if page is None or not child:
            return False
        if child not in page["links"]:
            return False
        return self._is_od(parent)

    def get_top_directory(self, url: str) -> str:
        """od_util.py:242-248 fixpoint."""
        while self._has_parent_dir(url):
            url = re.sub(r"[^/]+/$", "", url)
        return url

    def submit(self, raw_urls: list[tuple[str, int, int]]) -> list[str]:
        """raw_urls: (url, submit_seq, priority) in submission order."""
        accepted = []
        for url, seq, priority in sorted(raw_urls, key=lambda t: t[1]):
            c = urlpure.canonicalize(url)
            if not c["valid"]:
                continue
            canon = self.get_top_directory(c["url"])
            if canon in self.websites:
                continue  # exact dup (database.py:78-90)
            if any(
                p in self.websites for p in urlpure.parent_prefixes(canon)[:-1]
            ) or canon in self.websites:
                continue  # parent-prefix dup (database.py:129-136)
            if urlpure.blacklist_key(canon) in self.blacklist:
                continue
            if not self._is_od(canon):
                continue
            self.websites[canon] = seq
            accepted.append((canon, c["host"], priority, seq))
        # queue order: priority DESC then FIFO (submission order)
        accepted.sort(key=lambda t: (-t[2], t[3]))
        for canon, host, priority, seq in accepted:
            self.frontier.append(
                {
                    "url": canon,
                    "host": host,
                    "priority": priority,
                    "depth": 0,
                    "seq": self.next_seq,
                }
            )
            self.seen.add(canon)
            self.next_seq += 1
        return [e["url"] for e in self.frontier]

    # --- crawl -------------------------------------------------------------

    def crawl_round(self, round_seconds: int = 60) -> int:
        """One BFS round.  Returns the number of pages fetched."""
        # per-host budget selection, rank by (priority DESC, seq ASC)
        by_host: dict[str, list[dict]] = {}
        for e in self.frontier:
            by_host.setdefault(e["host"], []).append(e)
        due, carry = [], []
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (-e["priority"], e["seq"]))
            delay, _ = self.robots.get(host, (1.0, []))
            budget = int(round_seconds // delay)
            due.extend(entries[:budget])
            carry.extend(entries[budget:])
        # robots disallow: dropped, never fetched, stays seen
        fetchable = []
        for e in due:
            _, disallows = self.robots.get(e["host"], (1.0, []))
            path = re.sub(r"^[a-z]+://[^/]+", "", e["url"])
            if any(path.startswith(p) for p in disallows):
                continue
            fetchable.append(e)

        children = []
        fetched = 0
        fetchable.sort(key=lambda e: (-e["priority"], e["seq"]))  # queue order
        for e in fetchable:
            page = self.pages.get(e["url"])
            if page is None or page["redirects"]:
                continue
            fetched += 1
            self.crawl_order.append((e["url"], e["seq"]))
            site_root = re.match(r"^[a-z]+://[^/]+/", e["url"]).group(0)
            for idx, link in enumerate(page["links"]):
                if re.match(r"^[a-z]+://", link):
                    child = link
                elif link == "../":
                    child = re.sub(r"[^/]+/$", "", e["url"])
                else:
                    child = e["url"] + link
                if not child.startswith(site_root):
                    continue
                if link.endswith("/") and link != "../":
                    children.append(
                        {
                            "url": child,
                            "host": e["host"],
                            "priority": e["priority"],
                            "depth": e["depth"] + 1,
                            "parent_seq": e["seq"],
                            "link_idx": idx,
                        }
                    )
                elif IMAGE_EXT_RE.search(link):
                    self.image_urls.add(child)

        # global discovery order: (priority DESC, parent_seq, link_idx)
        children.sort(key=lambda c: (-c["priority"], c["parent_seq"], c["link_idx"]))
        self.frontier = carry
        for c in children:
            if c["url"] in self.seen:
                continue
            self.seen.add(c["url"])
            self.frontier.append(
                {
                    "url": c["url"],
                    "host": c["host"],
                    "priority": c["priority"],
                    "depth": c["depth"],
                    "seq": self.next_seq,
                }
            )
            self.next_seq += 1
        return fetched

    def crawl(self, max_rounds: int = 50, round_seconds: int = 60) -> None:
        for _ in range(max_rounds):
            if not self.frontier:
                break
            self.crawl_round(round_seconds)
