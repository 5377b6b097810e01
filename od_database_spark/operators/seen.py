"""URL-seen set: partitioned bloom prefilter + exact anti-join (SURVEY.md §7.3).

Contract (bit-for-bit with the reference):
- exact-URL membership — database.py:78-90 (``WHERE url=%s``)
- parent-prefix membership — database.py:129-136
  (``WHERE url = substr(%s, 0, length(url)+1)``)

Design for 10^10 entries:
- Ground truth is the ``seen`` table (url, url_hash), hash-partitioned by
  ``pmod(url_hash, P)``.  Exactness always comes from a ``left_anti`` join on
  (url_hash, url) — the bloom is ONLY a prefilter, so false positives cost a
  re-check and never correctness.
- The bloom is partitioned the same way: P independent bitsets, built
  distributed (one ``applyInPandas`` group per partition), probed via a
  vectorized Arrow UDF (no per-row Python).  At sandbox scale the bitsets are
  broadcast; at 10^10 keys each executor needs only the partitions it probes
  (bitsets live in files keyed by part id — same layout, no code change in
  the probe math).
- In the crawl hot path most candidates are NEW, so the bloom's "definitely
  not seen" answer lets the anti-join shuffle only the maybe-seen sliver.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urls import parent_prefixes_col

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix(h: np.ndarray, mul: np.uint64) -> np.ndarray:
    """splitmix64-style avalanche on uint64 arrays (vectorized)."""
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * mul
        h = h ^ (h >> np.uint64(33))
    return h


class PartitionedBloom:
    """P independent bloom bitsets over int64 keys, numpy-vectorized."""

    def __init__(self, n_parts: int, bits_per_part: int, k: int, bitsets: dict[int, np.ndarray]):
        self.n_parts = n_parts
        self.bits_per_part = bits_per_part  # power of two
        self.k = k
        self.bitsets = bitsets  # part -> uint8 array of size bits/8
        self._bc = None  # cached Spark broadcast of the bitsets (see spark_broadcast)

    def spark_broadcast(self, spark):
        """One broadcast per bloom GENERATION, cached on the instance: probing
        every round must not pile up a fresh full-bitset broadcast per round.
        union_update invalidates the cache (the bitsets changed)."""
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(
                (self.n_parts, self.bits_per_part, self.k, self.bitsets)
            )
        return self._bc

    def invalidate_broadcast(self) -> None:
        if self._bc is not None:
            try:
                self._bc.unpersist()
            except Exception:
                pass
            self._bc = None

    @staticmethod
    def params_for(expected_keys: int, n_parts: int, fpp: float = 0.01) -> tuple[int, int]:
        per_part = max(expected_keys // max(n_parts, 1), 1)
        m = -per_part * math.log(fpp) / (math.log(2) ** 2)
        m_bits = 1 << max(int(m).bit_length(), 10)  # round up to power of two
        k = max(int(round(m_bits / per_part * math.log(2))), 1)
        return m_bits, min(k, 16)

    @staticmethod
    def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
        u = keys.astype(np.int64).view(np.uint64)
        h1 = _mix(u, _MIX1)
        h2 = _mix(u, _MIX2) | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            pos = (h1[:, None] + i * h2[:, None]) & np.uint64(m_bits - 1)
        return pos  # shape (n, k)

    def union_update(self, delta: "PartitionedBloom") -> None:
        """OR a delta bloom (same geometry) into this one — the incremental
        maintenance path: per round, build a bloom over the NEW urls only and
        fold it in, never rescanning the full seen set."""
        assert (self.n_parts, self.bits_per_part, self.k) == (
            delta.n_parts, delta.bits_per_part, delta.k,
        ), "bloom geometries differ"
        for part, bits in delta.bitsets.items():
            if part in self.bitsets:
                self.bitsets[part] = np.bitwise_or(self.bitsets[part], bits)
            else:
                self.bitsets[part] = bits
        self.invalidate_broadcast()  # the cached broadcast is now stale

    @classmethod
    def build(cls, seen: DataFrame, n_parts: int = 64, fpp: float = 0.01,
              expected_keys: int | None = None,
              geometry: tuple[int, int] | None = None) -> "PartitionedBloom":
        """Distributed build: one bitset per hash partition via applyInPandas,
        then the (small) bitset rows come back to the driver for broadcast.
        Pass ``geometry=(m_bits, k)`` to build a delta compatible with an
        existing bloom (for union_update)."""
        if geometry is not None:
            m_bits, k = geometry
        else:
            if expected_keys is None:
                expected_keys = seen.count()
            m_bits, k = cls.params_for(max(expected_keys, 1), n_parts, fpp)

        def build_part(pdf: pd.DataFrame) -> pd.DataFrame:
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            keys = pdf["url_hash"].to_numpy()
            if len(keys):
                pos = cls._positions(keys, m_bits, k).ravel()
                np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                                 (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
            part = int(pdf["part"].iloc[0]) if len(pdf) else -1
            return pd.DataFrame({"part": [part], "bits": [bits.tobytes()]})

        parts = (
            seen.select("url_hash")
            .withColumn("part", F.pmod(F.col("url_hash"), F.lit(n_parts)).cast("int"))
            .groupBy("part")
            .applyInPandas(build_part, schema="part int, bits binary")
            .collect()
        )
        bitsets = {
            r["part"]: np.frombuffer(r["bits"], dtype=np.uint8) for r in parts if r["part"] >= 0
        }
        return cls(n_parts, m_bits, k, bitsets)

    def probe_np(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized maybe-seen probe; True = maybe in set."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        part = np.mod(keys.astype(np.int64), self.n_parts)
        out = np.zeros(len(keys), dtype=bool)
        for p in np.unique(part):
            bits = self.bitsets.get(int(p))
            if bits is None:
                continue  # empty partition → definitely not seen
            sel = part == p
            pos = self._positions(keys[sel], self.bits_per_part, self.k)
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            hit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
            out[sel] = hit.all(axis=1)
        return out


def maybe_seen_col(spark, bloom: PartitionedBloom, key: Column) -> Column:
    """Arrow-batched bloom probe as a boolean column.  The bitsets travel as a
    Spark broadcast (one copy per executor, not per task), cached on the bloom
    instance so repeated rounds reuse one broadcast per bloom generation."""
    bc = bloom.spark_broadcast(spark)

    @F.pandas_udf(T.BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        n_parts, m_bits, k, bitsets = bc.value
        b = PartitionedBloom(n_parts, m_bits, k, bitsets)
        return pd.Series(b.probe_np(keys.to_numpy()))

    return probe(key)


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: PartitionedBloom | None = None,
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Rows of ``candidates`` whose canonical URL is NOT in ``seen`` —
    exact semantics of database.py:78-90, bloom-accelerated.

    ``candidates`` must carry (canon_url, url_hash); ``seen`` carries
    (url, url_hash).  The join keys include the URL string so a 64-bit hash
    collision can never drop a distinct URL.
    """
    seen_keys = seen.select(F.col("url_hash").alias("_s_hash"), F.col("url").alias("_s_url"))
    cond = (F.col("url_hash") == F.col("_s_hash")) & (F.col("canon_url") == F.col("_s_url"))
    if bloom is None:
        return candidates.join(seen_keys, on=cond, how="left_anti")
    spark = candidates.sparkSession
    flagged = candidates.withColumn(
        "_maybe_seen", maybe_seen_col(spark, bloom, F.col("url_hash"))
    )
    definite_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    needs_check = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    # The maybe-seen sliver is usually ≈ true dups + 1% fpp of a politeness-
    # bounded batch — but NOT bounded by construction (a resume with a cold
    # bloom, dense cross-linking, or an adversarial site graph can flag most
    # candidates).  F.broadcast bypasses autoBroadcastJoinThreshold, so GATE
    # the zero-shuffle path on a hard row bound and fall back to the plain
    # shuffled anti-join when the sliver is big — exact either way; the
    # broadcast is an optimization, never the correctness.  The gate is
    # two-tier so normal rounds pay nothing: the candidate batch size bounds
    # the sliver from above (candidates are checkpointed on the crawl path,
    # so that count is metadata-cheap); only an oversized batch pays one
    # probe pass to count the true sliver.
    if candidates.count() > broadcast_limit and needs_check.count() > broadcast_limit:
        verified_new = needs_check.join(seen_keys, on=cond, how="left_anti")
        return definite_new.unionByName(verified_new)
    # Exact re-check WITHOUT shuffling the seen table: the sliver
    # broadcasts.  seen is then only SCANNED (broadcast semi-join streams
    # over it — columnar-pruned to two columns, zero exchange of its 10^10
    # rows), the tiny hit set broadcasts back, and the anti-join is map-side
    # too.  Semantics identical to the plain anti-join.
    sliver = needs_check.select(
        F.col("url_hash").alias("_c_hash"), F.col("canon_url").alias("_c_url")
    )
    hits = seen_keys.join(
        F.broadcast(sliver),
        on=(F.col("_s_hash") == F.col("_c_hash")) & (F.col("_s_url") == F.col("_c_url")),
        how="left_semi",
    )
    verified_new = needs_check.join(F.broadcast(hits), on=cond, how="left_anti")
    return definite_new.unionByName(verified_new)


def filter_not_prefix_seen(candidates: DataFrame, seen_roots: DataFrame) -> DataFrame:
    """Drop candidates for which ANY '/'-boundary prefix is an existing root —
    the equi-ized form of the reference's prefix theta-join
    (database.py:129-136).  ``seen_roots`` carries (url).

    Explodes ≤ depth+1 prefix rows per candidate (depth is small: reference
    URLs are directory roots), then one left_anti on the prefix key.
    """
    pref = candidates.withColumn("_prefix", F.explode(parent_prefixes_col(F.col("canon_url"))))
    hit = (
        pref.join(
            seen_roots.select(F.col("url").alias("_prefix")),
            on="_prefix",
            how="left_semi",
        )
        .select(F.col("canon_url").alias("_hit_url"))
        .distinct()
    )
    return candidates.join(
        hit, on=candidates["canon_url"] == hit["_hit_url"], how="left_anti"
    )


def filter_not_blacklisted(candidates: DataFrame, blacklist: DataFrame) -> DataFrame:
    """Broadcast anti-join on scheme://netloc (database.py:283-292).
    The blacklist dim is tiny → always broadcast."""
    from ..functions.urls import blacklist_key_col

    bl = F.broadcast(blacklist.select(F.lower(F.col("url")).alias("_bl_key")))
    keyed = candidates.withColumn("_key", blacklist_key_col(F.col("canon_url")))
    return keyed.join(bl, on=keyed["_key"] == bl["_bl_key"], how="left_anti").drop("_key")


def filter_is_od(candidates: DataFrame, pages: DataFrame) -> DataFrame:
    """The anti-spam heuristic (od_util.py:175-213) over the synthetic page
    model: join the candidate's root page; reject redirects, >11 external
    links, >5 link tags, >7 script tags.  Missing page = server not
    responding → reject (matches the reference's except-branch)."""
    # is_external_link (od_util.py:167-172): urljoin(base, link) then
    # substring containment.  Root pages carry no '../' links, so resolution
    # is native: absolute links stay, relative links append to the base.
    def _external(links: Column, base: Column) -> Column:
        return F.size(
            F.filter(
                links,
                lambda l: ~F.when(l.rlike(r"^[a-z]+://"), l)
                .otherwise(F.concat(base, l))
                .contains(base),
            )
        )

    page_feats = pages.select(
        F.col("url").alias("_p_url"),
        F.col("redirects").alias("_p_redirects"),
        F.col("link_tag_count").alias("_p_link_tags"),
        F.col("script_tag_count").alias("_p_script_tags"),
        _external(F.col("links"), F.col("url")).alias("_p_external"),
    )
    # INNER join: every accepted candidate needs its page row (missing page
    # = dead server = rejected on both the http and ftp branches), and an
    # inner join lets AQE broadcast the SMALL candidate side instead of
    # shuffling the page table (a left join could only broadcast the right).
    joined = candidates.join(
        page_feats, on=candidates["canon_url"] == page_feats["_p_url"], how="inner"
    )
    ok = (
        ~F.col("_p_redirects")
        & (F.col("_p_external") <= 11)
        & (F.col("_p_link_tags") <= 5)
        & (F.col("_p_script_tags") <= 7)
    )
    # ftp:// roots: LIVENESS only (od_util.py:180-185 — FTP login succeeds),
    # i.e. the page row must exist, but the HTTP tag heuristics never apply
    is_ftp = F.col("canon_url").startswith("ftp://")
    return joined.filter(is_ftp | ok).drop(
        "_p_url", "_p_redirects", "_p_link_tags", "_p_script_tags", "_p_external"
    )


def climb_to_top(candidates: DataFrame, pages: DataFrame) -> DataFrame:
    """get_top_directory fixpoint (od_util.py:216-248, views.py:270-271):
    climb '../' while the parent page exists, is an OD (threshold check), and
    links back to the child directory; ftp URLs never climb.

    One DataFrame pass per level, at most MAX-DEPTH passes (reference URLs
    are shallow directory roots).  ``candidates`` must carry ``canon_url``;
    the column is REPLACED by the top directory."""
    external = F.size(
        F.filter(
            F.col("links"),
            lambda l: ~F.when(l.rlike(r"^[a-z]+://"), l)
            .otherwise(F.concat(F.col("url"), l))
            .contains(F.col("url")),
        )
    )
    page_ok = pages.select(
        F.col("url").alias("_parent_url"),
        F.col("links").alias("_parent_links"),
        (
            ~F.col("redirects")
            & (F.col("link_tag_count") <= 5)
            & (F.col("script_tag_count") <= 7)
            & (external <= 11)
        ).alias("_parent_tags_ok"),
    )
    out = candidates
    prev_ckpt: DataFrame | None = None
    # depth is bounded; loop until no row climbs (checked via count).  Each
    # level is MATERIALIZED (localCheckpoint) before the can-climb count —
    # otherwise the count plus the next level's join recompute the whole
    # accumulated join chain every iteration (O(depth^2) work and the
    # plan-tree growth the iterative-loop rule warns about).  Exactly one
    # prior checkpoint is alive at a time.
    for _ in range(16):
        path = F.regexp_replace(F.col("canon_url"), r"^[a-z]+://[^/]+", "")
        # careful: matching on the whole URL would grab the hostname at the
        # site root — extract the child segment from the PATH only
        child_name = F.regexp_extract(path, r"([^/]+/)$", 1)
        parent = F.when(
            child_name != "", F.regexp_replace(F.col("canon_url"), r"[^/]+/$", "")
        ).otherwise(F.col("canon_url"))
        with_parent = out.withColumn("_parent", parent).withColumn("_child", child_name)
        # pre-prune the page table to just the parents this level needs —
        # broadcast semi-join, so the big pages side is SCANNED, never
        # shuffled; the remaining left join is tiny × tiny
        needed = with_parent.select(F.col("_parent").alias("_need")).distinct()
        page_lvl = page_ok.join(
            F.broadcast(needed), on=F.col("_parent_url") == F.col("_need"), how="left_semi"
        )
        stepped = with_parent.join(
            F.broadcast(page_lvl), on=F.col("_parent") == F.col("_parent_url"), how="left"
        )
        can_climb = (
            (F.col("_child") != "")  # path == "/" → already at the root
            & ~F.col("canon_url").startswith("ftp://")
            & F.col("_parent_url").isNotNull()
            & F.col("_parent_tags_ok")
            & F.array_contains(F.coalesce(F.col("_parent_links"), F.array()), F.col("_child"))
        )
        stepped = stepped.withColumn("_climbs", can_climb).localCheckpoint(eager=True)
        if prev_ckpt is not None:
            prev_ckpt.unpersist()  # this level is materialized; the parent is dead
        prev_ckpt = stepped
        n_climb = stepped.filter(F.col("_climbs")).limit(1).count()
        out = stepped.withColumn(
            "canon_url", F.when(F.col("_climbs"), F.col("_parent")).otherwise(F.col("canon_url"))
        ).drop("_parent", "_child", "_parent_url", "_parent_links", "_parent_tags_ok", "_climbs")
        if n_climb == 0:
            break
    # the climb changed canon_url for some rows — refresh the derived keys.
    # Materialize before releasing the last level's checkpoint (its blocks
    # are unrecoverable after unpersist).
    result = (
        out.withColumn("url_hash", F.xxhash64("canon_url"))
        .withColumn(
            "depth",
            F.size(F.filter(F.split(F.regexp_replace("canon_url", r"^[a-z]+://[^/]+", ""), "/"), lambda s: s != "")),
        )
        .localCheckpoint(eager=True)
    )
    if prev_ckpt is not None:
        prev_ckpt.unpersist()
    return result


def submit_chain(
    candidates: DataFrame,
    seen_roots: DataFrame,
    blacklist: DataFrame,
    pages: DataFrame,
    bloom: PartitionedBloom | None = None,
) -> DataFrame:
    """The full submit-time dedup chain in one DataFrame pass
    (views.py:269-302, identical order): validity → exact-seen →
    parent-prefix-seen → blacklist → is_od.

    ``candidates`` must already carry the canonical struct columns from
    ``with_canonical`` (canon_url, host, url_hash, url_valid).
    ``seen_roots`` is the websites dim: (url, url_hash).
    """
    valid = candidates.filter(F.col("url_valid"))
    new = filter_unseen(valid, seen_roots, bloom)
    not_child = filter_not_prefix_seen(new, seen_roots)
    not_bl = filter_not_blacklisted(not_child, blacklist)
    return filter_is_od(not_bl, pages)
