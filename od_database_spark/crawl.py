"""Top-level crawl driver: the engine's equivalent of the reference's
main loop (task submission → crawler fleet → indexer threads,
views.py/tasks.py) as one resumable batch pipeline.

    from od_database_spark import crawl
    result = crawl.run(spark, seeds_df, pages, robots, blacklist,
                       ckpt_dir="/data/ckpt")

Each round is checkpointed (frontier/seen parquet + lineage manifests +
metrics) before the next begins, so a killed run resumes exactly where it
stopped (``resume=True``).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from . import schema
from .operators import fetch as fetch_ops
from .operators import frontier as fr


@dataclass
class CrawlResult:
    state: fr.CrawlState
    rounds: int
    urls_fetched: int
    images: DataFrame | None
    fetched_pages: list[DataFrame] = field(default_factory=list)
    image_urls: list[DataFrame] = field(default_factory=list)


def run(
    spark: SparkSession,
    seeds: DataFrame,
    pages: DataFrame,
    robots: DataFrame,
    blacklist: DataFrame,
    ckpt_dir: str | None = None,
    resume: bool = False,
    max_rounds: int = 100,
    round_seconds: int = fr.ROUND_SECONDS,
    use_bloom: bool = True,
    expected_total_urls: int = 1_000_000,
    fetch: bool = True,
    compact_every: int = 8,
    seen_table: str | None = None,
) -> CrawlResult:
    """Submit the seed list (full dedup chain), run BFS rounds under the
    politeness budget until the frontier drains, then fetch+decode the
    discovered images.  Returns lazy DataFrames; nothing is collected.

    ``robots`` is either the parsed politeness dim (host, crawl_delay,
    disallow_prefixes) or RAW fetched bodies (host, robots_txt) — raw input
    is parsed natively through functions.robots.parse_robots.

    ``seen_table`` switches the durable seen set to a BUCKETED catalog
    table (operators/seen_store.py): rounds append their new urls stamped
    with the round number, the exact anti-join reads the table co-located
    (zero seen-side shuffle even off the bloom fallback path), and a resume
    reconstructs the seen set from the table bounded at the last committed
    round instead of unioning per-round delta parquet."""
    if "robots_txt" in robots.columns:
        from .functions.robots import parse_robots

        robots = parse_robots(robots)
    if resume and ckpt_dir is not None and fr.latest_round(ckpt_dir) is not None:
        state = fr.load_checkpoint(
            spark, ckpt_dir, use_bloom=use_bloom, expected_total_urls=expected_total_urls
        )
    else:
        empty = spark.createDataFrame([], schema.SEEN)
        accepted = fr.submit_seeds(spark, seeds, empty, blacklist, pages)
        state = fr.initial_state(
            accepted, use_bloom=use_bloom, expected_total_urls=expected_total_urls,
            seen_table=seen_table,
        )

    urls_fetched = 0
    fetched_pages: list[DataFrame] = []
    image_urls: list[DataFrame] = []
    rounds = 0
    while rounds < max_rounds:
        if state.frontier.count() == 0:
            break
        t0 = time.time()
        state, fetched, images = fr.expand_round(state, pages, robots, round_seconds)
        n_fetched = fetched.count()
        n_images = images.count()
        urls_fetched += n_fetched
        if ckpt_dir is not None:
            # spill the round's outputs to the checkpoint dir and hand the
            # caller parquet-backed frames instead of pinning every round's
            # localCheckpoint blocks for the whole crawl — on a 100-round
            # crawl the block store otherwise grows linearly with rounds
            # (round-4 verdict item).  Resume state is untouched: these are
            # OUTPUTS, committed per round alongside (not inside) the
            # .done-guarded state dirs.
            spark_s = fetched.sparkSession
            odir = os.path.join(ckpt_dir, "outputs", f"round_{state.round_no:05d}")
            fetched.write.mode("overwrite").parquet(os.path.join(odir, "fetched"))
            images.write.mode("overwrite").parquet(os.path.join(odir, "images"))
            fetched_disk = spark_s.read.parquet(os.path.join(odir, "fetched"))
            images_disk = spark_s.read.parquet(os.path.join(odir, "images"))
            fetched.unpersist()
            images.unpersist()
            fetched, images = fetched_disk, images_disk
        fetched_pages.append(fetched)
        image_urls.append(images)
        rounds += 1
        if ckpt_dir is not None:
            bloom = state.bloom  # checkpoint() reloads from parquet (no bloom)
            state = fr.checkpoint(
                state,
                ckpt_dir,
                metrics={
                    "urls_fetched": n_fetched,
                    "round_sec": time.time() - t0,
                    "images_found": n_images,
                },
            )
            if compact_every and state.round_no > 0 and state.round_no % compact_every == 0:
                # bound the loader's delta-file fan-in on long crawls; the
                # in-memory state points at dirs compaction deletes, so
                # reload from the surviving round
                fr.compact_checkpoints(spark, ckpt_dir)
                state = fr.load_checkpoint(spark, ckpt_dir)
            state.bloom = bloom  # carry the in-memory filter across the reload

    images_df = None
    if fetch and image_urls:
        all_images = image_urls[0]
        for df in image_urls[1:]:
            all_images = all_images.unionByName(df)
        # multi-parent images fetch exactly once (deterministic keeper)
        images_df = fetch_ops.fetch_images(fr.dedup_image_urls(all_images))

    return CrawlResult(
        state=state,
        rounds=rounds,
        urls_fetched=urls_fetched,
        images=images_df,
        fetched_pages=fetched_pages,
        image_urls=image_urls,
    )
