#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver's measurement; this file holds the extra instrumentation the
optimization round needs — per-query best-of-N isolation, explain capture,
and shuffle-byte deltas).  Usage:

  python bench_extra.py --queries dedup_components submit_dedup --trials 3
  python bench_extra.py --queries all --sf /root/testdata/sf0.1
  python bench_extra.py --explain dedup_components --out plans/r06 --tag before
  python bench_extra.py --sf10x --queries embedding_neardup

Each timed query runs against the noop sink (guide §1.4) with a job
description label (guide §1.5); trials are recorded so steal spread stays
visible (CLAUDE.md: single runs swing >50% on this VM).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _ensure_indexes(spark, sf_dir: str) -> None:
    from od_database_spark.operators import ann_store
    from od_database_spark.queries import _ensure_scaled_ivf, _ensure_scaled_lsh

    ann_store.ensure_lsh_index(spark, sf_dir)
    ann_store.ensure_ivf_index(spark, sf_dir)
    ann_store.ensure_text_lsh_index(spark, sf_dir)
    ann_store.ensure_shingle_index(spark, sf_dir)
    ann_store.ensure_simhash_index(spark, sf_dir)
    _ensure_scaled_lsh(spark, sf_dir)
    _ensure_scaled_ivf(spark, sf_dir)


def time_queries(spark, sf_dir: str, names: list[str], trials: int) -> dict:
    from od_database_spark.queries import REGISTRY

    _ensure_indexes(spark, sf_dir)
    out = {}
    # one warmup so the first timed query doesn't absorb codegen/JVM warmup
    REGISTRY["global_totals"][0](spark, sf_dir).count()
    for name in names:
        fn, _sql = REGISTRY[name]
        ts = []
        for _ in range(trials):
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(ts), "trials": ts}
        log(f"{name}: best={min(ts)} trials={ts}")
    return out


def capture_explain(spark, sf_dir: str, names: list[str], out_dir: str, tag: str) -> None:
    from od_database_spark.queries import REGISTRY

    _ensure_indexes(spark, sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn, _sql = REGISTRY[name]
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        log(f"wrote {path} ({len(txt)} chars)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="+", default=[])
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--sf10x", action="store_true",
                    help="run against the cached 10x corpus (builds if absent)")
    ap.add_argument("--explain", nargs="+", default=[],
                    help="capture explain('formatted') for these queries")
    ap.add_argument("--out", default="plans/r06")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--conf", nargs="*", default=[],
                    help="extra spark conf as key=value (A/B experiments)")
    args = ap.parse_args()

    from od_database_spark.queries import REGISTRY
    from od_database_spark.session import get_spark

    conf = {"spark.ui.showConsoleProgress": "false"}
    for kv in args.conf:
        k, _, v = kv.partition("=")
        conf[k] = v
    spark = get_spark(app_name="bench-extra", cpus=args.cpus, extra_conf=conf)
    sf_dir = args.sf
    if args.sf10x:
        from bench import ensure_sf10x

        sf_dir = ensure_sf10x(spark, args.sf)
        log(f"sf10x corpus: {sf_dir}")

    if args.explain:
        names = sorted(REGISTRY) if args.explain == ["all"] else args.explain
        capture_explain(spark, sf_dir, names, args.out, args.tag)
    if args.queries:
        names = sorted(REGISTRY) if args.queries == ["all"] else args.queries
        res = time_queries(spark, sf_dir, names, args.trials)
        print(json.dumps({"sf_dir": sf_dir, "cpus": args.cpus, "queries": res}))


if __name__ == "__main__":
    main()
