"""Deferral-mode engine rounds: flat vs bucket-sorted frontier layout.

r02 VERDICT item 5 asked for a bench datapoint showing the
politeness-constrained (budget_rounds) crawl — the realistic mode — at
>= the flat layout's throughput now that the bucketsort rank composes
with deferral (rank join on (host, depth, _salt), depth-major offsets).
Alternating in one JVM so host drift cancels; each rep runs a full
multi-round CrawlEngine.crawl over a fresh checkpoint dir.

    taskset -c 0-15 python scripts/exp_deferral_layout.py --cpus 16
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n-docs", type=int, default=120_000)
    ap.add_argument("--n-hosts", type=int, default=40)
    ap.add_argument("--n-seeds", type=int, default=40)
    ap.add_argument("--budget-rounds", type=int, default=2)
    ap.add_argument("--rate-limit", type=int, default=400)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import bench
    from crawler_service_spark import CrawlConfig
    from crawler_service_spark.engine import CrawlEngine
    from crawler_service_spark.sources.corpus import build_seeds_df, build_store_df

    spark = bench.build_spark(args.cpus, "exp-deferral-layout")
    spark.sparkContext.setLogLevel("ERROR")

    store = build_store_df(spark, args.n_docs, args.n_hosts).persist()
    n_store = store.count()
    seeds = build_seeds_df(spark, args.n_docs, args.n_hosts, args.n_seeds)

    ck_root = os.environ.get("SPARK_GRAFT_SNAP_DIR", "/dev/shm/spark_graft")

    def run(layout: str, tag: str) -> tuple[float, int]:
        ck = f"{ck_root}/defer_{tag}"
        shutil.rmtree(ck, ignore_errors=True)
        cfg = CrawlConfig(
            max_depth=3, follow_links=True, frontier_layout=layout,
            budget_rounds=args.budget_rounds,
            default_rate_limit=args.rate_limit,
            shuffle_partitions=int(
                os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64")),
        )
        eng = CrawlEngine(spark, cfg, store, checkpoint_dir=ck)
        t0 = time.monotonic()
        tables = eng.crawl(seeds)
        n_pages = tables.pages.count()
        dt = time.monotonic() - t0
        shutil.rmtree(ck, ignore_errors=True)
        return dt, n_pages

    # warmup both layouts on a shaved corpus
    for layout in ("flat", "bucketsort"):
        run(layout, f"warm_{layout}")
    bench.settle(spark)

    res = {"flat": [], "bucketsort": []}
    pages = {}
    for i in range(args.reps):
        for layout in ("flat", "bucketsort") if i % 2 == 0 else (
                "bucketsort", "flat"):
            dt, n_pages = run(layout, f"r{i}_{layout}")
            res[layout].append(round(dt, 2))
            pages[layout] = n_pages
            print(f"rep {i} {layout}: {dt:.2f}s ({n_pages} pages)",
                  file=sys.stderr, flush=True)
            bench.settle(spark)

    assert pages["flat"] == pages["bucketsort"], pages
    out = {"cpus": args.cpus, "n_docs": n_store, "n_hosts": args.n_hosts,
           "budget_rounds": args.budget_rounds, "pages": pages["flat"],
           **res,
           "best": {k: min(v) for k, v in res.items()},
           "median": {k: sorted(v)[len(v) // 2] for k, v in res.items()},
           "pages_per_sec_best": {
               k: round(pages[k] / min(v), 1) for k, v in res.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
