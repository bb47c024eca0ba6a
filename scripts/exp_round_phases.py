"""Warm per-phase scaling attribution for the ROUND job.

Phases per rep (same decomposition as bench.run_round_job):
  p1_core_snapshot : canon → window dedup → seen anti-join →
                     bucket-sorted snapshot write (one action)
  p2_rank          : presalted rank + vtime over the bucketed scan,
                     forced to noop
  p3_fetch_extract : fetch join vs content store → repartition →
                     mapInPandas extraction → noop

Two same-JVM reps (settle between): rep 2 is the warm engine. Run at
c4 and c16 in a clean-probe window and compare phase-wise:

    taskset -c 0-3  python scripts/exp_round_phases.py --cpus 4
    taskset -c 0-15 python scripts/exp_round_phases.py --cpus 16
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

import bench
from crawler_service_spark.config import CrawlConfig
from crawler_service_spark.functions.urls import canonicalize_frame, host_native
from crawler_service_spark.operators.dedup import with_key_hash, anti_join_seen, first_occurrence
from crawler_service_spark.operators.extract import extract_pages
from crawler_service_spark.operators.politeness import presalt, schedule_round


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=6_000_000)
    ap.add_argument("--n-hosts", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-sortby", action="store_true",
                    help="bucketed write WITHOUT in-bucket sort "
                         "(rank sorts post-read instead)")
    args = ap.parse_args()

    spark = bench.build_spark(args.cpus, "exp-round-phases")
    spark.sparkContext.setLogLevel("ERROR")
    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    rank_parts = int(os.environ.get("SPARK_GRAFT_RANK_PARTS", "64"))
    n = args.n
    salt_width = max(1 << 14, n // 256)
    cfg = CrawlConfig()

    frontier = bench.synth_frontier(spark, n, args.n_hosts).persist()
    frontier.count()
    seen = (
        canonicalize_frame(
            bench.synth_frontier(spark, n, args.n_hosts)
            .filter(F.col("discovery_seq") % 3 == 0), "url")
        .select("canon_url"))
    seen = with_key_hash(seen.select("canon_url"), ["canon_url"])
    seen = seen.repartition(parts, "_kh", "canon_url").persist()
    seen.count()

    def mk_store(src):
        nstr = F.col("discovery_seq").cast("string")
        html = F.concat(
            F.lit("<html><head><title>Doc "), nstr,
            F.lit("</title><meta name=\"description\" content=\"synthetic page "), nstr,
            F.lit("\"></head><body><h1>Heading "), nstr, F.lit("</h1><p>"),
            F.repeat(F.concat(F.lit("token"), nstr, F.lit(" body text ")), 12),
            F.lit("</p><img src=\"https://img.example.com/"), nstr,
            F.lit(".png\" alt=\"pic\"><a href=\"https://h1.example.com/p/"), nstr,
            F.lit("\">go</a><a href=\"https://h2.example.com/p/"), nstr,
            F.lit("1\">go</a></body></html>"),
        )
        return (canonicalize_frame(src, "url")
                .select("canon_url", html.alias("html"))
                .repartition(parts, "canon_url"))

    store = mk_store(bench.synth_frontier(spark, n, args.n_hosts)).persist()
    store.count()

    sort_cols = ["host", "depth", "_salt", "discovery_seq"]

    def p1(src, name):
        b = canonicalize_frame(src, "url").withColumn(
            "host", host_native(F.col("url")))
        b = first_occurrence(b, ["canon_url"], ["discovery_seq"],
                             keep_hash=True, strategy=bench.DEDUP_STRATEGY)
        b = anti_join_seen(b, seen, ["canon_url"],
                           shuffle_hash=True, hash_key=True)
        if args.no_sortby:
            return bench.snapshot_bucketed(
                spark, presalt(b, salt_width).repartition(
                    rank_parts, F.col("host"), F.col("_salt")),
                name, rank_parts, ["host", "_salt"])
        return bench.snapshot_bucket_sorted(
            spark, presalt(b, salt_width), name, rank_parts,
            ["host", "_salt"], sort_cols)

    def p2(snap):
        admitted, _ = schedule_round(
            snap, None, priority_col="depth", rank_strategy="presalted")
        bench.force(admitted)
        return admitted

    def p3(admitted):
        # pre-align the (html-free) admitted side with the store's
        # partitioning: the join output then inherits 64 uniform hash
        # partitions (canon_url ~ uniform) and extraction fuses into the
        # join stage — the old post-join round-robin repartition moved
        # every html-bearing row through a second full exchange
        fetched = (admitted.drop("_salt")
                   .repartition(parts, F.col("canon_url"))
                   .join(store, "canon_url", "left")
                   .withColumn("is_error", F.col("html").isNull()))
        pages = extract_pages(fetched, cfg)
        bench.force(pages.select("canon_url", "title", "text_content",
                                 "links", "spans"))

    # warmup: full pipeline at 1/40
    wn = max(50_000, n // 40)
    wsnap = p1(bench.synth_frontier(spark, wn, args.n_hosts), "rp_warm")
    p3(p2(wsnap))
    bench.settle(spark)

    for rep in range(args.reps):
        if rep:
            bench.settle(spark)
        rec = {}
        p0 = bench.cpu_probe()
        t0 = time.monotonic()
        snap = p1(frontier, "rp_snap")
        rec["p1_core_snapshot"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        admitted = p2(snap)
        rec["p2_rank"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        p3(admitted)
        rec["p3_fetch_extract"] = round(time.monotonic() - t0, 2)
        rec["probe"] = (p0, bench.cpu_probe())
        print(f"rep{rep}: {rec}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
