"""In-JVM A/B: post-join round-robin repartition (old) vs pre-join
hash repartition of the admitted side (new) for the fetch+extract
phase. Variants alternate inside one JVM so host-speed drift cancels
pair-wise; report per-pair ratios.

    taskset -c 0-15 python scripts/exp_fetch_join.py --cpus 16
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
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()

    spark = bench.build_spark(args.cpus, "exp-fetch-join")
    spark.sparkContext.setLogLevel("ERROR")
    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    rank_parts = int(os.environ.get("SPARK_GRAFT_RANK_PARTS", "64"))
    n = args.n
    salt_width = max(1 << 14, n // 256)
    cfg = CrawlConfig()

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

    store = mk_store(bench.synth_frontier(spark, n, 10_000)).persist()
    store.count()

    # one admitted batch, materialized as the bucket-sorted snapshot
    seen = (canonicalize_frame(
        bench.synth_frontier(spark, n, 10_000)
        .filter(F.col("discovery_seq") % 3 == 0), "url")
        .select("canon_url"))
    seen = with_key_hash(seen.select("canon_url"), ["canon_url"])
    seen = seen.repartition(parts, "_kh", "canon_url").persist()
    seen.count()
    b = canonicalize_frame(bench.synth_frontier(spark, n, 10_000), "url") \
        .withColumn("host", host_native(F.col("url")))
    b = first_occurrence(b, ["canon_url"], ["discovery_seq"],
                         keep_hash=True, strategy=bench.DEDUP_STRATEGY)
    b = anti_join_seen(b, seen, ["canon_url"], shuffle_hash=True, hash_key=True)
    snap = bench.snapshot_bucket_sorted(
        spark, presalt(b, salt_width), "fj_snap", rank_parts,
        ["host", "_salt"], ["host", "depth", "_salt", "discovery_seq"])
    admitted, _ = schedule_round(
        snap, None, priority_col="depth", rank_strategy="presalted")

    def run_old():
        fetched = (admitted.drop("_salt").join(store, "canon_url", "left")
                   .withColumn("is_error", F.col("html").isNull())
                   .repartition(parts))
        pages = extract_pages(fetched, cfg)
        bench.force(pages.select("canon_url", "title", "text_content",
                                 "links", "spans"))

    def run_new():
        fetched = (admitted.drop("_salt")
                   .repartition(parts, F.col("canon_url"))
                   .join(store, "canon_url", "left")
                   .withColumn("is_error", F.col("html").isNull()))
        pages = extract_pages(fetched, cfg)
        bench.force(pages.select("canon_url", "title", "text_content",
                                 "links", "spans"))

    # warmup both
    wa, _ = schedule_round(snap.limit(n // 40), None, priority_col="depth",
                           rank_strategy="presalted")
    for _ in range(1):
        pass
    run_old_w = wa.drop("_salt").join(store, "canon_url", "left") \
        .withColumn("is_error", F.col("html").isNull()).repartition(parts)
    bench.force(extract_pages(run_old_w, cfg).select("canon_url", "title"))
    bench.settle(spark)

    for i in range(args.pairs):
        t0 = time.monotonic(); run_old(); t_old = time.monotonic() - t0
        bench.settle(spark)
        t0 = time.monotonic(); run_new(); t_new = time.monotonic() - t0
        bench.settle(spark)
        print(f"pair{i}: old={t_old:.2f}s new={t_new:.2f}s "
              f"ratio={t_new / t_old:.3f} probe={bench.cpu_probe():.3f}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
