"""Decompose the schedule job's timed region into its two actions
(bucket-sorted snapshot write; presalted rank force) plus the pure
driver-side planning cost of each, at one parallelism level. Run at c4
and c16 in clean windows to locate the residual fixed seconds.

    taskset -c 0-15 python scripts/exp_sched_actions.py --cpus 16
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
from crawler_service_spark.functions.urls import canonicalize_frame, host_native
from crawler_service_spark.operators.dedup import with_key_hash, anti_join_seen, first_occurrence
from crawler_service_spark.operators.politeness import presalt, schedule_round


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=32_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = bench.build_spark(args.cpus, "exp-sched-actions")
    spark.sparkContext.setLogLevel("ERROR")
    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    rank_parts = int(os.environ.get("SPARK_GRAFT_RANK_PARTS", "64"))
    n = args.n
    salt_width = max(1 << 14, n // 256)

    frontier = bench.synth_frontier(spark, n, 10_000).persist()
    frontier.count()
    seen = (canonicalize_frame(
        bench.synth_frontier(spark, n, 10_000)
        .filter(F.col("discovery_seq") % 3 == 0), "url")
        .select("canon_url"))
    seen = with_key_hash(seen.select("canon_url"), ["canon_url"])
    seen = seen.repartition(parts, "_kh", "canon_url").persist()
    seen.count()

    def build_batch(src):
        b = canonicalize_frame(src, "url").withColumn(
            "host", host_native(F.col("url")))
        b = first_occurrence(b, ["canon_url"], ["discovery_seq"],
                             keep_hash=True, strategy=bench.DEDUP_STRATEGY)
        return anti_join_seen(b, seen, ["canon_url"],
                              shuffle_hash=True, hash_key=True)

    # warmup
    wn = max(100_000, n // 40)
    ws = bench.snapshot_bucket_sorted(
        spark, presalt(build_batch(bench.synth_frontier(spark, wn, 10_000)),
                       salt_width),
        "sa_warm", rank_parts, ["host", "_salt"],
        ["host", "depth", "_salt", "discovery_seq"])
    wa, _ = schedule_round(ws, None, default_limit=10, default_window_s=60,
                           round_epoch=0.0, priority_col="depth",
                           rank_strategy="presalted")
    bench.force(wa)
    bench.settle(spark)

    for rep in range(args.reps):
        if rep:
            bench.settle(spark)
        rec = {}
        # planning cost of the write branch (no execution)
        df_w = presalt(build_batch(frontier), salt_width)
        t0 = time.monotonic()
        df_w._jdf.queryExecution().executedPlan()
        rec["plan_write"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        snap = bench.snapshot_bucket_sorted(
            spark, df_w, "sa_snap", rank_parts, ["host", "_salt"],
            ["host", "depth", "_salt", "discovery_seq"])
        rec["act_write"] = round(time.monotonic() - t0, 2)
        adm, _ = schedule_round(snap, None, default_limit=10,
                                default_window_s=60, round_epoch=0.0,
                                priority_col="depth",
                                rank_strategy="presalted")
        t0 = time.monotonic()
        adm._jdf.queryExecution().executedPlan()
        rec["plan_rank"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        bench.force(adm)
        rec["act_rank_force"] = round(time.monotonic() - t0, 2)
        rec["probe"] = bench.cpu_probe()
        print(f"rep{rep}: {rec}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
