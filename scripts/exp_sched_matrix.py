"""In-JVM alternating 2x2 matrix for the schedule core: host stage
{early, late} x rank-counts source {bucketed scan, plain parquet scan}.

The host-late and plain-counts changes were adopted from separate
experiments (exp_host_late.py without counts_src; exp_eventlog_sched.py
stage attribution); this measures all four combinations under one JVM
with arm order rotated per rep so host drift cancels across the matrix.

    taskset -c 0-15 python scripts/exp_sched_matrix.py --cpus 16
    taskset -c 0-3  python scripts/exp_sched_matrix.py --cpus 4
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=32_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import bench
    from crawler_service_spark.functions.urls import canonicalize_frame, host_native
    from crawler_service_spark.operators.dedup import (
        anti_join_seen, first_occurrence, with_key_hash)
    from crawler_service_spark.operators.politeness import presalt, schedule_round

    spark = bench.build_spark(args.cpus, "exp-sched-matrix")
    spark.sparkContext.setLogLevel("ERROR")
    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    rank_parts = int(os.environ.get("SPARK_GRAFT_RANK_PARTS", "64"))
    n = args.n

    def pipeline(src, seen_df, n_rows, host_stage, counts):
        b = canonicalize_frame(src, "url")
        if host_stage == "early":
            b = b.withColumn("host", host_native(F.col("url")))
        b = first_occurrence(b, ["canon_url"], ["discovery_seq"],
                             keep_hash=True, strategy=bench.DEDUP_STRATEGY)
        b = anti_join_seen(b, seen_df, ["canon_url"],
                           shuffle_hash=True, hash_key=True)
        if host_stage == "late":
            b = b.withColumn("host", host_native(F.col("url")))
        salt_width = max(1 << 14, n_rows // 64)
        b = bench.snapshot_bucket_sorted(
            spark, presalt(b, salt_width), "mx_round",
            rank_parts, ["host", "_salt"],
            ["host", "depth", "_salt", "discovery_seq"])
        counts_src = (spark.read.parquet(f"{bench.SNAP_DIR}/mx_round")
                      if counts == "plain" else None)
        admitted, _ = schedule_round(
            b, None, default_limit=10, default_window_s=60,
            round_epoch=0.0, priority_col="depth",
            rank_strategy="presalted", counts_src=counts_src)
        bench.force(admitted)

    frontier = bench.synth_frontier(spark, n, 10_000).persist()
    frontier.count()
    seen = canonicalize_frame(
        bench.synth_frontier(spark, n, 10_000)
        .filter(F.col("discovery_seq") % 3 == 0), "url").select("canon_url")
    seen = with_key_hash(seen, ["canon_url"])
    seen = seen.repartition(parts, "_kh", "canon_url").persist()
    seen.count()

    ARMS = [("early", "bucketed"), ("early", "plain"),
            ("late", "bucketed"), ("late", "plain")]
    wn = max(100_000, n // 40)
    for hs, cs in ARMS:
        pipeline(bench.synth_frontier(spark, wn, 10_000), seen, wn, hs, cs)
    bench.settle(spark)

    res = {f"{hs}/{cs}": [] for hs, cs in ARMS}
    for i in range(args.reps):
        order = ARMS[i % 4:] + ARMS[:i % 4]   # rotate arm order per rep
        for hs, cs in order:
            t0 = time.monotonic()
            pipeline(frontier, seen, n, hs, cs)
            dt = time.monotonic() - t0
            res[f"{hs}/{cs}"].append(round(dt, 2))
            print(f"rep {i} {hs}/{cs}: {dt:.2f}s", file=sys.stderr, flush=True)
            bench.settle(spark)
    out = {"cpus": args.cpus, "n": n, **res,
           "best": {k: min(v) for k, v in res.items()},
           "median": {k: sorted(v)[len(v) // 2] for k, v in res.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
