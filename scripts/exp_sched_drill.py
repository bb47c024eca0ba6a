"""Drill INTO the schedule job's two actions (r03 north-rule work).

exp_sched_actions shows (32M URLs, min over reps): act_write c4 121.9 /
c16 41.5 (eff 0.73), act_rank c4 9.7 / c16 4.7 (eff 0.52). This script
decomposes each action from a MEMORY-CACHED exact-shape batch so each
sub-step is one timed action over identical input:

  base_noop       : scan the cached batch, noop write (cache read floor)
  exchange_noop   : + repartition(64, host, _salt) (the write's exchange)
  flat_write      : + plain parquet write (no bucket metadata, no sort)
  bucketsort_write: + bucketBy+sortBy saveAsTable (the shipped write)
  rank_scan_noop  : bucketed-scan read-back, noop (rank's scan floor)
  rank_counts     : the offsets subjob alone (agg + tiny window + collect
                    via broadcast materialization is driver-side: here
                    timed as agg→localCheckpoint-free count)
  rank_full       : rank_presalted + vtime + noop (the shipped rank)

    taskset -c 0-15 python scripts/exp_sched_drill.py --cpus 16
    taskset -c 0-3  python scripts/exp_sched_drill.py --cpus 4
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

import bench
from crawler_service_spark.functions.urls import canonicalize_frame, host_native
from crawler_service_spark.operators.dedup import (
    anti_join_seen,
    first_occurrence,
    with_key_hash,
)
from crawler_service_spark.operators.politeness import (
    presalt,
    schedule_round,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=32_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = bench.build_spark(args.cpus, "exp-sched-drill")
    spark.sparkContext.setLogLevel("ERROR")
    rank_parts = int(os.environ.get("SPARK_GRAFT_RANK_PARTS", "64"))
    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    n = args.n
    salt_width = max(1 << 14, n // 256)
    sort_cols = ["host", "depth", "_salt", "discovery_seq"]

    frontier = bench.synth_frontier(spark, n, 10_000).persist()
    frontier.count()
    seen = canonicalize_frame(
        bench.synth_frontier(spark, n, 10_000)
        .filter(F.col("discovery_seq") % 3 == 0), "url").select("canon_url")
    seen = with_key_hash(seen, ["canon_url"])
    seen = seen.repartition(parts, "_kh", "canon_url").persist()
    seen.count()

    # exact post-anti-join row shape, cached in memory: sub-steps then
    # time ONLY their own work over identical cached input
    b = canonicalize_frame(frontier, "url").withColumn(
        "host", host_native(F.col("url")))
    b = first_occurrence(b, ["canon_url"], ["discovery_seq"],
                         keep_hash=True, strategy=bench.DEDUP_STRATEGY)
    b = presalt(
        anti_join_seen(b, seen, ["canon_url"], shuffle_hash=True,
                       hash_key=True),
        salt_width).persist()
    n_rows = b.count()

    path = f"{bench.SNAP_DIR}/drill"

    def w_exchange():
        bench.force(b.repartition(rank_parts, F.col("host"), F.col("_salt")))

    def w_flat():
        (b.repartition(rank_parts, F.col("host"), F.col("_salt"))
         .write.mode("overwrite").parquet(path + "_flat"))

    def w_bucketsort():
        spark.sql("DROP TABLE IF EXISTS drill_snap")
        (b.repartition(rank_parts, F.col("host"), F.col("_salt"))
         .write.mode("overwrite").format("parquet")
         .bucketBy(rank_parts, "host", "_salt")
         .sortBy(*sort_cols)
         .option("path", path + "_bs")
         .saveAsTable("drill_snap"))

    # warmup the full write path once; rank steps resolve the table
    # FRESH per call — each bucketsort_write rep rewrites the files, so a
    # captured DataFrame would hold a stale file listing
    w_bucketsort()

    def r_scan():
        bench.force(spark.table("drill_snap"))

    def r_counts():
        spark.table("drill_snap").groupBy("host", "depth", "_salt").agg(
            F.count("*").alias("_c")).write.format("noop").mode(
                "overwrite").save()

    def r_full():
        adm, _ = schedule_round(
            spark.table("drill_snap"), None, default_limit=10,
            default_window_s=60, round_epoch=0.0, priority_col="depth",
            rank_strategy="presalted")
        bench.force(adm)

    steps = [
        ("base_noop", lambda: bench.force(b)),
        ("exchange_noop", w_exchange),
        ("flat_write", w_flat),
        ("bucketsort_write", w_bucketsort),
        ("rank_scan_noop", r_scan),
        ("rank_counts", r_counts),
        ("rank_full", r_full),
    ]
    # warmup every step once (forks workers, JITs codegen)
    for _, fn in steps:
        fn()
    bench.settle(spark)

    out = {"cpus": args.cpus, "n_rows": n_rows, "steps": {}}
    for rep in range(args.reps):
        if rep:
            bench.settle(spark)
        for name, fn in steps:
            p0 = bench.cpu_probe()
            t0 = time.monotonic()
            fn()
            dt = round(time.monotonic() - t0, 2)
            out["steps"].setdefault(name, []).append(
                {"sec": dt, "probe": round(p0, 3)})
            print(json.dumps({name: dt, "rep": rep}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
