"""Phase attribution: flat-snapshot+adaptive-rank vs bucketed-snapshot+
presalted-rank for the schedule job's tail (write + rank).

Input: the anti-join output materialized once (persisted), so both
variants time ONLY (a) the snapshot write, (b) the rank consuming the
read-back snapshot. Usage:
    taskset -c 0-15 python scripts/exp_bucketed_phases.py --cpus 16 --n 8000000
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from crawler_service_spark.functions.urls import canonicalize_frame, host_native
from crawler_service_spark.operators.dedup import with_key_hash, anti_join_seen, first_occurrence
from crawler_service_spark.operators.politeness import presalt, schedule_round


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--n", type=int, default=8_000_000)
    ap.add_argument("--n-hosts", type=int, default=10_000)
    args = ap.parse_args()

    spark = bench.build_spark(args.cpus, "exp-bucketed-phases")
    spark.sparkContext.setLogLevel("ERROR")
    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    rank_parts = int(os.environ.get("SPARK_GRAFT_RANK_PARTS", "64"))
    salt_width = max(1 << 14, args.n // 256)

    frontier = bench.synth_frontier(spark, args.n, args.n_hosts)
    seen = (
        canonicalize_frame(
            bench.synth_frontier(spark, args.n, args.n_hosts)
            .filter(F.col("discovery_seq") % 3 == 0), "url")
        .select("canon_url"))
    seen = with_key_hash(seen.select("canon_url"), ["canon_url"])
    seen = seen.repartition(parts, "_kh", "canon_url").persist()
    seen.count()

    b = canonicalize_frame(frontier, "url").withColumn(
        "host", host_native(F.col("url")))
    b = first_occurrence(b, ["canon_url"], ["discovery_seq"],
                         keep_hash=True, strategy="window")
    b = anti_join_seen(b, seen, ["canon_url"], shuffle_hash=True,
                       hash_key=True).persist()
    n_after = b.count()
    print(f"anti-join output {n_after} rows", file=sys.stderr)

    def timed(label, fn):
        bench.settle(spark)
        p0 = bench.cpu_probe()
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        print(f"{label}: {dt:.2f}s (probe {p0:.3f}/{bench.cpu_probe():.3f})")

    sort_cols = ["host", "depth", "_salt", "discovery_seq"]

    # warmup both paths once at 1/20 scale
    w = b.limit(args.n // 20)
    bench.snapshot(spark, w, "exp_flat_w")
    bench.snapshot_bucket_sorted(spark, presalt(w, salt_width), "exp_bs_w",
                                 rank_parts, ["host", "_salt"], sort_cols)

    for rep in range(2):
        timed("write_flat", lambda: bench.snapshot(spark, b, "exp_flat"))
        timed("write_bucketsort",
              lambda: bench.snapshot_bucket_sorted(
                  spark, presalt(b, salt_width), "exp_bsort",
                  rank_parts, ["host", "_salt"], sort_cols))
        flat = spark.read.parquet(f"{bench.SNAP_DIR}/exp_flat")
        bs = spark.table("exp_bsort")

        def rank_flat():
            adm, _ = schedule_round(
                flat, None, priority_col="depth",
                shuffle_partitions=rank_parts, salt_width=salt_width)
            bench.force(adm)

        def rank_presalted_sorted():
            adm, _ = schedule_round(
                bs, None, priority_col="depth", rank_strategy="presalted")
            bench.force(adm)

        timed("rank_adaptive_over_flat", rank_flat)
        timed("rank_presalted_over_bucketsort", rank_presalted_sorted)
    spark.stop()


if __name__ == "__main__":
    main()
