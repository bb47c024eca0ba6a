"""Experiment: schedule-job input fidelity — deserialized cache vs tmpfs
parquet (what the engine actually reads: frontier/seen live in per-round
parquet snapshots, sources/storage.py).

A deserialized in-memory cache scan is pure memory-bus traffic; a parquet
scan spends CPU decoding (snappy + dictionary), which parallelizes. If
parquet inputs scale better, they are BOTH the more faithful model and
the better-scaling one.

    taskset -c 0-3  python scripts/exp_input_variant.py --cpus 4  --input parquet
    taskset -c 0-15 python scripts/exp_input_variant.py --cpus 16 --input cache
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=16_000_000)
    ap.add_argument("--input", default="parquet", choices=["parquet", "cache"])
    args = ap.parse_args()

    from bench import build_spark, force, settle, snapshot, synth_frontier
    from crawler_service_spark.functions.urls import canonicalize_frame, host_native
    from crawler_service_spark.operators.dedup import anti_join_seen, first_occurrence
    from crawler_service_spark.operators.politeness import schedule_round

    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    rank_parts = int(os.environ.get("SPARK_GRAFT_RANK_PARTS", "64"))
    spark = build_spark(args.cpus, "exp-input")
    spark.sparkContext.setLogLevel("ERROR")
    n = args.n

    def materialize(df, name):
        if args.input == "cache":
            df = df.persist()
            df.count()
            return df
        return snapshot(spark, df, name)

    frontier = materialize(synth_frontier(spark, n, 10_000), "exp_frontier")
    seen = materialize(
        canonicalize_frame(
            synth_frontier(spark, n, 10_000).filter(F.col("discovery_seq") % 3 == 0),
            "url")
        .select("canon_url").repartition(parts, "canon_url"),
        "exp_seen",
    )

    def run_pipeline(src, seen_df, n_rows):
        b = canonicalize_frame(src, "url").withColumn(
            "host", host_native(F.col("url")))
        b = first_occurrence(b, ["canon_url"], ["discovery_seq"])
        b = snapshot(spark, anti_join_seen(b, seen_df, ["canon_url"],
                                           shuffle_hash=True),
                     "exp_round")
        admitted, _ = schedule_round(
            b, None, default_limit=10, default_window_s=60,
            round_epoch=0.0, priority_col="depth",
            shuffle_partitions=rank_parts,
            salt_width=max(1 << 14, n_rows // 256),
        )
        force(admitted)

    wn = max(100_000, n // 40)
    run_pipeline(synth_frontier(spark, wn, 10_000), seen, wn)
    settle(spark)

    t0 = time.monotonic()
    run_pipeline(frontier, seen, n)
    elapsed = time.monotonic() - t0
    print(json.dumps({
        "cpus": args.cpus, "n": n, "input": args.input,
        "sec": round(elapsed, 3),
        "urls_per_sec": round(n / elapsed, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
