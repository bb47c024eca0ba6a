"""Decompose the schedule core (canon -> dedup -> anti-join) per level.

    taskset -c 0-15 python scripts/exp_core_drill.py --cpus 16
    taskset -c 0-3  python scripts/exp_core_drill.py --cpus 4
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=32_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = bench.build_spark(args.cpus, "exp-core-drill")
    spark.sparkContext.setLogLevel("ERROR")
    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    n = args.n

    frontier = bench.synth_frontier(spark, n, 10_000).persist()
    frontier.count()
    seen = canonicalize_frame(
        bench.synth_frontier(spark, n, 10_000)
        .filter(F.col("discovery_seq") % 3 == 0), "url").select("canon_url")
    seen = with_key_hash(seen, ["canon_url"])
    seen = seen.repartition(parts, "_kh", "canon_url").persist()
    seen.count()

    def canon():
        return canonicalize_frame(frontier, "url").withColumn(
            "host", host_native(F.col("url")))

    def dedup(c):
        return first_occurrence(c, ["canon_url"], ["discovery_seq"],
                                keep_hash=True,
                                strategy=bench.DEDUP_STRATEGY)

    steps = [
        ("scan_noop", lambda: bench.force(frontier)),
        ("canon_noop", lambda: bench.force(canon())),
        ("canon_dedup_noop", lambda: bench.force(dedup(canon()))),
        ("core_noop", lambda: bench.force(
            anti_join_seen(dedup(canon()), seen, ["canon_url"],
                           shuffle_hash=True, hash_key=True))),
    ]
    for _, fn in steps:
        fn()
    bench.settle(spark)

    out = {"cpus": args.cpus, "steps": {}}
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
