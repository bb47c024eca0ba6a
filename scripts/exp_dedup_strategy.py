"""Experiment: first_occurrence strategy A/B (agg vs window) on the
bench's unique-heavy synthetic frontier.

The agg (min-struct SortAggregate) pays a map-side sort + partial agg
that collapses NOTHING when keys are unique, then a post-shuffle sort +
final agg; the window pays one post-shuffle sort. Both leave the same
(_kh, keys) partitioning for the downstream anti-join. This measures
the end-to-end p1 core (canon -> dedup -> anti-join -> force) per
strategy at one parallelism level.

    python scripts/probe_gate.py --max-probe 0.5 -- \
        taskset -c 0-15 python scripts/exp_dedup_strategy.py --cpus 16
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
    ap.add_argument("--n", type=int, default=32_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from bench import build_spark, force, settle, synth_frontier
    from scripts.bench_scaling import cpu_probe
    from crawler_service_spark.functions.urls import canonicalize_frame, host_native
    from crawler_service_spark.operators.dedup import anti_join_seen, first_occurrence

    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    spark = build_spark(args.cpus, "exp-dedup-strategy")
    spark.sparkContext.setLogLevel("ERROR")
    n = args.n

    frontier = synth_frontier(spark, n, 10_000).persist()
    frontier.count()
    seen = (
        canonicalize_frame(
            synth_frontier(spark, n, 10_000).filter(F.col("discovery_seq") % 3 == 0),
            "url",
        )
        .select("canon_url")
        .selectExpr("xxhash64(canon_url) AS _kh", "canon_url")
        .repartition(parts, "_kh", "canon_url")
        .persist()
    )
    seen.count()

    def pipeline(src, strategy):
        b = canonicalize_frame(src, "url").withColumn(
            "host", host_native(F.col("url")))
        b = first_occurrence(b, ["canon_url"], ["discovery_seq"],
                             keep_hash=True, strategy=strategy)
        return anti_join_seen(b, seen, ["canon_url"],
                              shuffle_hash=True, hash_key=True)

    # warmup both paths at 1/40
    wn = max(100_000, n // 40)
    for s in ("agg", "window"):
        force(pipeline(synth_frontier(spark, wn, 10_000), s))
    settle(spark)

    out = {"cpus": args.cpus, "n": n, "runs": []}
    # interleave strategies so a host-speed swing hits both equally
    for rep in range(args.reps):
        for s in ("agg", "window"):
            p0 = cpu_probe()
            t0 = time.monotonic()
            force(pipeline(frontier, s))
            dt = time.monotonic() - t0
            p1 = cpu_probe()
            settle(spark)
            out["runs"].append({
                "strategy": s, "rep": rep, "sec": round(dt, 2),
                "probe_before": round(p0, 3), "probe_after": round(p1, 3),
            })
            print(json.dumps(out["runs"][-1]), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
