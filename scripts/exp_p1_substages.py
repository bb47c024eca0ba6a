"""Experiment: attribute p1's time (canon -> first_occurrence ->
anti-join -> snapshot write) across sub-stages, at one parallelism.

Each step forces an incrementally longer prefix of the pipeline with a
noop sink, so step_k - step_{k-1} ~ the marginal cost of stage k (same
lineage, no materialization between steps).

    taskset -c 0-3  python scripts/exp_p1_substages.py --cpus 4
    taskset -c 0-15 python scripts/exp_p1_substages.py --cpus 16
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
    args = ap.parse_args()

    from bench import (DEDUP_STRATEGY, SNAP_DIR, build_spark, force, settle,
                       synth_frontier)
    from crawler_service_spark.functions.urls import canonicalize_frame, host_native
    from crawler_service_spark.operators.dedup import anti_join_seen, first_occurrence

    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    spark = build_spark(args.cpus, "exp-p1")
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

    def canon(src):
        return canonicalize_frame(src, "url").withColumn(
            "host", host_native(F.col("url")))

    # warmup of every path at 1/40
    wn = max(100_000, n // 40)
    wsrc = synth_frontier(spark, wn, 10_000)
    wb = first_occurrence(canon(wsrc), ["canon_url"], ["discovery_seq"],
                          keep_hash=True, strategy=DEDUP_STRATEGY)
    anti_join_seen(wb, seen, ["canon_url"], shuffle_hash=True, hash_key=True) \
        .write.mode("overwrite").parquet(f"{SNAP_DIR}/p1_warm")
    settle(spark)

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from bench_scaling import ProbeSampler

    stages: dict[str, float] = {}
    probes: dict[str, float] = {}

    def timed(name, fn):
        sampler = ProbeSampler()
        t0 = time.monotonic()
        fn()
        stages[name] = round(time.monotonic() - t0, 3)
        probes[name] = sampler.stop()
        settle(spark)

    timed("a_scan", lambda: force(frontier))
    timed("b_canon", lambda: force(canon(frontier)))
    timed("c_canon_dedup", lambda: force(
        first_occurrence(canon(frontier), ["canon_url"], ["discovery_seq"],
                         keep_hash=True, strategy=DEDUP_STRATEGY)))
    timed("d_canon_dedup_anti", lambda: force(
        anti_join_seen(
            first_occurrence(canon(frontier), ["canon_url"], ["discovery_seq"],
                             keep_hash=True, strategy=DEDUP_STRATEGY),
            seen, ["canon_url"], shuffle_hash=True, hash_key=True)))
    timed("e_full_write", lambda:
        anti_join_seen(
            first_occurrence(canon(frontier), ["canon_url"], ["discovery_seq"],
                             keep_hash=True, strategy=DEDUP_STRATEGY),
            seen, ["canon_url"], shuffle_hash=True, hash_key=True)
        .write.mode("overwrite").parquet(f"{SNAP_DIR}/p1_full"))

    print(json.dumps({"cpus": args.cpus, "n": n, "stages": stages,
                      "probes": probes}))
    spark.stop()


if __name__ == "__main__":
    main()
