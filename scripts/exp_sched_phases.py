"""Experiment: locate the schedule job's NON-SCALING time.

Fitting t = f + w/cpus to the last clean 32M-URL pair (c4 192 s, c16
90 s) gives f ≈ 56 s that does not shrink with cores — the scaling
killer. This script times the job's internal phases separately at one
parallelism level so two runs (c4, c16) show which phase holds the
serial time:

  p1_canon_dedup_anti : canon → first_occurrence → anti-join → parquet
                        snapshot write (one action)
  p2_readback_stats   : snapshot read + the rank's single stats collect
  p3_rank_force       : salted window rank + vtime + noop force

    taskset -c 0-3  python scripts/exp_sched_phases.py --cpus 4
    taskset -c 0-15 python scripts/exp_sched_phases.py --cpus 16
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=32_000_000)
    args = ap.parse_args()

    from bench import (DEDUP_STRATEGY, SNAP_DIR, build_spark, force, settle,
                       snapshot, synth_frontier)
    from crawler_service_spark.functions.urls import canonicalize_frame, host_native
    from crawler_service_spark.operators.dedup import anti_join_seen, first_occurrence
    from crawler_service_spark.operators.politeness import (
        schedule_round,
        skew_resistant_host_rank,
        with_host_policy,
    )

    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    rank_parts = int(os.environ.get("SPARK_GRAFT_RANK_PARTS", "64"))
    spark = build_spark(args.cpus, "exp-sched-phases")
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

    # warmup: identical full pipeline at 1/40 scale
    wn = max(100_000, n // 40)
    wb = canonicalize_frame(synth_frontier(spark, wn, 10_000), "url").withColumn(
        "host", host_native(F.col("url")))
    wb = first_occurrence(wb, ["canon_url"], ["discovery_seq"], keep_hash=True, strategy=DEDUP_STRATEGY)
    wb = snapshot(spark, anti_join_seen(wb, seen, ["canon_url"],
                                        shuffle_hash=True, hash_key=True),
                  "phase_warm")
    wadm, _ = schedule_round(
        wb, None, default_limit=10, default_window_s=60, round_epoch=0.0,
        priority_col="depth", shuffle_partitions=rank_parts,
        salt_width=max(1 << 14, wn // 256))
    force(wadm)
    settle(spark)

    from bench_scaling import ProbeSampler

    stages: dict[str, float] = {}
    probes: dict[str, float] = {}

    sampler = ProbeSampler()
    t0 = time.monotonic()
    b = canonicalize_frame(frontier, "url").withColumn(
        "host", host_native(F.col("url")))
    b = first_occurrence(b, ["canon_url"], ["discovery_seq"], keep_hash=True, strategy=DEDUP_STRATEGY)
    path = f"{SNAP_DIR}/phase_round"
    anti_join_seen(b, seen, ["canon_url"], shuffle_hash=True, hash_key=True) \
        .write.mode("overwrite").parquet(path)
    stages["p1_canon_dedup_anti_write"] = round(time.monotonic() - t0, 3)
    probes["p1"] = sampler.stop()

    sampler = ProbeSampler()
    t0 = time.monotonic()
    b = spark.read.parquet(path)
    b = with_host_policy(b, None, 10, 60)
    # replicate the stats collect inside skew_resistant_host_rank alone
    salt_width = max(1 << 14, n // 256)
    salt = F.floor(F.col("discovery_seq") / F.lit(int(salt_width))).cast("long")
    hot_rows = (
        b.groupBy("host", salt.alias("_salt"))
        .agg(F.count("*").alias("_c"),
             F.min("depth").alias("_pmin"), F.max("depth").alias("_pmax"))
        .groupBy("host")
        .agg(F.sum("_c").alias("_hc"),
             F.min("_pmin").alias("_pn"), F.max("_pmax").alias("_px"),
             F.collect_list(F.struct("_salt", "_c")).alias("_buckets"))
        .filter((F.col("_hc") >= int(salt_width)) & (F.col("_pn") == F.col("_px")))
        .select("host", "_buckets").collect()
    )
    stages["p2_readback_stats_collect"] = round(time.monotonic() - t0, 3)
    probes["p2"] = sampler.stop()
    stages["n_hot_hosts"] = len(hot_rows)

    sampler = ProbeSampler()
    t0 = time.monotonic()
    ranked = skew_resistant_host_rank(b, "depth", rank_parts,
                                      salt_width=salt_width)
    window_slot = F.floor((F.col("host_rank") - 1) / F.col("rate_limit")).cast(
        "double")
    vtime = F.greatest(
        window_slot * F.col("window_s").cast("double"),
        (F.col("host_rank") - 1).cast("double") * F.col("crawl_delay_s"))
    force(ranked.withColumn("virtual_fetch_time", vtime))
    stages["p3_rank_force"] = round(time.monotonic() - t0, 3)
    probes["p3"] = sampler.stop()
    stages["total"] = round(
        stages["p1_canon_dedup_anti_write"]
        + stages["p2_readback_stats_collect"] + stages["p3_rank_force"], 3)

    print(json.dumps({"cpus": args.cpus, "n": n, "stages": stages,
                      "probes": probes}))
    spark.stop()


if __name__ == "__main__":
    main()
