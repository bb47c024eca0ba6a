"""Experiment: per-stage scaling levers for the schedule job (north rule).

Times each schedule-core stage in one JVM at the given parallelism, with
a selectable GC regime (the JVM-regex canonicalization stage allocates
heavily — GC choice may set its scaling ceiling) and an A/B of the seen
anti-join physical strategy (planner-chosen SMJ vs a shuffle_hash hint).

    taskset -c 0-3  python scripts/exp_scaling2.py --cpus 4  --gc g1
    taskset -c 0-15 python scripts/exp_scaling2.py --cpus 16 --gc parallel

Prints one JSON line {"cpus", "gc", "stages": {...}}.
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

GC_OPTS = {
    "g1": "-XX:+UseG1GC",
    "g1young": "-XX:+UseG1GC -XX:+UnlockExperimentalVMOptions -XX:G1NewSizePercent=40 -XX:G1MaxNewSizePercent=60",
    "parallel": "-XX:+UseParallelGC",
    "zgc": "-XX:+UseZGC -XX:+ZGenerational",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=8_000_000)
    ap.add_argument("--gc", default="g1", choices=sorted(GC_OPTS))
    ap.add_argument("--parts", type=int, default=None)
    args = ap.parse_args()
    if args.parts:
        os.environ["SPARK_GRAFT_SHUFFLE_PARTS"] = str(args.parts)

    os.environ["SPARK_GRAFT_DRIVER_OPTS"] = GC_OPTS[args.gc]
    from pyspark.sql import SparkSession

    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("exp-scaling2")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions", GC_OPTS[args.gc])
        .config("spark.local.dir", "/dev/shm/spark_local_exp")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import force, settle, synth_frontier
    from crawler_service_spark.functions.urls import canonicalize_frame, host_native
    from crawler_service_spark.operators.dedup import anti_join_seen, first_occurrence
    from crawler_service_spark.operators.politeness import schedule_round

    n = args.n
    frontier = synth_frontier(spark, n, 10_000).persist()
    frontier.count()
    seen = (
        canonicalize_frame(
            synth_frontier(spark, n, 10_000).filter(F.col("discovery_seq") % 3 == 0),
            "url")
        .select("canon_url").repartition(parts, "canon_url").persist()
    )
    seen.count()

    def canon():
        return canonicalize_frame(frontier, "url").withColumn(
            "host", host_native(F.col("url")))

    # warmup all code paths once at 1/40 scale
    wf = synth_frontier(spark, n // 40, 10_000)
    wb = canonicalize_frame(wf, "url").withColumn("host", host_native(F.col("url")))
    wb = first_occurrence(wb, ["canon_url"], ["discovery_seq"])
    force(anti_join_seen(wb, seen, ["canon_url"]))
    settle(spark)

    stages: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        stages[name] = round(time.monotonic() - t0, 3)
        settle(spark)

    timed("canon_union", lambda: force(canon()))
    timed("canon_union2", lambda: force(canon()))

    c = canon().persist()
    c.count()
    settle(spark)
    timed("dedup_on_cached", lambda: force(
        first_occurrence(c, ["canon_url"], ["discovery_seq"])))

    d = first_occurrence(c, ["canon_url"], ["discovery_seq"]).persist()
    d.count()
    settle(spark)
    timed("anti_join_smj", lambda: force(
        d.join(seen.select("canon_url"), ["canon_url"], "left_anti")))
    timed("anti_join_shj_hint", lambda: force(
        d.join(seen.select("canon_url").hint("shuffle_hash"),
               ["canon_url"], "left_anti")))

    b = anti_join_seen(d, seen, ["canon_url"]).persist()
    b.count()
    settle(spark)
    timed("rank", lambda: force(schedule_round(
        b, None, priority_col="depth", shuffle_partitions=parts,
        salt_width=max(1 << 14, n // 256))[0]))

    print(json.dumps({"cpus": args.cpus, "gc": args.gc, "n": n,
                      "parts": parts, "stages": stages}))
    spark.stop()


if __name__ == "__main__":
    main()
