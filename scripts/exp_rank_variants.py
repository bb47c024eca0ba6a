"""In-JVM alternating A/B of schedule-job variants (r03 north rule).

Drill findings (exp_sched_drill, 32M URLs): rank_full eff 0.46 — the
offsets frame is ~2.56M rows (global-seq salting gives EVERY host ~256
touched salt ranges), so the broadcast build is a fixed driver cost; and
bucketsort_write eff 0.63 — the in-bucket sort compares host STRINGS
first. Variants, all over one cached exact-shape batch:

  write_hostsort : shipped write (sort host, depth, _salt, seq)
  write_hhsort   : + leading _hh = xxhash64(host) column (radix prefix)
  rank_bcast     : shipped rank (broadcast offsets join)
  rank_shuffle   : offsets via co-partitioned shuffled-hash join
  rank_hh        : rank over the _hh layout (window keys led by _hh)

    taskset -c 0-15 python scripts/exp_rank_variants.py --cpus 16
    taskset -c 0-3  python scripts/exp_rank_variants.py --cpus 4
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window
from pyspark.sql import functions as F

import bench
from crawler_service_spark.functions.urls import canonicalize_frame, host_native
from crawler_service_spark.operators.dedup import (
    anti_join_seen,
    first_occurrence,
    with_key_hash,
)
from crawler_service_spark.operators.politeness import presalt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=32_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = bench.build_spark(args.cpus, "exp-rank-variants")
    spark.sparkContext.setLogLevel("ERROR")
    rank_parts = int(os.environ.get("SPARK_GRAFT_RANK_PARTS", "64"))
    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    n = args.n
    salt_width = max(1 << 14, n // 256)

    frontier = bench.synth_frontier(spark, n, 10_000).persist()
    frontier.count()
    seen = canonicalize_frame(
        bench.synth_frontier(spark, n, 10_000)
        .filter(F.col("discovery_seq") % 3 == 0), "url").select("canon_url")
    seen = with_key_hash(seen, ["canon_url"])
    seen = seen.repartition(parts, "_kh", "canon_url").persist()
    seen.count()

    b = canonicalize_frame(frontier, "url").withColumn(
        "host", host_native(F.col("url")))
    b = first_occurrence(b, ["canon_url"], ["discovery_seq"],
                         keep_hash=True, strategy=bench.DEDUP_STRATEGY)
    b = presalt(
        anti_join_seen(b, seen, ["canon_url"], shuffle_hash=True,
                       hash_key=True),
        salt_width).persist()
    b.count()
    bhh = b.withColumn("_hh", F.xxhash64("host"))

    path = f"{bench.SNAP_DIR}/rv"

    def write_hostsort():
        spark.sql("DROP TABLE IF EXISTS rv_host")
        (b.repartition(rank_parts, F.col("host"), F.col("_salt"))
         .write.mode("overwrite").format("parquet")
         .bucketBy(rank_parts, "host", "_salt")
         .sortBy("host", "depth", "_salt", "discovery_seq")
         .option("path", path + "_host").saveAsTable("rv_host"))

    def write_hhsort():
        spark.sql("DROP TABLE IF EXISTS rv_hh")
        (bhh.repartition(rank_parts, F.col("host"), F.col("_salt"))
         .write.mode("overwrite").format("parquet")
         .bucketBy(rank_parts, "host", "_salt")
         .sortBy("_hh", "host", "depth", "_salt", "discovery_seq")
         .option("path", path + "_hh").saveAsTable("rv_hh"))

    def _vtime(df):
        slot = F.floor((F.col("host_rank") - 1) / F.lit(10)).cast("double")
        return df.withColumn("virtual_fetch_time", slot * F.lit(60.0))

    def rank_core(snap, part_cols, join_mode):
        counts = snap.groupBy(*part_cols).agg(F.count("*").alias("_c"))
        w_off = Window.partitionBy("host").orderBy("depth", "_salt")
        offsets = counts.withColumn(
            "_off", F.sum("_c").over(w_off) - F.col("_c")).select(
                *part_cols, "_off")
        w_local = Window.partitionBy(*part_cols).orderBy("discovery_seq")
        ranked = snap.withColumn("_lrn", F.row_number().over(w_local))
        if join_mode == "broadcast":
            ranked = ranked.join(F.broadcast(offsets), list(part_cols))
        else:
            ranked = ranked.join(offsets.hint("shuffle_hash"),
                                 list(part_cols))
        return _vtime(ranked.withColumn(
            "host_rank", (F.col("_lrn") + F.col("_off")).cast("long")))

    def rank_bcast():
        bench.force(rank_core(spark.table("rv_host"),
                              ("host", "depth", "_salt"), "broadcast"))

    def rank_shuffle():
        bench.force(rank_core(spark.table("rv_host"),
                              ("host", "depth", "_salt"), "shuffle"))

    def rank_hh():
        bench.force(rank_core(spark.table("rv_hh"),
                              ("_hh", "host", "depth", "_salt"), "shuffle"))

    steps = [
        ("write_hostsort", write_hostsort),
        ("write_hhsort", write_hhsort),
        ("rank_bcast", rank_bcast),
        ("rank_shuffle", rank_shuffle),
        ("rank_hh", rank_hh),
    ]
    for _, fn in steps:    # warmup
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
