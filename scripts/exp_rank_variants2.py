"""Round 2 of the schedule-job A/B (r03): isolate the bucketsort write's
sort vs catalog overhead, and shrink the rank's offsets cardinality.

Findings so far: rank offsets frame ~= hosts x (n/salt_width) rows
(global-seq salting fragments EVERY host into ~256 salt ranges at
width n/256) — the broadcast build of ~2.56M rows is fixed driver time
(rank eff 0.51); a co-partitioned shuffle join instead re-exchanges the
payload (bucket keys (host,_salt) don't co-partition with join keys
(host,depth,_salt)). Variants:

  w_sorted_path : repartition + sortWithinPartitions + plain parquet
                  (same physical work as bucketsort minus saveAsTable
                  catalog + bucket metadata)
  w_bucketsort  : shipped write (salt width n/256)
  w_bucketsort64: salt width n/64 (4x fewer salt groups; checks write
                  balance is unhurt)
  rank_w256     : shipped rank over w_bucketsort (offsets ~2.56M)
  rank_w64      : rank over w_bucketsort64 (offsets ~640k)

    taskset -c 0-15 python scripts/exp_rank_variants2.py --cpus 16
    taskset -c 0-3  python scripts/exp_rank_variants2.py --cpus 4
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
from crawler_service_spark.operators.politeness import presalt, schedule_round


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=32_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = bench.build_spark(args.cpus, "exp-rank-variants2")
    spark.sparkContext.setLogLevel("ERROR")
    rank_parts = int(os.environ.get("SPARK_GRAFT_RANK_PARTS", "64"))
    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    n = args.n
    w256 = max(1 << 14, n // 256)
    w64 = max(1 << 14, n // 64)
    sort_cols = ["host", "depth", "_salt", "discovery_seq"]

    frontier = bench.synth_frontier(spark, n, 10_000).persist()
    frontier.count()
    seen = canonicalize_frame(
        bench.synth_frontier(spark, n, 10_000)
        .filter(F.col("discovery_seq") % 3 == 0), "url").select("canon_url")
    seen = with_key_hash(seen, ["canon_url"])
    seen = seen.repartition(parts, "_kh", "canon_url").persist()
    seen.count()

    base = canonicalize_frame(frontier, "url").withColumn(
        "host", host_native(F.col("url")))
    base = first_occurrence(base, ["canon_url"], ["discovery_seq"],
                            keep_hash=True, strategy=bench.DEDUP_STRATEGY)
    base = anti_join_seen(base, seen, ["canon_url"], shuffle_hash=True,
                          hash_key=True).persist()
    base.count()
    b256 = presalt(base, w256)
    b64 = presalt(base, w64)

    path = f"{bench.SNAP_DIR}/rv2"

    def w_sorted_path():
        (b256.repartition(rank_parts, F.col("host"), F.col("_salt"))
         .sortWithinPartitions(*sort_cols)
         .write.mode("overwrite").parquet(path + "_sorted"))

    def mk_bucketsort(bdf, tname, p):
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        (bdf.repartition(rank_parts, F.col("host"), F.col("_salt"))
         .write.mode("overwrite").format("parquet")
         .bucketBy(rank_parts, "host", "_salt")
         .sortBy(*sort_cols)
         .option("path", p).saveAsTable(tname))

    def w_bucketsort():
        mk_bucketsort(b256, "rv2_256", path + "_256")

    def w_bucketsort64():
        mk_bucketsort(b64, "rv2_64", path + "_64")

    def rank(tname):
        adm, _ = schedule_round(
            spark.table(tname), None, default_limit=10, default_window_s=60,
            round_epoch=0.0, priority_col="depth", rank_strategy="presalted")
        bench.force(adm)

    steps = [
        ("w_sorted_path", w_sorted_path),
        ("w_bucketsort", w_bucketsort),
        ("w_bucketsort64", w_bucketsort64),
        ("rank_w256", lambda: rank("rv2_256")),
        ("rank_w64", lambda: rank("rv2_64")),
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
