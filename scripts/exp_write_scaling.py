"""Experiment: does the tmpfs parquet snapshot WRITE scale with cores?

Phase attribution showed the write's marginal cost is ~33 s at c4 and
~41 s at c16 (negative scaling) while the pure compute core scales at
0.85 and the box's aggregate DRAM bandwidth scales ~linearly to 16
streaming threads (92 GB/s) — so the write stage itself is the suspect:
parquet encode CPU, shmem kernel-lock contention, or GC. This writes an
identical pre-materialized dataframe with different codecs and row
layouts at one parallelism level.

    python scripts/probe_gate.py --max-probe 0.5 -- \
        taskset -c 0-15 python scripts/exp_write_scaling.py --cpus 16
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=21_000_000)
    args = ap.parse_args()

    from bench import SNAP_DIR, build_spark, force, settle, synth_frontier
    from scripts.bench_scaling import cpu_probe
    from crawler_service_spark.functions.urls import canonicalize_frame, host_native

    spark = build_spark(args.cpus, "exp-write")
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the exact row shape the snapshot writes (canon cols +
    # _kh), partitioned like the anti-join output, cached in memory so
    # the timed region is ONLY the write
    b = canonicalize_frame(synth_frontier(spark, args.n, 10_000), "url")
    b = b.withColumn("host", host_native(F.col("url")))
    b = b.select(F.xxhash64("canon_url").alias("_kh"), *b.columns)
    b = b.repartition(64, "_kh", "canon_url").persist()
    n = b.count()

    path = f"{SNAP_DIR}/exp_write"
    out = {"cpus": args.cpus, "n": n, "timings": {}}

    def timed(name, fn):
        p0 = cpu_probe()
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        p1 = cpu_probe()
        out["timings"][name] = {"sec": round(dt, 2),
                                "probe": round((p0 + p1) / 2, 3)}
        print(json.dumps({name: out["timings"][name]}), flush=True)
        settle(spark)

    # warmup of the write path
    b.limit(500_000).write.mode("overwrite").parquet(path + "_w")
    settle(spark)

    timed("noop_force", lambda: force(b))
    for codec in ("snappy", "zstd", "lz4", "uncompressed"):
        timed(f"parquet_{codec}", lambda c=codec: b.write.mode("overwrite")
              .option("compression", c).parquet(f"{path}_{c}"))
    # read-back cost (p2's other half)
    timed("readback_snappy",
          lambda: force(spark.read.parquet(f"{path}_snappy")))
    for c in ("snappy", "zstd", "lz4", "uncompressed"):
        d = f"{path}_{c}"
        if os.path.isdir(d):
            sz = sum(os.path.getsize(os.path.join(d, f))
                     for f in os.listdir(d) if not f.startswith("_"))
            out["timings"].setdefault(f"parquet_{c}", {})["bytes"] = sz
            shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(path + "_w", ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
