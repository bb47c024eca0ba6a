"""Experiment: why does materializing the canon batch inverse-scale at
high parallelism? Compare materialization strategies and GC settings.

    taskset -c 0-15 python scripts/exp_persist.py --cpus 16 --n 4000000
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel
from pyspark.sql import functions as F

from bench import build_spark, force, settle, synth_frontier


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=4_000_000)
    args = ap.parse_args()

    from crawler_service_spark.functions.urls import canonicalize_frame, host_native

    spark = build_spark(args.cpus, "exp-persist")
    spark.sparkContext.setLogLevel("ERROR")
    n = args.n
    frontier = synth_frontier(spark, n, 10_000).persist()
    frontier.count()

    def canon():
        return canonicalize_frame(frontier, "url").withColumn(
            "host", host_native(F.col("url")))

    # warmup
    force(canonicalize_frame(
        synth_frontier(spark, 100_000, 10_000), "url"))
    settle(spark)

    res = {}

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        res[name] = round(time.monotonic() - t0, 3)
        settle(spark)

    def m_default():
        df = canon().persist()
        df.count()
        df.unpersist(True)

    def m_ser():
        df = canon().persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
        df.unpersist(True)

    def m_local_ckpt():
        df = canon().localCheckpoint(eager=True)
        df.count()

    def m_noop():
        force(canon())

    def m_count_only():
        canon().count()

    def m_parquet_shm():
        path = "/dev/shm/exp_persist_parquet"
        canon().write.mode("overwrite").parquet(path)
        import shutil
        shutil.rmtree(path, ignore_errors=True)

    timed("noop_force", m_noop)
    timed("count_only", m_count_only)
    timed("persist_default_deser", m_default)
    timed("persist_ser", m_ser)
    timed("local_checkpoint", m_local_ckpt)
    timed("parquet_devshm", m_parquet_shm)

    print(json.dumps({"cpus": args.cpus, "n": n, "res": res}))
    spark.stop()


if __name__ == "__main__":
    main()
