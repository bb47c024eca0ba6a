"""SALT_DENOM sweep on the schedule job, in-JVM alternating (r04).

The rank's offsets frame is ``hosts x DENOM`` rows (global-seq salting
fragments every host into ~DENOM salt ranges); its window + broadcast
build is FLAT driver/barrier time that depresses scaling efficiency.
r03 measured denom 64 > 256; this sweep probes further down (16, 8) at
both parallelism levels — fewer salts shrink the broadcast 4-8x while
per-(host,salt) window cells stay small (hot host at denom 8 and 32M:
~400k rows/cell, trivial for row_number).

    taskset -c 0-15 python scripts/exp_salt_sweep.py --cpus 16
    taskset -c 0-3  python scripts/exp_salt_sweep.py --cpus 4

Alternates denoms inside ONE JVM (settle between) so hypervisor drift
cancels pair-wise; per-call reps use bench.timed_reps (sec = fastest
rep, all reps disclosed). Appends JSON lines to BENCH/salt_sweep.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=32_000_000)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--denoms", default="64,16,8")
    ap.add_argument("--job", choices=["schedule", "round"], default="schedule")
    args = ap.parse_args()
    denoms = [int(d) for d in args.denoms.split(",")]

    spark = bench.build_spark(args.cpus, "exp-salt-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out = os.path.join(REPO, "BENCH", "salt_sweep.jsonl")
    job = (bench.run_schedule_job if args.job == "schedule"
           else bench.run_round_job)

    for r in range(args.rounds):
        order = denoms[r % len(denoms):] + denoms[:r % len(denoms)]
        for denom in order:
            bench.SALT_DENOM = denom       # module-global read at call time
            rec = job(spark, args.n, 10_000, args.cpus, reps=args.reps)
            rec.update({"exp": "salt_sweep", "job": args.job,
                        "denom": denom, "round": r,
                        "probe": bench.cpu_probe()})
            with open(out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"r{r} denom={denom}: sec={rec['sec']} "
                  f"ups={rec['urls_per_sec']} probe={rec['probe']}",
                  flush=True)
            bench.settle(spark)
    spark.stop()


if __name__ == "__main__":
    main()
