"""A/B the round-5 contention levers on the schedule/round jobs.

Levers (each a fresh-JVM env config, alternated to cancel host drift):

* offsets join:  broadcast (shipped r04) vs shuffle_hash (rank_presalted
  joins the tiny offsets frame with a distributed per-partition hash
  build instead of a driver-side broadcast build + barrier)
* window buffer: spark.sql.windowExec.buffer.in.memory.threshold bumped
  so the rank's 100k+-row window groups stay in a plain array instead of
  the task-memory-manager-backed external array (lock contention at 16
  concurrent tasks)
* GC: ParallelGC vs the default G1 (the same total GC work runs inside a
  4x shorter wall at the high level, so collector choice moves the
  scaling RATIO)

Usage:
    python scripts/exp_offsets_gc_ab.py --cpus 16 --rounds 2 \
        [--job schedule] [--n 32000000] [--variants base,shj,...]
Appends one JSON line per run to /tmp/offsets_ab_<job>_<cpus>.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WINBUF = "spark.sql.windowExec.buffer.in.memory.threshold=4194304"

VARIANTS = {
    "base": {},
    "shj": {"SPARK_GRAFT_OFFSETS_JOIN": "shuffle_hash"},
    "winbuf": {"SPARK_GRAFT_EXTRA_CONF": WINBUF},
    "shj_winbuf": {"SPARK_GRAFT_OFFSETS_JOIN": "shuffle_hash",
                   "SPARK_GRAFT_EXTRA_CONF": WINBUF},
    "pgc": {"SPARK_GRAFT_JAVA_OPTS": "-XX:+UseParallelGC"},
    "shj_winbuf_pgc": {"SPARK_GRAFT_OFFSETS_JOIN": "shuffle_hash",
                       "SPARK_GRAFT_EXTRA_CONF": WINBUF,
                       "SPARK_GRAFT_JAVA_OPTS": "-XX:+UseParallelGC"},
}


# single source of truth for the spin probe — a drifted copy would make
# probe numbers non-comparable across the benchmark records
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import cpu_probe  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=32_000_000)
    ap.add_argument("--job", default="schedule", choices=["schedule", "round"])
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    names = [v for v in args.variants.split(",") if v]
    out_path = f"/tmp/offsets_ab_{args.job}_{args.cpus}.jsonl"
    for rnd in range(args.rounds):
        for name in names:
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(args.cpus),
                       **VARIANTS[name])
            p0 = cpu_probe()
            out = subprocess.run(
                ["taskset", "-c", f"0-{args.cpus - 1}", sys.executable,
                 os.path.join(REPO, "bench.py"), "--job", args.job,
                 "--n-urls", str(args.n), "--reps", str(args.reps)],
                env=env, capture_output=True, text=True, cwd=REPO)
            p1 = cpu_probe()
            line = [ln for ln in out.stdout.strip().splitlines()
                    if ln.startswith("{")]
            rec = {"variant": name, "round": rnd, "cpus": args.cpus,
                   "probe_before": p0, "probe_after": p1,
                   "rc": out.returncode}
            if line:
                r = json.loads(line[-1])
                rec["sec"] = r["sec"]
                rec["urls_per_sec"] = r["urls_per_sec"]
                rec["rep_runs"] = r.get("rep_runs")
            else:
                rec["stderr_tail"] = out.stderr[-500:]
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps({k: rec.get(k) for k in
                              ("variant", "round", "sec", "probe_before",
                               "probe_after", "rc")}), flush=True)


if __name__ == "__main__":
    main()
