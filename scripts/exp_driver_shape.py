"""A/B the rev-7/8 physical-shape levers at the DRIVER's bench shape.

r03 VERDICT item 2: the driver measures ``python bench.py`` at
local[32], 2M URLs, unpinned, single-shot — but host-late, salt width
n/64, and the rename-register bucketsort write were only ever A/B'd
pinned at c4/c16 on 32M rows, and the driver's recorded
``frontier_schedule_dedup`` regressed ~15% beyond host noise. This
script runs ``bench.py --job schedule`` at the driver shape for each
lever (one factor at a time from the shipped default), interleaved
round-robin so hypervisor drift cancels across configs, with spin
probes recorded per run. Results append to BENCH/driver_shape_ab.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "driver_shape_ab.jsonl")

CONFIGS = {
    "base": {},
    "host_early": {"SPARK_GRAFT_HOST_STAGE": "early"},
    "salt256": {"SPARK_GRAFT_SALT_DENOM": "256"},
    "save_table": {"SPARK_GRAFT_BUCKETSORT_WRITE": "saveAsTable"},
    "rank256": {"SPARK_GRAFT_RANK_PARTS": "256"},
    "rank32": {"SPARK_GRAFT_RANK_PARTS": "32"},
    "flat": {"SPARK_GRAFT_SNAPSHOT_LAYOUT": "flat"},
}


def cpu_probe() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i
    return round(time.perf_counter() - t0, 4)


def run_one(name: str, env_over: dict, reps: int) -> dict:
    env = dict(os.environ)
    env.update(env_over)
    env["PYTHONPATH"] = REPO
    p0 = cpu_probe()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--job", "schedule", "--reps", str(reps)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1200,
    )
    p1 = cpu_probe()
    rec = {"config": name, "probe_before": p0, "probe_after": p1,
           "rc": proc.returncode}
    if proc.returncode == 0:
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                rec.update(json.loads(line))
                break
    else:
        rec["stderr_tail"] = proc.stderr[-500:]
    return rec


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = list(CONFIGS)
    for r in range(rounds):
        # rotate the start so no config always runs first-after-idle
        order = names[r % len(names):] + names[:r % len(names)]
        for name in order:
            rec = run_one(name, CONFIGS[name], reps)
            rec["round"] = r
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            first = rec.get("rep_runs", [{}])[0].get("sec")
            print(f"r{r} {name}: best={rec.get('sec')} first={first} "
                  f"probe={rec['probe_before']}/{rec['probe_after']} "
                  f"rc={rec['rc']}", flush=True)


if __name__ == "__main__":
    main()
