"""Targeted clean-pool filler for the north-rule scaling report.

The per-level median tables in BENCH/BASELINE.md gate each pool on
(probe <= 1.15x best, steal <= 1.5%); after the rev-8 campaigns the c4
pools hold 6 clean runs each but schedule-c16 holds ONE (steal bursts
excluded the rest) and round-c16 holds four.  This runner fills exactly
the thin pools: it waits for a fast-host window, fires the under-filled
(job, c16) level first, and interleaves an occasional c4 run so the
probe-matched pair estimator keeps gaining pairs at the same host speed.

Usage: python scripts/exp_c16_burst.py [--minutes M] [--max-probe P]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "bench_scaling", os.path.join(REPO, "scripts", "bench_scaling.py"))
bs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bs)

JOB_N = {"round": 6_000_000, "schedule": 32_000_000}


def clean_count(history, job, cpus):
    return len(bs.runs_for(history, job, cpus, JOB_N[job]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--max-probe", type=float, default=0.37)
    ap.add_argument("--job-reps", type=int, default=2)
    args = ap.parse_args()
    deadline = time.monotonic() + args.minutes * 60

    history = bs.load_history()
    i = 0
    while time.monotonic() < deadline:
        # thinnest c16 pool first; every 3rd slot a c4 run for pairing
        counts = {j: clean_count(history, j, 16) for j in JOB_N}
        if i % 3 == 2:
            job = min(JOB_N, key=lambda j: clean_count(history, j, 4))
            cpus = 4
        else:
            job = min(counts, key=counts.get)
            cpus = 16
        i += 1
        n = JOB_N[job]
        # skip a run we cannot finish before the deadline (c4 runs are
        # the long ones; budget = reps * observed single-run wall + slack)
        budget = {("schedule", 16): 110, ("round", 16): 140,
                  ("schedule", 4): 260, ("round", 4): 380}[(job, cpus)]
        if time.monotonic() + budget > deadline:
            if cpus == 4:
                continue
            break
        print(f"[burst] {job} c{cpus} (clean c16 pools: {counts})",
              file=sys.stderr, flush=True)
        try:
            rec = bs.run_once(job, cpus, n, max_probe=args.max_probe,
                              job_reps=args.job_reps)
        except Exception as e:  # a failed subprocess must not end the burst
            print(f"[burst] run failed: {e}", file=sys.stderr, flush=True)
            continue
        history.append(rec)
        bs.save_history(history)
        print(f"[burst] {job} c{cpus}: {rec['urls_per_sec']:.0f} urls/s "
              f"({rec['sec']:.2f}s, probe {rec['probe_sec']:.3f}, "
              f"steal {rec['steal_pct']}%)", file=sys.stderr, flush=True)
    print("[burst] done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
