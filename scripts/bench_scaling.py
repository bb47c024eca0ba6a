"""Two-parallelism scaling evidence for the north rule (BASELINE.json).

The rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors; no real cluster exists in this sandbox, so (per BASELINE.md)
the proxy is the SAME north-rule job — canonicalize + dedup + schedule a
common-host-skewed synthetic frontier — at local[N] vs local[4N] on
identical input, each in a fresh subprocess (clean JVM, no warm caches
shared between runs). Writes BENCH/BASELINE.md.

Default levels are local[4] → local[16] on this 32-core box: a cluster's
N→4N adds whole NODES (each executor keeps its own memory bandwidth),
whereas local[32] would oversubscribe the single box's DRAM bandwidth
and benchmark the memory bus, not the engine (measured: local[16]
outruns local[32] in absolute throughput on this job). Keeping the high
level at half the physical cores preserves per-thread bandwidth, which
is the resource shape the rule's multi-executor scaling actually has.

Usage: python scripts/bench_scaling.py [--n-urls N] [--runs K]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_for_quiet(max_load: float, timeout_s: int = 900) -> float:
    """Block until the 1-min load average drops below ``max_load`` (or
    the timeout passes). On this shared host external bursts of 7-12
    busy cores come and go; measuring inside a quiet window is the only
    way two runs are comparable."""
    import time

    t0 = time.monotonic()
    load = os.getloadavg()[0]
    while load > max_load and time.monotonic() - t0 < timeout_s:
        time.sleep(15)
        load = os.getloadavg()[0]
    return load


def run_once(cpus: int, n_urls: int, quiet_load: float | None = None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    if quiet_load is not None:
        wait_for_quiet(quiet_load)
    load_before = os.getloadavg()[0]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--job", "schedule",
         "--n-urls", str(n_urls)],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    # ambient load when the run started (this shared box sees bursts of
    # external load that slow identical runs up to 6x — recorded so the
    # report can show which runs were contended)
    rec["loadavg_before"] = round(load_before, 2)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, default=16_000_000)
    ap.add_argument("--runs", type=int, default=3, help="best-of-K per level")
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--quiet-load", type=float, default=None,
                    help="wait (≤15 min) for 1-min loadavg below this "
                         "before each run")
    args = ap.parse_args()

    # interleave the levels (low, high, low, high, …) so a burst of
    # external load on this shared box cannot hit one level's runs only;
    # best-of-K per level then approximates the uncontended time
    results = {args.low: {"all": []}, args.high: {"all": []}}
    for i in range(args.runs):
        for cpus in (args.low, args.high):
            rec = run_once(cpus, args.n_urls, quiet_load=args.quiet_load)
            results[cpus]["all"].append(rec)
            print(f"round {i + 1}: local[{cpus}] {rec['urls_per_sec']:.0f} urls/s "
                  f"({rec['sec']:.2f}s, load {rec['loadavg_before']})",
                  file=sys.stderr)
    for cpus in (args.low, args.high):
        runs = results[cpus]["all"]
        best = max(runs, key=lambda r: r["urls_per_sec"])
        results[cpus]["best"] = best
        print(f"local[{cpus}]: best {best['urls_per_sec']:.0f} urls/s "
              f"({best['sec']:.2f}s for {args.n_urls} urls)", file=sys.stderr)

    lo, hi = results[args.low]["best"], results[args.high]["best"]
    speedup = hi["urls_per_sec"] / lo["urls_per_sec"]
    core_ratio = args.high / args.low
    efficiency = speedup / core_ratio

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(f"""# BENCH — two-parallelism scaling evidence (north rule)

Job: the north-rule frontier pipeline (`bench.py --job schedule`),
structured as one engine round: hybrid canonicalization (JVM-native
fast path + exact pandas-UDF fallback) → in-batch first-occurrence
dedup (map-side combining aggregate) → exact anti-join vs a
pre-partitioned URL-seen set → round-snapshot materialization →
per-host politeness rank + virtual-schedule (adaptive hot-host
salting), forced end-to-end through a noop sink.
Input: {args.n_urls:,} synthetic URLs, Zipf(1)-skewed over 10,000 hosts
(identical deterministic input at both levels; identical shuffle
partitioning — 64 — so only concurrency differs). Each level runs in a
fresh JVM subprocess; levels are interleaved and the best of
{args.runs} runs per level is reported — this shared host shows
intermittent external load (recorded per-run as ``loadavg_before`` in
the raw JSON) that slows identical runs up to 6×, so best-of
approximates the uncontended time.

| parallelism | wall (s) | URLs scheduled+deduped / sec |
|---|---|---|
| local[{args.low}] | {lo['sec']:.2f} | {lo['urls_per_sec']:,.0f} |
| local[{args.high}] | {hi['sec']:.2f} | {hi['urls_per_sec']:,.0f} |

**Speedup {args.low}→{args.high} cores ({core_ratio:.0f}× cores): {speedup:.2f}×**

**Scaling efficiency: {efficiency:.3f}** (target ≥ 0.8 per
`BASELINE.json` north_rule; sandbox proxy for N→4N executors per
`BASELINE.md`).

Raw per-run JSON:

```json
{json.dumps({str(k): v for k, v in results.items()}, indent=2)}
```
""")
    print(json.dumps({
        "low_cpus": args.low, "high_cpus": args.high,
        "low_urls_per_sec": lo["urls_per_sec"],
        "high_urls_per_sec": hi["urls_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "report": path,
    }))


if __name__ == "__main__":
    main()
