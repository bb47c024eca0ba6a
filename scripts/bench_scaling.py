"""Two-parallelism scaling evidence for the north rule (BASELINE.json).

The rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors; no real cluster exists in this sandbox, so (per BASELINE.md)
the proxy is the SAME north-rule job — canonicalize + dedup + schedule a
common-host-skewed synthetic frontier — at local[8] vs local[32] on
identical input, each in a fresh subprocess (clean JVM, no warm caches
shared between runs). Writes BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [--n-urls N] [--runs K]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, n_urls: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--job", "schedule",
         "--n-urls", str(n_urls)],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, default=2_000_000)
    ap.add_argument("--runs", type=int, default=3, help="best-of-K per level")
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    results = {}
    for cpus in (args.low, args.high):
        runs = [run_once(cpus, args.n_urls) for _ in range(args.runs)]
        best = max(runs, key=lambda r: r["urls_per_sec"])
        results[cpus] = {"best": best, "all": runs}
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

Job: the north-rule frontier pipeline (`bench.py --job schedule`):
pandas-UDF canonicalization → in-batch first-occurrence dedup →
exact anti-join vs a cached URL-seen set → per-host politeness
rank + virtual-schedule, forced end-to-end through a noop sink.
Input: {args.n_urls:,} synthetic URLs, Zipf(1)-skewed over 10,000 hosts
(identical deterministic input at both levels). Each level runs in a
fresh JVM subprocess; best of {args.runs} runs reported.

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
