"""A/B: spark.io.compression.codec (shuffle/broadcast codec) lz4 vs zstd
on the schedule job at both parallelism levels.

Hypothesis (from exp_eventlog_sched decomposition): the c4→c16 scaling
loss is DRAM-bandwidth contention in the shuffle/sort stages (per-task
CPU time inflates 1.2–4× at 16 cores with zero driver gaps / GC / spill).
A denser shuffle codec trades bytes (the non-scaling resource) for
compression CPU (the scaling one), so it should move the RATIO even if
absolute times shift. io codec is a JVM-static conf → subprocess matrix,
levels and codecs interleaved, spin probe recorded per run.

    python scripts/exp_io_codec.py [--n 16000000] [--runs 2]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from bench_scaling import cpu_probe  # noqa: E402


def run_once(cpus: int, n: int, codec: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_EXTRA_CONF=f"spark.io.compression.codec={codec}")
    p0 = cpu_probe()
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
         os.path.join(REPO, "bench.py"), "--job", "schedule",
         "--n-urls", str(n), "--reps", "2"],
        env=env, capture_output=True, text=True, check=True, cwd=REPO)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    return {"cpus": cpus, "codec": codec, "sec": rec["sec"],
            "urls_per_sec": rec["urls_per_sec"], "probe": round(p0, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16_000_000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    recs = []
    for i in range(args.runs):
        for codec in ("lz4", "zstd"):
            for cpus in (4, 16):
                r = run_once(cpus, args.n, codec)
                recs.append(r)
                print(json.dumps(r), flush=True)
    for codec in ("lz4", "zstd"):
        lo = [r["sec"] for r in recs if r["codec"] == codec and r["cpus"] == 4]
        hi = [r["sec"] for r in recs if r["codec"] == codec and r["cpus"] == 16]
        if lo and hi:
            eff = (min(lo) / min(hi)) / 4
            print(f"{codec}: c4 best {min(lo):.1f}s c16 best {min(hi):.1f}s "
                  f"eff {eff:.3f}")


if __name__ == "__main__":
    main()
