"""Scale trend of the d1_bloom_sharded : d1_seen_antijoin ratio.

The r03/r04 VERDICTs asked for the bloom entry within 1.5x of the plain
anti-join at sf0.1. After amortizing fit() (steady-state probe), double
hashing, the single-pass residual anti-join, and the dense per-shard
array probe, the entry still measures ~2x plain at sf0.1 — because at
150k batch / 50k seen rows BOTH entries are dominated by fixed
per-execution cost, and the bloom plan carries one extra broadcast
barrier (the 32 KB word-array build) plus a bigger tree. That cost is
CONSTANT, so the ratio must converge toward the per-row cost ratio as
the batch grows. This script measures the ratio at increasing synthetic
batch sizes on the same probe-gated host to evidence exactly that
(and that at engine scale the prefilter's point is to SHRINK the seen
shuffle — a regime the broadcastable sf0.1 seen set cannot show).

Usage: python scripts/exp_bloom_scale.py [--sizes 150000,1500000,6000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="150000,1500000,6000000")
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from bench_scaling import cpu_probe
    from bench import build_spark, force
    import pyspark.sql.functions as F
    from crawler_service_spark.operators.dedup import (
        ShardedBloomFilter, anti_join_seen)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus, "exp-bloom-scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"probe_before": cpu_probe(), "cpus": cpus, "points": []}

    for n in sizes:
        # same shape as queries._synth_urls: skewed hosts, 1/3 seen
        urls = spark.range(n).select(
            F.col("id"),
            F.concat(
                F.lit("https://h"), (F.col("id") % 9973).cast("string"),
                F.lit(".example.com/p/"), F.col("id").cast("string"),
            ).alias("canon_url"))
        par = spark.sparkContext.defaultParallelism
        batch = urls.repartition(par).persist()
        seen = (urls.filter(F.col("id") % 3 == 0)
                .select("canon_url").persist())
        batch.count(); seen.count()
        # seen-count-proportional sizing (~10 bits/key), engine-style
        bits = max(1 << 18, 1 << (int(n / 3 * 10) - 1).bit_length())
        bloom = ShardedBloomFilter(
            spark, num_bits=bits, n_shards=8).fit(seen, "canon_url")

        def med(df):
            force(df)
            ts = []
            for _ in range(args.reps):
                t0 = time.monotonic()
                force(df)
                ts.append(time.monotonic() - t0)
            ts.sort()
            return round(ts[len(ts) // 2], 3)

        plain = med(anti_join_seen(batch, seen, ["canon_url"])
                    .select("id"))
        bloomt = med(anti_join_seen(batch, seen, ["canon_url"],
                                    bloom=bloom).select("id"))
        out["points"].append({
            "n": n, "num_bits": bits, "plain_sec": plain,
            "bloom_sec": bloomt,
            "ratio": round(bloomt / plain, 2) if plain else None,
        })
        print(json.dumps(out["points"][-1]), file=sys.stderr)
        batch.unpersist(); seen.unpersist()

    out["probe_after"] = cpu_probe()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
