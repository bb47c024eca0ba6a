"""A/B: minhash lanes — 4 md5s per shingle (shipped) vs 1 md5 sliced 4 ways.

Variant A (shipped): mh_s = array_min(transform(shingles, sh -> md5(sh || '#s')))
  — one md5 PER (shingle, seed): 4x the hashing work.
Variant B (two-step): _hs = transform(shingles, sh -> md5(sh)); mh_k =
  array_min(transform(_hs, h -> substring(h, 1+8k, 8))) — one md5 per
  shingle, 128-bit digest sliced into four 32-bit lanes (standard
  wide-hash slicing). Relies on CollapseProject NOT inlining the
  expensive _hs producer into 4 consumers; verified by counting md5
  nodes in the optimized plan.
Variant C (bind-once lambda): element_at(transform(array(<hs>), hs ->
  transform(sequence(0,3), k -> array_min(...))), 1) — single-expression
  form immune to projection collapse.

Run: python scripts/exp_minhash_lanes.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

INNER = ("transform(sequence(1, greatest(1, length(text)-7)),"
         " i -> md5(substring(text, i, 8)))")


def variant_a(doc):
    cols = [
        F.expr(
            "array_min(transform(sequence(1, greatest(1, length(text)-7)),"
            f" i -> md5(concat(substring(text, i, 8), '#{s}'))))"
        ).alias(f"mh{s}")
        for s in range(4)
    ]
    return doc.select("doc_id", *cols)


def variant_b(doc):
    hs = doc.select("doc_id", F.expr(INNER).alias("_hs"))
    cols = [
        F.expr(f"array_min(transform(_hs, h -> substring(h, {1 + 8 * k}, 8)))").alias(f"mh{k}")
        for k in range(4)
    ]
    return hs.select("doc_id", *cols)


def variant_c(doc):
    expr = (
        f"element_at(transform(array({INNER}), hs -> "
        "transform(sequence(0, 3), k -> "
        "array_min(transform(hs, h -> substring(h, cast(1 + 8 * k as int), 8))))), 1)"
    )
    sig = doc.select("doc_id", F.expr(expr).alias("_mhs"))
    return sig.select(
        "doc_id", *[F.element_at("_mhs", k + 1).alias(f"mh{k}") for k in range(4)]
    )


def md5_count(df):
    return df._jdf.queryExecution().optimizedPlan().toString().count("md5")


def time_it(df, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("exp_minhash_lanes")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    doc = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    doc.count()  # warm the scan

    a, b, c = variant_a(doc), variant_b(doc), variant_c(doc)
    print("md5 nodes in optimized plan: A=%d B=%d C=%d" % (md5_count(a), md5_count(b), md5_count(c)))

    # B and C must agree exactly (same hash scheme)
    mismatch = b.exceptAll(c).count() + c.exceptAll(b).count()
    print("B vs C mismatched rows:", mismatch)

    for name, df in (("A_shipped", a), ("B_twostep", b), ("C_bindonce", c)):
        print(f"{name}: best-of-{reps} {time_it(df, reps):.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
