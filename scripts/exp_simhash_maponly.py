"""A/B: SimHash — explode+groupBy votes (shipped) vs map-only aggregate.

Variant A (shipped): explode tokens -> md5 per row -> 16 vote columns ->
  groupBy(doc_id).sum x16. Cost: #tokens-row blow-up + a full shuffle on
  doc_id.
Variant B (map-only): one higher-order `aggregate` per document folds the
  token hashes into a 16-slot vote array — zero explode, ZERO shuffle.
  One md5 per token either way (hashes materialized by an inner
  transform before the fold).

Identical semantics: vote = +1 if hex digit k of md5(token) >= 8 else
-1; bit k set iff sum >= 0 (empty docs: all-zero votes -> all bits).

Run: python scripts/exp_simhash_maponly.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def variant_a(doc):
    tok = doc.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("token"),
    ).withColumn("h", F.md5("token"))
    votes = [
        F.sum(
            F.when(
                F.expr(f"instr('0123456789abcdef', substring(h, {k + 1}, 1))") - 1 >= 8,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"v{k}")
        for k in range(16)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    bits = sum(
        [F.when(F.col(f"v{k}") >= 0, F.lit(2**k)).otherwise(F.lit(0)) for k in range(16)],
        F.lit(0),
    )
    return agg.select("doc_id", bits.cast("long").alias("simhash"))


VOTES = (
    "aggregate("
    "  transform(filter(split(text, ' '), x -> x <> ''), t -> md5(t)),"
    "  array_repeat(0, 16),"
    "  (acc, h) -> zip_with(acc, sequence(1, 16), (a, i) ->"
    "    a + IF(instr('0123456789abcdef', substring(h, i, 1)) - 1 >= 8, 1, -1))"
    ")"
)
BITS = (
    "aggregate(zip_with(sequence(0, 15), _votes, (k, v) ->"
    " IF(v >= 0, shiftleft(1L, cast(k as int)), 0L)), 0L, (a, b) -> a + b)"
)


def variant_b(doc):
    v = doc.select("doc_id", F.expr(VOTES).alias("_votes"))
    return v.select("doc_id", F.expr(BITS).alias("simhash"))


def time_it(df, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("exp_simhash_maponly")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    doc = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    doc.count()  # warm the scan

    a, b = variant_a(doc), variant_b(doc)
    mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()
    print("A vs B mismatched rows:", mismatch)
    nexch = b._jdf.queryExecution().executedPlan().toString().count("Exchange")
    print("variant B shuffle exchanges:", nexch)

    for name, df in (("A_explode_shuffle", a), ("B_maponly", b)):
        print(f"{name}: best-of-{reps} {time_it(df, reps):.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
