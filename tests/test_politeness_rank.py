"""Equality pins for the skew-resistant host rank (RL1, north rule).

The salted two-level rank must produce EXACTLY the ranks of the plain
per-host window — including hot hosts (≥ salt_width rows), mixed-priority
hosts (which must fall back to the plain window per the precondition
guard), and the budget-deferral split built on top of the ranks.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawler_service_spark.operators.politeness import (
    schedule_round,
    skew_resistant_host_rank,
)


def _mixed_batch(spark, n=20_000):
    """One hot host (~1/3 of rows), one mixed-priority host (hot-sized
    but must fall back), a ring of cold hosts."""
    return spark.range(n).select(
        F.when(F.col("id") % 3 == 0, "hot.example.com")
        .when(F.col("id") % 7 == 0, "mixed.example.com")
        .otherwise(
            F.concat(F.lit("h"), (F.col("id") % 11).cast("string"),
                     F.lit(".example.com"))
        ).alias("host"),
        F.when(F.col("id") % 7 == 0, (F.col("id") % 2).cast("int"))
        .otherwise(F.lit(0)).cast("int").alias("depth"),
        F.col("id").alias("discovery_seq"),
    )


def test_salted_rank_equals_plain_window(spark):
    b = _mixed_batch(spark)
    ranked = skew_resistant_host_rank(b, "depth", 8, salt_width=1000)
    w = Window.partitionBy("host").orderBy("depth", "discovery_seq")
    ref = b.withColumn("host_rank", F.row_number().over(w).cast("long"))
    got = {tuple(r) for r in ranked.collect()}
    want = {tuple(r) for r in ref.collect()}
    assert got == want
    # column order is part of the operator contract (callers select by
    # name, but unioning code paths must agree)
    assert ranked.columns == b.columns + ["host_rank"]


def test_schedule_round_salted_vs_unsalted_budget_split(spark):
    b = _mixed_batch(spark)
    cols = ["host", "discovery_seq", "host_rank", "virtual_fetch_time"]
    adm_s, def_s = schedule_round(
        b, None, default_limit=5, budget_rounds=2,
        shuffle_partitions=8, salt_width=1000)
    adm_p, def_p = schedule_round(
        b, None, default_limit=5, budget_rounds=2,
        shuffle_partitions=8, salt_width=10 ** 9)  # nothing hot → plain
    assert ({tuple(r) for r in adm_s.select(cols).collect()}
            == {tuple(r) for r in adm_p.select(cols).collect()})
    assert ({tuple(r) for r in def_s.select("host", "discovery_seq").collect()}
            == {tuple(r) for r in def_p.select("host", "discovery_seq").collect()})
