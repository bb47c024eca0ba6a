"""Per-host politeness scheduling (SURVEY §2 RL1/RL2, J2).

The reference's sliding-window limiter
(/root/reference/app/services/rate_limiter.py:57-150) admits ≤ ``limit``
requests per host per ``window_s`` seconds and sleeps otherwise — it
delays, it never reorders (wait_if_needed, rate_limiter.py:139-150), so
crawl ORDER is untouched; only timing is. The batch mapping therefore
assigns each admitted URL a deterministic *virtual fetch time* instead of
sleeping:

    rn                 = row_number() over (partition by host
                                            order by priority, discovery_seq)
    virtual_fetch_time = round_epoch
                         + greatest(floor((rn-1)/limit) * window_s,
                                    (rn-1) * crawl_delay_s)

which reproduces the limiter's admission schedule exactly (per host FIFO
in discovery order — the reference's single consumer loop guarantees the
same) and satisfies the politeness invariant: at most ``limit`` virtual
fetches per host per window, with robots crawl-delay honored as a minimum
gap. Per-host limits come from a broadcast join with the tiny
``host_policy`` dimension (J2, rate_limiter.py:53-55 →
``coalesce(custom, default)``).

Deferral mode (``budget_rounds``): optionally admit only the first
``budget_rounds × limit`` rows per host and leave the rest in the
frontier for the next scheduling round — they keep their original
``discovery_seq``, so total order is preserved (SURVEY §2.5).

Skew note (north rule): the window ranks one partition per host — hot
hosts make hot partitions. ``schedule_round`` therefore repartitions by
``xxhash64(host)`` first so hosts spread uniformly over shuffle
partitions; within one host the rank is a linear scan. AQE's skew-join
handling covers the fetch join that follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_host_policy(
    batch: DataFrame,
    policy: DataFrame | None,
    default_limit: int,
    default_window_s: int,
) -> DataFrame:
    """J2: broadcast-join per-host policy; coalesce custom → default."""
    if policy is None:
        return (
            batch.withColumn("rate_limit", F.lit(default_limit))
            .withColumn("window_s", F.lit(default_window_s))
            .withColumn("crawl_delay_s", F.lit(0.0))
            .withColumn("disallow_prefixes", F.array().cast("array<string>"))
        )
    pol = policy.select(
        "host",
        F.col("rate_limit").alias("_pol_limit"),
        F.col("window_s").alias("_pol_window"),
        F.col("crawl_delay_s").alias("_pol_delay"),
        F.col("disallow_prefixes").alias("_pol_disallow"),
    )
    return (
        batch.join(F.broadcast(pol), "host", "left")
        .withColumn("rate_limit", F.coalesce(F.col("_pol_limit"), F.lit(default_limit)))
        .withColumn("window_s", F.coalesce(F.col("_pol_window"), F.lit(default_window_s)))
        .withColumn("crawl_delay_s", F.coalesce(F.col("_pol_delay"), F.lit(0.0)))
        .withColumn(
            "disallow_prefixes",
            F.coalesce(F.col("_pol_disallow"), F.array().cast("array<string>")),
        )
        .drop("_pol_limit", "_pol_window", "_pol_delay", "_pol_disallow")
    )


def schedule_round(
    batch: DataFrame,
    policy: DataFrame | None,
    *,
    default_limit: int = 10,
    default_window_s: int = 60,
    round_epoch: float = 0.0,
    budget_rounds: int | None = None,
    priority_col: str = "depth",
    shuffle_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """RL1: returns (admitted, deferred).

    ``admitted`` gains ``host_rank`` and ``virtual_fetch_time``;
    ``deferred`` is the over-budget remainder (empty when
    ``budget_rounds`` is None) with scheduling columns dropped so it can
    re-enter the frontier unchanged.
    """
    b = with_host_policy(batch, policy, default_limit, default_window_s)
    if shuffle_partitions:
        b = b.repartition(shuffle_partitions, F.xxhash64("host"))

    w = Window.partitionBy("host").orderBy(priority_col, "discovery_seq")
    b = b.withColumn("host_rank", F.row_number().over(w).cast("long"))

    window_slot = F.floor((F.col("host_rank") - 1) / F.col("rate_limit")).cast("double")
    vtime = F.lit(float(round_epoch)) + F.greatest(
        window_slot * F.col("window_s").cast("double"),
        (F.col("host_rank") - 1).cast("double") * F.col("crawl_delay_s"),
    )
    b = b.withColumn("virtual_fetch_time", vtime)

    if budget_rounds is None:
        return b, b.limit(0)
    cap = F.col("rate_limit").cast("long") * int(budget_rounds)
    admitted = b.filter(F.col("host_rank") <= cap)
    sched_cols = [
        "host_rank", "virtual_fetch_time", "rate_limit", "window_s",
        "crawl_delay_s", "disallow_prefixes",
    ]
    deferred = b.filter(F.col("host_rank") > cap).drop(*sched_cols)
    return admitted, deferred


def domain_stats(scheduled: DataFrame) -> DataFrame:
    """A4: per-host limit / current / remaining
    (rate_limiter.py:152-173), over the latest scheduled window."""
    return (
        scheduled.groupBy("host")
        .agg(
            F.first("rate_limit").cast("long").alias("limit"),
            F.sum(
                (F.col("host_rank") <= F.col("rate_limit")).cast("long")
            ).alias("current"),
        )
        .withColumn(
            "remaining",
            F.greatest(F.lit(0).cast("long"), F.col("limit") - F.col("current")),
        )
    )
