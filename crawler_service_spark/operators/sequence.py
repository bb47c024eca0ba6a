"""Deterministic dense discovery-sequence assignment (SURVEY §2 O1).

The reference's BFS deque (/root/reference/app/services/crawler.py:95-146)
yields a total fetch order: seed first, then each fetched page's surviving
links in page order, level by level. The order key of a new link is
``(parent_seq, link_pos)`` — a pure function of data, never of partition
or task identity, which is what makes the crawl-order equality contract
well-defined under parallelism.

``assign_dense_seq`` turns that key into a dense 0-based sequence WITHOUT
a single-partition global window: because ``parent_seq`` is dense within a
round's occupied range ``[base, n_parents)``,
``bucket = (parent_seq - base) // ceil((n_parents - base)/buckets)``
is an order-preserving partitioner computed from the data itself (no
sampling, no spark_partition_id — both would break run-to-run
determinism). Rank within bucket via a window, then add per-bucket offsets
(a tiny collect of ≤ `buckets` rows). This is the two-level scheme from
SURVEY §7.5; it scales to 10^10-row rounds since no executor ever sees
more than one bucket's rows in a single window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_seq(
    df: DataFrame,
    parent_seq_col: str,
    pos_col: str,
    n_parents: int,
    n_buckets: int = 64,
    out_col: str = "discovery_seq",
    base: int = 0,
) -> DataFrame:
    """Dense 0-based rank of rows ordered by (parent_seq, pos).

    ``[base, n_parents)`` must cover the ``parent_seq`` values — the
    engine passes the round frontier's (min, max+1). Bucketing over the
    OCCUPIED range matters: ``parent_seq`` is cumulative across rounds,
    so bucketing over ``[0, n_parents)`` would land every late round's
    parents (spanning only the top slice of that range) in 1-2 buckets
    and serialize the rank window on one executor.
    """
    span = n_parents - base
    if span <= 0:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    bucket_width = max(1, -(-span // n_buckets))  # ceil
    bucketed = df.withColumn(
        "_seq_bucket",
        ((F.col(parent_seq_col) - F.lit(base)) / bucket_width).cast("long"),
    )
    # per-bucket sizes -> exclusive prefix-sum offsets (driver-side; <= n_buckets rows)
    sizes = {
        r["_seq_bucket"]: r["cnt"]
        for r in bucketed.groupBy("_seq_bucket").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for b in sorted(sizes):
        offsets[b] = running
        running += sizes[b]
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ).cast("map<bigint,bigint>"),
        F.col("_seq_bucket"),
    ) if offsets else F.lit(0).cast("long")

    w = Window.partitionBy("_seq_bucket").orderBy(parent_seq_col, pos_col)
    return (
        bucketed.withColumn("_local_rank", F.row_number().over(w).cast("long"))
        .withColumn(out_col, offset_expr + F.col("_local_rank") - 1)
        .drop("_seq_bucket", "_local_rank")
    )
