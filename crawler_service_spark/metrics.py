"""Metrics/admin surface (SURVEY §2 M1, A1–A4).

The reference exposes live counters over HTTP (admin stats
/root/reference/app/api/v1/admin.py:112-163, health
/root/reference/app/api/v1/health.py:24-107, per-domain limiter stats
/root/reference/app/services/rate_limiter.py:152-173). A batch engine's
equivalent is a driver-side report assembled from aggregation queries
over the result tables — one action, all hash aggregations, no
``collect()`` of row-level data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_service_spark.engine import CrawlTables, retry_stats


def crawl_summary(pages: DataFrame) -> dict:
    """A1/A2: the reference's CrawlResult envelope counters
    (crawler.py:164-172) plus success rate (crawler.py:126-128)."""
    row = pages.agg(
        F.count("*").alias("total_pages"),
        F.sum((~F.col("is_error")).cast("long")).alias("successful_pages"),
        F.sum(F.col("is_error").cast("long")).alias("failed_pages"),
        F.avg((F.col("effective_status") < 400).cast("int")).alias("success_rate"),
        F.countDistinct("host").alias("distinct_hosts"),
        F.max("depth").alias("max_depth_reached"),
    ).collect()[0]
    d = row.asDict()
    d["success_rate"] = round(float(d["success_rate"] or 0.0), 6)
    # `or 0`: sum()/max() aggregates are NULL on an empty pages table
    return {k: (int(v or 0) if k != "success_rate" else v) for k, v in d.items()}


def per_host_stats(pages: DataFrame, default_limit: int = 10) -> DataFrame:
    """A4: per-host fetch counts + remaining budget in the last window
    (rate_limiter.py:152-173 shape)."""
    return (
        pages.groupBy("host")
        .agg(
            F.count("*").alias("fetched"),
            F.sum(F.col("is_error").cast("long")).alias("errors"),
            F.max("virtual_fetch_time").alias("last_fetch_time"),
        )
        .withColumn(
            "remaining_in_window",
            F.greatest(
                F.lit(0).cast("long"),
                F.lit(default_limit) - F.col("fetched"),
            ),
        )
    )


def error_breakdown(pages: DataFrame) -> DataFrame:
    """Structured-error rollup by type (R1 outcomes)."""
    return (
        pages.filter(F.col("is_error"))
        .groupBy(F.col("error.error_type").alias("error_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("retry_attempts").alias("total_retry_attempts"),
        )
    )


def report(tables: CrawlTables, default_limit: int = 10) -> dict:
    """The full admin report: summary + retry counters + per-round
    frontier sizes (lineage counters) + top hosts."""
    top_hosts = [
        r.asDict()
        for r in per_host_stats(tables.pages, default_limit)
        .orderBy(F.desc("fetched"), F.asc("host"))
        .limit(10)
        .collect()
    ]
    errors = [r.asDict() for r in error_breakdown(tables.pages).collect()]
    return {
        "summary": crawl_summary(tables.pages),
        "retry_stats": retry_stats(tables.pages),
        "rounds": tables.round_counters,
        "top_hosts": top_hosts,
        "errors": errors,
        "seen_size": int(tables.seen.count()) if tables.seen is not None else 0,
    }
