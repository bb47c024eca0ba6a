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


def adaptive_concurrency_log(
    pages: DataFrame,
    start: int = 30,
    burst_limit: int = 50,
    gradual_increase: bool = True,
) -> DataFrame:
    """C2 (SURVEY §2): the reference's adaptive-concurrency adjustments
    (crawler.py:511-531, invoked at crawler.py:147-151 every 20 requests
    and once more at crawl end, crawler.py:158-162) re-derived as LOGGED
    METRICS — a batch engine has no semaphore to resize, so the would-be
    ±5/−3 adjustments are emitted per checkpoint instead.

    Truth table per checkpoint (cumulative success_rate = successful /
    total so far; success = effective_status < 400):
      * total < 10 or not gradual_increase → no change
      * rate > 0.9 and cur < burst        → cur = min(cur + 5, burst)
      * rate < 0.7 and cur > 5            → cur = max(cur − 3, 5)
    Checkpoints fire at every total ≡ 0 (mod 20) in fetch order and once
    at the end — the final one REPEATS even when total % 20 == 0, exactly
    as the reference's loop + final call do.

    Distributed shape: per-(task, 20-block) partial counts (hash
    aggregate), then the sequential clamped walk runs per task over
    total/20 rows inside applyInPandas — driver never sees row-level
    data.
    """
    import pandas as pd

    from crawler_service_spark.engine import fetch_order

    blocks = (
        fetch_order(pages)
        .withColumn("_blk", (F.col("fetch_seq") / 20).cast("long"))
        .groupBy("task_id", "_blk")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("effective_status") < 400).cast("long")).alias("n_ok"),
        )
    )

    out_schema = (
        "task_id string, checkpoint long, total_requests long, "
        "success_rate double, concurrency_before long, "
        "concurrency_after long, changed boolean"
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_blk")
        task = pdf["task_id"].iloc[0]
        cur = start
        total = ok = 0
        rows = []

        def adjust(rate: float, total: int) -> tuple[int, int]:
            nonlocal cur
            before = cur
            if gradual_increase and total >= 10:
                if rate > 0.9 and cur < burst_limit:
                    cur = min(cur + 5, burst_limit)
                elif rate < 0.7 and cur > 5:
                    cur = max(cur - 3, 5)
            return before, cur

        ckpt = 0
        for _, r in pdf.iterrows():
            total += int(r["n"])
            ok += int(r["n_ok"])
            if total % 20 == 0:        # complete block → in-loop checkpoint
                rate = ok / total
                before, after = adjust(rate, total)
                rows.append((task, ckpt, total, round(rate, 6), before,
                             after, after != before))
                ckpt += 1
        if total > 0:                  # final adjustment (always fires)
            rate = ok / total
            before, after = adjust(rate, total)
            rows.append((task, ckpt, total, round(rate, 6), before, after,
                         after != before))
        return pd.DataFrame(rows, columns=[
            "task_id", "checkpoint", "total_requests", "success_rate",
            "concurrency_before", "concurrency_after", "changed"])

    return blocks.groupBy("task_id").applyInPandas(walk, schema=out_schema)


def report(tables: CrawlTables, default_limit: int = 10, cfg=None) -> dict:
    """The full admin report: summary + retry counters + per-round
    frontier sizes (lineage counters) + top hosts. With ``cfg``, echoes
    the request-config surface (custom_headers/timeout/max_depth…) the
    way admin.py:20-41 echoes settings."""
    top_hosts = [
        r.asDict()
        for r in per_host_stats(tables.pages, default_limit)
        .orderBy(F.desc("fetched"), F.asc("host"))
        .limit(10)
        .collect()
    ]
    errors = [r.asDict() for r in error_breakdown(tables.pages).collect()]
    out = {
        "summary": crawl_summary(tables.pages),
        "retry_stats": retry_stats(tables.pages),
        "rounds": tables.round_counters,
        "top_hosts": top_hosts,
        "errors": errors,
        "seen_size": int(tables.seen.count()) if tables.seen is not None else 0,
    }
    if cfg is not None:
        out["config"] = {
            "max_depth": cfg.max_depth,
            "follow_links": cfg.follow_links,
            "custom_headers": dict(cfg.custom_headers),
            "timeout": cfg.timeout,
            "max_retries": cfg.max_retries,
            "default_rate_limit": cfg.default_rate_limit,
            "rate_limit_window_s": cfg.rate_limit_window_s,
            "budget_rounds": cfg.budget_rounds,
        }
    return out
