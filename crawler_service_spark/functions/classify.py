"""Error classification + deterministic retry simulation (SURVEY §2 R1/R2).

Native column expressions (whole-stage-codegen friendly — no Python in the
hot path) reproducing the reference's classification truth table
(/root/reference/app/services/crawler.py:533-552) and retry loop outcome
(crawler.py:201-415) over the corpus-declared failure schedule:

* a doc whose final ``status_code`` is permanent 4xx (≠429) errors
  immediately, ``retry_attempts = 0`` (crawler.py:230-243);
* a transient final status (5xx or 429) exhausts retries:
  ``retry_attempts = max_retries`` and an error page (crawler.py:257-272);
* a 200 doc with ``fail_times`` declared transient failures succeeds after
  ``fail_times`` retries if ``fail_times <= max_retries``, else never
  succeeds (error page with the transient-fail status);
* a URL absent from the content store behaves as an HTTP 404 (permanent).

Backoff delay (crawler.py:554-569): ``min(cap, base * mult^(n-1))``;
jitter is dropped — nondeterministic, excluded from every contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_service_spark.config import TRANSIENT_FAIL_STATUS, CrawlConfig


def error_type_col(status: Column) -> Column:
    """R1: 'transient' | 'permanent' | 'unknown' from an HTTP status."""
    return (
        F.when(status.between(500, 599) | (status == 429), F.lit("transient"))
        .when(status.between(400, 499), F.lit("permanent"))
        .otherwise(F.lit("unknown"))
    )


def is_retryable_col(status: Column) -> Column:
    """R1: retryable iff transient-by-status (crawler.py:543-549)."""
    return status.between(500, 599) | (status == 429)


def retry_delay_col(attempt: Column, cfg: CrawlConfig) -> Column:
    """R2 backoff: ``min(cap, base * mult^(attempt-1))``, 0 for attempt<=0."""
    delay = F.lit(cfg.retry_delay_base) * F.pow(
        F.lit(cfg.retry_backoff_multiplier), attempt.cast("double") - 1.0
    )
    return F.when(attempt <= 0, F.lit(0.0)).otherwise(
        F.least(F.lit(cfg.retry_delay_max), delay)
    )


def resolve_fetch_outcome(df, cfg: CrawlConfig):
    """Append effective_status / retry_attempts / error columns to a
    fetch-joined batch.

    Expects columns ``status_code`` (nullable int; null = URL not in the
    content store) and ``fail_times`` (nullable int).
    """
    status = F.coalesce(F.col("status_code"), F.lit(404))
    fails = F.coalesce(F.col("fail_times"), F.lit(0))
    mr = F.lit(cfg.max_retries)

    is_transient_final = status.between(500, 599) | (status == 429)
    is_permanent = status.between(400, 499) & (status != 429)
    succeeds = (status < 400) & (fails <= mr)

    effective_status = (
        F.when(is_permanent | is_transient_final, status)
        .when(succeeds, status)
        .otherwise(F.lit(TRANSIENT_FAIL_STATUS))  # ran out of retries
    )
    retry_attempts = (
        F.when(is_permanent, F.lit(0))
        .when(is_transient_final, mr)
        .when(succeeds, F.least(fails, mr))
        .otherwise(mr)
    )
    is_error = ~succeeds

    error_struct = F.when(
        is_error,
        F.struct(
            error_type_col(effective_status).alias("error_type"),
            effective_status.alias("status_code"),
            F.format_string("HTTP %d", effective_status).alias("message"),
            F.col("url").alias("url"),
            retry_attempts.alias("retry_attempts"),
            mr.alias("max_retries"),
            # crawler.py:584: retryable-and-attempts-remaining
            (is_retryable_col(effective_status) & (retry_attempts < mr)).alias(
                "is_retryable"
            ),
        ),
    )

    return (
        df.withColumn("effective_status", effective_status)
        .withColumn("retry_attempts", retry_attempts)
        .withColumn("is_error", is_error)
        .withColumn("error", error_struct)
    )
