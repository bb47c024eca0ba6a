"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship multi-round crawl (frontier → politeness →
fetch → extract → dedup loop) over a deterministic corpus derived from
the sf0.001 documents table; ``queries``/``oracle_sql`` cover the
operator inventory from SURVEY.md §2 plus the training-data pipeline ops
(dedup family, similarity search, text analysis), each checked against
DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: depth-2 multi-seed crawl; returns the ordered pages table."""
    from pyspark.sql import functions as F

    from crawler_service_spark.config import CrawlConfig
    from crawler_service_spark.engine import CrawlEngine, fetch_order
    from crawler_service_spark.sources.corpus import (
        build_policy_df,
        build_seeds_df,
        build_store_df,
    )

    sf_dir = "/root/testdata/sf0.001"
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .select("text")
        .limit(64)
        .collect()
    ]
    # sanitize: span texts must survive the HTML round trip verbatim
    texts = ["".join(c for c in t if c.isalnum() or c == " ")[:160] for t in texts]

    n_docs, n_hosts, n_seeds = 400, 10, 6
    cfg = CrawlConfig(max_depth=2, follow_links=True)
    store = build_store_df(spark, n_docs, n_hosts, texts)
    seeds = build_seeds_df(spark, n_docs, n_hosts, n_seeds)
    policy = build_policy_df(spark, n_hosts)

    ck = tempfile.mkdtemp(prefix="flagship_ck_")
    engine = CrawlEngine(spark, cfg, store, checkpoint_dir=ck, policy=policy)
    tables = engine.crawl(seeds)
    return fetch_order(tables.pages).select(
        "task_id",
        "fetch_seq",
        "depth",
        "url",
        "canon_url",
        "host",
        "effective_status",
        "retry_attempts",
        "is_error",
        "title",
        "text_content",
        "spans",
        F.col("virtual_fetch_time"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawler_service_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from crawler_service_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
