"""Metrics/admin report over a real crawl run."""

import tempfile

from crawler_service_spark.config import CrawlConfig
from crawler_service_spark.engine import CrawlEngine
from crawler_service_spark.metrics import report
from crawler_service_spark.sources.corpus import (
    build_policy_df,
    build_seeds_df,
    build_store_df,
)


def test_report_shape(spark):
    cfg = CrawlConfig(max_depth=1, follow_links=True)
    store = build_store_df(spark, 120, 5)
    seeds = build_seeds_df(spark, 120, 5, 2)
    ck = tempfile.mkdtemp(prefix="metrics_ck_")
    eng = CrawlEngine(spark, cfg, store, checkpoint_dir=ck,
                      policy=build_policy_df(spark, 5))
    t = eng.crawl(seeds)
    r = report(t)
    s = r["summary"]
    assert s["total_pages"] == s["successful_pages"] + s["failed_pages"] > 0
    assert 0.0 <= s["success_rate"] <= 1.0
    assert r["seen_size"] == s["total_pages"]  # every fetched page was marked seen
    assert r["rounds"] and r["rounds"][0]["frontier"] >= 2
    # observed metrics (Observation API) ride the snapshot write
    assert r["rounds"][0]["n_pages"] >= 2
    assert sum(rc["n_pages"] for rc in r["rounds"]) == s["total_pages"]
    assert sum(rc["n_errors"] for rc in r["rounds"]) == s["failed_pages"]
    assert r["top_hosts"] and all(h["fetched"] >= 1 for h in r["top_hosts"])
    assert set(r["retry_stats"]) == {
        "total_retries", "successful_retries", "failed_retries",
        "transient_errors", "permanent_errors",
    }
    for e in r["errors"]:
        assert e["error_type"] in ("transient", "permanent", "unknown")
