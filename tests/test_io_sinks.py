"""S2/S3 sinks: JSON round trip + simple projection on a real crawl."""

import tempfile

from crawler_service_spark.config import CrawlConfig
from crawler_service_spark.engine import CrawlEngine, fetch_order
from crawler_service_spark.sources.corpus import build_seeds_df, build_store_df
from crawler_service_spark.sources.io import (
    read_pages_json,
    simple_projection,
    write_pages_json,
)


def _crawl(spark):
    cfg = CrawlConfig(max_depth=1, follow_links=True)
    store = build_store_df(spark, 100, 4)
    seeds = build_seeds_df(spark, 100, 4, 2)
    eng = CrawlEngine(spark, cfg, store,
                      checkpoint_dir=tempfile.mkdtemp(prefix="io_ck_"))
    return fetch_order(eng.crawl(seeds).pages)


def test_json_round_trip(spark):
    pages = _crawl(spark).select(
        "task_id", "fetch_seq", "url", "canon_url", "depth",
        "effective_status", "is_error", "title",
    )
    out = tempfile.mkdtemp(prefix="io_json_")
    write_pages_json(pages, out)
    back = read_pages_json(spark, out)
    key = lambda r: (r["task_id"], r["fetch_seq"])
    a = sorted([r.asDict() for r in pages.collect()], key=key)
    b = sorted([r.asDict() for r in back.collect()], key=key)
    for ra, rb in zip(a, b):
        for k, v in ra.items():
            assert rb[k] == v, (k, v, rb[k])


def test_simple_projection_first_page_per_task(spark):
    pages = _crawl(spark)
    simple = {r["task_id"]: r for r in simple_projection(pages).collect()}
    firsts = {r["task_id"]: r for r in pages.filter("fetch_seq = 0").collect()}
    assert set(simple) == set(firsts) and len(simple) == 2
    for tid, r in simple.items():
        assert r["url"] == firsts[tid]["url"]
        assert r["depth"] == 0
