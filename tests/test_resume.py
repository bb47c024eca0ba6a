"""Checkpoint/resume contract (SURVEY §5.4, north rule): a crawl killed
after round k and resumed from the snapshot store must produce the
byte-identical final ordering and URL-seen set."""

import tempfile

from crawler_service_spark.config import CrawlConfig
from crawler_service_spark.engine import CrawlEngine, fetch_order
from crawler_service_spark.sources.corpus import (
    build_policy_df,
    build_seeds_df,
    build_store_df,
)

N_DOCS, N_HOSTS, N_SEEDS = 300, 8, 4


def _ordered(tables):
    return [
        (r["task_id"], r["fetch_seq"], r["depth"], r["url"], r["canon_url"],
         r["effective_status"], r["retry_attempts"])
        for r in fetch_order(tables.pages)
        .orderBy("task_id", "fetch_seq")
        .collect()
    ]


def test_interrupt_after_first_round_then_resume(spark):
    cfg = CrawlConfig(max_depth=3, follow_links=True)
    store = build_store_df(spark, N_DOCS, N_HOSTS)
    seeds = build_seeds_df(spark, N_DOCS, N_HOSTS, N_SEEDS)
    policy = build_policy_df(spark, N_HOSTS)

    with tempfile.TemporaryDirectory() as ref_dir:
        full = CrawlEngine(spark, cfg, store, checkpoint_dir=ref_dir,
                           policy=policy).crawl(seeds)
        want = _ordered(full)
        want_seen = {(r["task_id"], r["canon_url"]) for r in full.seen.collect()}

    with tempfile.TemporaryDirectory() as ck:
        # "killed" after round 0: max_rounds=1 stops with the round-1
        # frontier committed but unfetched
        interrupted = CrawlEngine(spark, cfg, store, checkpoint_dir=ck,
                                  policy=policy, max_rounds=1).crawl(seeds)
        assert len(_ordered(interrupted)) < len(want)

        resumed = CrawlEngine(spark, cfg, store, checkpoint_dir=ck,
                              policy=policy).crawl(resume=True)
        assert _ordered(resumed) == want
        got_seen = {(r["task_id"], r["canon_url"]) for r in resumed.seen.collect()}
        assert got_seen == want_seen


def test_resume_of_complete_crawl_is_stable(spark):
    cfg = CrawlConfig(max_depth=1, follow_links=True)
    store = build_store_df(spark, 150, 5)
    seeds = build_seeds_df(spark, 150, 5, 2)
    with tempfile.TemporaryDirectory() as ck:
        first = CrawlEngine(spark, cfg, store, checkpoint_dir=ck).crawl(seeds)
        again = CrawlEngine(spark, cfg, store, checkpoint_dir=ck).crawl(resume=True)
        assert _ordered(first) == _ordered(again)
