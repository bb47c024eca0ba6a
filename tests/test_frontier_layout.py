"""Bucket-sorted frontier snapshots (CrawlConfig.frontier_layout).

The layout is a pure physical-plan property: crawl results must be
row-identical between "bucketsort" (default) and "flat", the rank over a
layout snapshot must plan with no payload exchange and no sort, and a
resume in a session whose catalog lost the table must re-register it
from the files (the Iceberg-spec analog).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from crawler_service_spark.config import CrawlConfig
from crawler_service_spark.engine import CrawlEngine, fetch_order
from crawler_service_spark.sources.corpus import build_seeds_df, build_store_df


def _crawl(spark, tmp_path, layout, sub):
    cfg = CrawlConfig(max_depth=2, follow_links=True, frontier_layout=layout,
                      shuffle_partitions=8)
    eng = CrawlEngine(spark, cfg, build_store_df(spark, 120, 5),
                      checkpoint_dir=str(tmp_path / sub))
    return eng.crawl(build_seeds_df(spark, 120, 5, 3))


def test_layout_matches_flat(spark, tmp_path):
    t_b = _crawl(spark, tmp_path, "bucketsort", "b")
    t_f = _crawl(spark, tmp_path, "flat", "f")
    cols = ["task_id", "canon_url", "depth", "discovery_seq", "fetch_seq",
            "host_rank", "virtual_fetch_time", "title", "text_content"]
    rows_b = {tuple(r) for r in fetch_order(t_b.pages).select(cols).collect()}
    rows_f = {tuple(r) for r in fetch_order(t_f.pages).select(cols).collect()}
    assert rows_b == rows_f
    assert "_salt" not in t_b.pages.columns


def test_layout_frontier_scan_rank_plan(spark, tmp_path):
    """Over the bucket-sorted round-0 frontier snapshot, the presalted
    rank's payload side must contain neither Exchange nor Sort — the
    layout carries both."""
    cfg = CrawlConfig(max_depth=1, follow_links=True, shuffle_partitions=8)
    eng = CrawlEngine(spark, cfg, build_store_df(spark, 60, 3),
                      checkpoint_dir=str(tmp_path / "p"))
    eng.crawl(build_seeds_df(spark, 60, 3, 2))
    snap = eng._read_frontier(0)
    from crawler_service_spark.operators.politeness import rank_presalted
    ranked = rank_presalted(snap, "depth")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    payload = plan.split("BroadcastExchange")[0]
    assert "Exchange" not in payload, payload
    assert "Sort" not in payload, payload


def test_layout_resume_reregisters_catalog(spark, tmp_path):
    """Kill-and-resume with the catalog wiped: read_table_bucketed must
    recreate the external bucketed table over the surviving files and the
    resumed crawl must complete identically to an uninterrupted one."""
    cfg = CrawlConfig(max_depth=2, follow_links=True, shuffle_partitions=8)
    store = build_store_df(spark, 120, 5)
    seeds = build_seeds_df(spark, 120, 5, 3)

    full = CrawlEngine(spark, cfg, store,
                       checkpoint_dir=str(tmp_path / "full")).crawl(seeds)
    want = {tuple(r) for r in fetch_order(full.pages)
            .select("task_id", "canon_url", "fetch_seq").collect()}

    # interrupted run: max_rounds=1 commits round 0 + frontier 1
    eng1 = CrawlEngine(spark, cfg, store,
                       checkpoint_dir=str(tmp_path / "part"), max_rounds=1)
    eng1.crawl(seeds)
    # simulate a fresh session: drop every snap_* catalog entry
    for t in spark.catalog.listTables():
        if t.name.startswith("snap_"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    eng2 = CrawlEngine(spark, cfg, store, checkpoint_dir=str(tmp_path / "part"))
    resumed = eng2.crawl(resume=True)
    got = {tuple(r) for r in fetch_order(resumed.pages)
           .select("task_id", "canon_url", "fetch_seq").collect()}
    assert got == want


def test_bucketize_rejects_poisoned_and_duplicate_files(tmp_path):
    """The rename-register layout's invariants fail LOUDLY (r03 VERDICT
    item 4): a data file that doesn't match Spark's part-file naming, a
    bucket id >= the declared count, or two files for one bucket would
    each make the registered bucketed scan silently misgroup/skip rows."""
    import pytest

    from crawler_service_spark.sources.storage import SnapshotStore

    uuid = "0123abcd-89ab-cdef-0123-456789abcdef"

    def mk(files):
        d = tmp_path / f"case{mk.n}"
        mk.n += 1
        d.mkdir()
        for f in files:
            (d / f).write_bytes(b"x")
        return str(d)
    mk.n = 0

    # clean case: all files match, ids unique and < count
    ok = mk([f"part-{i:05d}-{uuid}-c000.lz4.parquet" for i in range(4)]
            + ["_SUCCESS"])
    SnapshotStore._bucketize_files(ok, 4)
    import os
    assert sorted(os.listdir(ok)) == sorted(
        [f"part-{i:05d}-{uuid}_{i:05d}.c000.lz4.parquet" for i in range(4)]
        + ["_SUCCESS"])

    # poisoned: a stray .parquet that matches nothing
    with pytest.raises(ValueError, match="does not match"):
        SnapshotStore._bucketize_files(
            mk([f"part-00000-{uuid}-c000.parquet", "extra.parquet"]), 4)

    # bucket id beyond the declared count
    with pytest.raises(ValueError, match="bucket id 7"):
        SnapshotStore._bucketize_files(
            mk([f"part-00007-{uuid}-c000.parquet"]), 4)

    # two files for one bucket (e.g. a speculative-retry leftover)
    with pytest.raises(ValueError, match="duplicate"):
        SnapshotStore._bucketize_files(
            mk([f"part-00001-{uuid}-c000.parquet",
                f"part-00001-{uuid.replace('0123a', 'ffffa')}-c000.parquet"]),
            4)


def test_layout_checkpoint_dir_with_apostrophe(spark, tmp_path):
    """LOCATION literals are escaped: a checkpoint dir containing an
    apostrophe (legal in POSIX paths, common in macOS user dirs) must
    not break the bucketed write/read DDL."""
    t = _crawl(spark, tmp_path, "bucketsort", "bob's crawl")
    assert fetch_order(t.pages).count() > 0
