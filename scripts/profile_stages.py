"""Per-stage scaling profile of the north-rule jobs (round/schedule).

Isolates each pipeline stage on PERSISTED input (so a stage's timing is
its own compute + cache read/write, not upstream lineage) and times it
at the current parallelism. Run at two levels in fresh subprocesses to
compare per-stage scaling:

    taskset -c 0-3  python scripts/profile_stages.py --cpus 4  --n 4000000
    taskset -c 0-15 python scripts/profile_stages.py --cpus 16 --n 4000000

Prints one JSON line: {"cpus": N, "n": ..., "stages": {name: sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bench import build_spark, force, settle, synth_frontier


def timed(stages: dict, name: str, fn):
    t0 = time.monotonic()
    out = fn()
    stages[name] = round(time.monotonic() - t0, 3)
    return out


def persisted(df: DataFrame) -> DataFrame:
    df = df.persist()
    df.count()
    return df


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--n-hosts", type=int, default=10_000)
    args = ap.parse_args()

    from crawler_service_spark.config import CrawlConfig
    from crawler_service_spark.functions.urls import (
        canonicalize_frame,
        host_native,
        make_canon_udf,
        native_canon_eligible,
    )
    from crawler_service_spark.operators.dedup import anti_join_seen, first_occurrence
    from crawler_service_spark.operators.extract import extract_pages
    from crawler_service_spark.operators.politeness import schedule_round

    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    spark = build_spark(args.cpus, "profile")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CrawlConfig()
    n = args.n

    frontier = persisted(synth_frontier(spark, n, args.n_hosts))

    # warmup: fork python workers, JIT the codegen paths
    wf = synth_frontier(spark, max(100_000, n // 40), args.n_hosts)
    force(canonicalize_frame(wf, "url"))
    force(extract_pages(
        wf.withColumn("html", F.lit("<html><head><title>w</title></head>"
                                    "<body><p>x</p></body></html>"))
        .withColumn("is_error", F.lit(False)), cfg))
    settle(spark)

    stages: dict[str, float] = {}

    timed(stages, "scan_cache", lambda: force(frontier))
    timed(stages, "canon_native_only", lambda: force(
        frontier.withColumn("canon_url",
                            F.when(native_canon_eligible(F.col("url")),
                                   F.col("url")))))
    timed(stages, "canon_union", lambda: force(canonicalize_frame(frontier, "url")))
    timed(stages, "canon_pandas_all", lambda: force(
        frontier.withColumn("canon_url", make_canon_udf(True)(F.col("url")))))

    canon = timed(
        stages, "canon_union_persist",
        lambda: persisted(canonicalize_frame(frontier, "url")
                          .withColumn("host", host_native(F.col("url")))))

    dedup = timed(stages, "first_occurrence_persist",
                  lambda: persisted(first_occurrence(
                      canon, ["canon_url"], ["discovery_seq"])))

    seen = persisted(
        canonicalize_frame(
            synth_frontier(spark, n, args.n_hosts)
            .filter(F.col("discovery_seq") % 3 == 0), "url")
        .select("canon_url").repartition(parts, "canon_url"))

    b = timed(stages, "anti_join_persist",
              lambda: persisted(anti_join_seen(dedup, seen, ["canon_url"])))

    timed(stages, "schedule_rank", lambda: force(schedule_round(
        b, None, priority_col="depth", shuffle_partitions=parts,
        salt_width=max(1 << 14, n // 256))[0]))

    # round-job tail: fetch join + extraction on a store of the same rows
    nstr = F.col("discovery_seq").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "), nstr,
        F.lit("</title><meta name=\"description\" content=\"synthetic page "),
        nstr, F.lit("\"></head><body><h1>Heading "), nstr, F.lit("</h1><p>"),
        F.repeat(F.concat(F.lit("token"), nstr, F.lit(" body text ")), 12),
        F.lit("</p><img src=\"https://img.example.com/"), nstr,
        F.lit(".png\" alt=\"pic\"><a href=\"https://h1.example.com/p/"), nstr,
        F.lit("\">go</a><a href=\"https://h2.example.com/p/"), nstr,
        F.lit("1\">go</a></body></html>"),
    )
    n_store = min(n, 1_000_000)
    store = persisted(
        canonicalize_frame(synth_frontier(spark, n_store, args.n_hosts), "url")
        .select("canon_url", html.alias("html"))
        .repartition(parts, "canon_url"))
    batch = persisted(b.limit(n_store).select("canon_url", "url", "host",
                                              "depth", "discovery_seq"))

    joined = timed(stages, "fetch_join_persist", lambda: persisted(
        batch.join(store, "canon_url", "left")
        .withColumn("is_error", F.col("html").isNull())))

    timed(stages, "extract_no_repart", lambda: force(
        extract_pages(joined, cfg)
        .select("canon_url", "title", "text_content", "links", "spans")))
    timed(stages, "extract_with_repart", lambda: force(
        extract_pages(joined.repartition(parts), cfg)
        .select("canon_url", "title", "text_content", "links", "spans")))

    # unpersisted end-to-end tail as the round job actually runs it
    timed(stages, "join_repart_extract_lineage", lambda: force(
        extract_pages(
            batch.join(store, "canon_url", "left")
            .withColumn("is_error", F.col("html").isNull())
            .repartition(parts), cfg)
        .select("canon_url", "title", "text_content", "links", "spans")))

    print(json.dumps({"cpus": args.cpus, "n": n, "n_store": n_store,
                      "stages": stages}))
    spark.stop()


if __name__ == "__main__":
    main()
