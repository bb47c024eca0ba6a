"""Deterministic synthetic crawl corpus (SURVEY §7.1, FIXTURES.md).

Replaces live HTTP (the reference's only true source,
/root/reference/app/services/crawler.py:210) with a content-store table:
one row per fetchable URL carrying rendered HTML, a declared failure
schedule, and the golden interleaved span sequence. Everything is a pure
function of the doc index — no RNG state, no coupling to partitioning —
so the corpus is identical however it is generated (driver-side pandas
for tests, distributed ``spark.range`` + mapInPandas for scale).

Host layout: docs 0..N-1 map to hosts via a square-law block assignment
(host 0 largest) — the "common-host-skewed" distribution from
BASELINE.json. Links stay mostly within a host block (BFS actually grows;
the internal-link filter keeps each task on its seed netloc) with
deliberate dirty variants exercising P1/F1/D1/D2: trailing slashes,
unsorted query params, fragments, skip extensions, cross-host and
uppercase-netloc links.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crawler_service_spark.functions.html import render_html
from crawler_service_spark.operators.extract import SPAN_TYPE

STORE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),  # canonical URL (fetch-join key)
        StructField("host", StringType()),
        StructField("status_code", IntegerType()),
        StructField("fail_times", IntegerType()),
        StructField("spans", SPAN_TYPE),
        StructField("out_links", ArrayType(StringType())),
        StructField("response_time_ms", IntegerType()),
        StructField("html", StringType()),
    ]
)

SEED_SCHEMA = StructType(
    [
        StructField("task_id", StringType()),
        StructField("url", StringType()),
        StructField("seed_seq", LongType()),
    ]
)

_WORDS = (
    "crawl frontier spark shuffle partition host queue fetch span media "
    "token batch window rank filter join dedup bloom robots depth"
).split()


def host_name(h: int) -> str:
    return f"host{h}.example.com"


def host_blocks(n_docs: int, n_hosts: int) -> list[tuple[int, int]]:
    """Contiguous [lo, hi) doc ranges per host; sizes follow a square law
    (host h spans i/N in [ (h/H)^2, ((h+1)/H)^2 ) → strongly skewed)."""
    bounds = [
        min(n_docs, int(round(n_docs * (h / n_hosts) ** 2)))
        for h in range(n_hosts + 1)
    ]
    bounds[-1] = n_docs
    blocks = []
    for h in range(n_hosts):
        lo, hi = bounds[h], max(bounds[h + 1], bounds[h] + 1)
        hi = min(hi, n_docs)
        if lo >= n_docs:
            lo = n_docs - 1
        blocks.append((lo, max(hi, lo + 1)))
    return blocks


def _host_of_doc(i: int, blocks: list[tuple[int, int]]) -> int:
    # binary search over contiguous blocks
    lo, hi = 0, len(blocks) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if blocks[mid][1] <= i:
            lo = mid + 1
        else:
            hi = mid
    return lo


def doc_record(i: int, blocks: list[tuple[int, int]], texts: list[str] | None = None) -> dict:
    """The pure per-doc generator shared by every builder."""
    h = _host_of_doc(i, blocks)
    lo, hi = blocks[h]
    span = hi - lo
    host = host_name(h)
    canon = f"https://{host}/page/{i}"

    # ---- status / failure schedule (deterministic mix, FIXTURES.md §2)
    r = (i * 31 + 7) % 100
    if r < 86:
        status = 200
    elif r < 92:
        status = 404
    elif r < 94:
        status = 403
    elif r < 96:
        status = 500
    elif r < 98:
        status = 503
    else:
        status = 429
    f = (i * 17 + 3) % 23
    fail_times = 1 if f == 0 else (2 if f == 1 else (3 if f == 2 else (4 if f == 3 else 0)))
    if status != 200:
        fail_times = 0
    if i == lo:
        # block starts are the seed URLs (build_seeds_df): keep them
        # fetchable so every task's BFS actually grows
        status, fail_times = 200, (1 if i % 2 else 0)

    # ---- out links (mostly in-block; dirty variants by position)
    degree = 3 + (i % 5)
    out_links: list[str] = []
    for j in range(degree):
        t = lo + ((i - lo) * 7 + j * 13 + 1) % span
        variant = (i + 5 * j) % 12
        base = f"/page/{t}"
        if variant == 0:
            href = f"https://{host}{base}/"          # trailing slash → D2 dup
        elif variant == 1:
            href = f"{base}?b=2&a=1"                 # unsorted query (P1 sort)
        elif variant == 2:
            href = f"{base}#frag"                    # fragment → F1 drop
        elif variant == 3:
            href = f"https://{host}/assets/style-{t}.css"  # skip ext → F1 drop
        elif variant == 4:
            href = f"https://other{h}.example.net/page/{t}"  # cross-host → F1 drop
        elif variant == 5:
            href = f"HTTPS://{host.upper()}{base}"   # uppercase netloc → F1 drop
        elif variant == 6:
            href = f"https://{host}:443{base}"       # default port → F1 drop (netloc mismatch)
        else:
            href = base                               # relative → urljoin
        out_links.append(href)

    # ---- interleaved span sequence (offsets contiguous, FIXTURES.md §2)
    words = _WORDS
    text_seed = texts[i % len(texts)] if texts else None
    spans: list[dict] = []

    def w(k: int) -> str:
        return words[(i * 3 + k) % len(words)]

    def add(kind: str, text: str, media_ref: str | None = None) -> None:
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
        )

    add("title", f"{w(0)} {w(1)} page {i}")
    add("meta", f"{w(2)} {w(3)} doc {i}")
    if i % 4 == 0:
        add("canonical", f"https://{host}/canon/{i}")
    add("h1", f"{w(4)} heading {i}")
    body = text_seed if text_seed else f"{w(5)} {w(6)} {w(7)} body {i}"
    add("text", body)
    if i % 2 == 0:
        add("h2", f"{w(8)} section {i}")
        add("text", f"{w(9)} {w(10)} detail {i}")
    if i % 3 == 0:
        add("h3", f"{w(11)} sub {i}")
    # media interleaved with links
    n_media = i % 3
    for k in range(n_media):
        add("media", f"alt {w(k)} {i} {k}", f"/img/{i}_{k}.png")
    for href in out_links:
        add("link", href)

    html = render_html(spans)
    return {
        "doc_id": canon,
        "host": host,
        "status_code": status,
        "fail_times": fail_times,
        "spans": spans,
        "out_links": out_links,
        "response_time_ms": 20 + (i * 13) % 400,
        "html": html,
    }


def build_store_pandas(
    n_docs: int, n_hosts: int, texts: list[str] | None = None
) -> pd.DataFrame:
    blocks = host_blocks(n_docs, n_hosts)
    return pd.DataFrame([doc_record(i, blocks, texts) for i in range(n_docs)])


def build_store_df(
    spark: SparkSession,
    n_docs: int,
    n_hosts: int,
    texts: list[str] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed generator: same rows as ``build_store_pandas`` but via
    spark.range + mapInPandas (scales to any n_docs)."""
    blocks = host_blocks(n_docs, n_hosts)

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [doc_record(int(i), blocks, texts) for i in pdf["id"]]
            )

    rng = spark.range(n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=STORE_SCHEMA)


def build_seeds_df(spark: SparkSession, n_docs: int, n_hosts: int, n_seeds: int) -> DataFrame:
    """One seed per host (first doc of the block), dirty path variants on
    a clean netloc (the reference's internal-link check is against the raw
    seed netloc — crawler.py:487 — so a dirty netloc would kill growth)."""
    blocks = host_blocks(n_docs, n_hosts)
    rows = []
    for s in range(min(n_seeds, n_hosts)):
        lo, _ = blocks[s]
        host = host_name(s)
        url = f"https://{host}/page/{lo}" + ("/" if s % 2 else "")
        rows.append({"task_id": f"task{s}", "url": url, "seed_seq": s})
    return spark.createDataFrame(pd.DataFrame(rows), schema=SEED_SCHEMA)


def build_policy_df(spark: SparkSession, n_hosts: int) -> DataFrame:
    """host_policy dim (FIXTURES.md §3): default limit 10/60s, a few custom
    limits, occasional robots crawl-delay and disallow prefixes."""
    rows = []
    for h in range(n_hosts):
        rows.append(
            {
                "host": host_name(h),
                "rate_limit": 5 if h % 7 == 3 else (20 if h % 7 == 5 else 10),
                "window_s": 60,
                "crawl_delay_s": 2.0 if h % 11 == 4 else 0.0,
                "disallow_prefixes": ["/private/"] if h % 5 == 2 else [],
            }
        )
    from pyspark.sql.types import DoubleType

    schema = StructType(
        [
            StructField("host", StringType()),
            StructField("rate_limit", IntegerType()),
            StructField("window_s", IntegerType()),
            StructField("crawl_delay_s", DoubleType()),
            StructField("disallow_prefixes", ArrayType(StringType())),
        ]
    )
    return spark.createDataFrame(pd.DataFrame(rows), schema=schema)
