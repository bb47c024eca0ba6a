"""Result sinks/sources (SURVEY §2 S2/S3).

The reference's only sinks are JSON HTTP response envelopes
(/root/reference/app/api/v1/crawl.py:56, 102-106 and the simplified
8-field projection at crawl.py:136-154). The batch equivalents: JSON
lines / parquet exports of the ordered pages table, and the one-row
"simple" projection. Columnar parquet is the engine's native interchange
format; JSON is the compatibility surface for consumers of the reference
API shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the 8-field flat projection of /crawl/simple (crawl.py:136-147)
SIMPLE_FIELDS = [
    "url", "title", "text_content", "images", "links",
    "meta_description", "effective_status", "depth",
]


def pages_json_records(pages: DataFrame) -> DataFrame:
    """One JSON string per page (the CrawledPage envelope shape)."""
    return pages.select(F.to_json(F.struct(*pages.columns)).alias("json"))


def write_pages_json(pages: DataFrame, path: str) -> None:
    """S2: JSON-lines export of the pages table (ordered consumers sort
    by the explicit keys — file order is never meaningful)."""
    pages.write.mode("overwrite").json(path)


def read_pages_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)


def write_pages_parquet(pages: DataFrame, path: str,
                        partition_by: list[str] | None = None) -> None:
    """Columnar export; partition by e.g. ['depth'] or host-hash buckets
    for pruned downstream scans."""
    w = pages.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def simple_projection(pages_ordered: DataFrame) -> DataFrame:
    """S3: the /crawl/simple response — first page only, 8 flat fields
    (crawl.py:136-147). Expects a ``fetch_seq`` column (fetch_order)."""
    cols = [c for c in SIMPLE_FIELDS if c in pages_ordered.columns]
    # fetch_seq == 0 IS "the first page" — never groupBy+first, whose
    # order is undefined under partial aggregation
    return pages_ordered.filter(F.col("fetch_seq") == 0).select("task_id", *cols)
