"""Link expansion + internal-link filtering (SURVEY §2 J1/F1/F3).

J1: a fetched page's ``links`` array explodes into candidate frontier rows
(/root/reference/app/services/crawler.py:140-146) — ``posexplode`` keeps
``link_pos``, the in-page position that tie-breaks crawl order (O1).

F1 (`_is_internal_link`, crawler.py:476-509): scheme ∈ {http,https} ∧
same netloc as the *seed* ∧ path suffix not in the 23-extension skip list
∧ no fragment. The netloc/path/fragment come from one Arrow round trip
(`url_parts_udf`); everything else is a native predicate chain Catalyst
can reorder and push down.

Robots disallow-prefix filtering is the north-rule addition (the reference
has none — SURVEY §7.4); applied identically in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_service_spark.config import CrawlConfig
from crawler_service_spark.functions.urls import (
    native_canon_eligible,
    url_parts_udf,
)


def expand_links(pages: DataFrame) -> DataFrame:
    """J1: one row per (page, link) with deterministic ``link_pos``.

    Expects ``links array<string>``, ``fetch_seq``/``discovery_seq``,
    ``depth``, ``task_id``, ``seed_netloc``.
    """
    return pages.select(
        "task_id",
        "seed_netloc",
        F.col("discovery_seq").alias("parent_seq"),
        (F.col("depth") + 1).alias("depth"),
        F.posexplode("links").alias("link_pos", "url"),
    )


def filter_internal(candidates: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """F1 + F3: keep same-seed-netloc, non-skip, fragment-free http(s)
    links.

    Hybrid like P1 (`canonicalize_frame`): links are the highest-volume
    rows of a round (fan-out ≫ pages), so eligible URLs take a pure
    regex/codegen path — scheme/netloc/path/fragment extraction is
    byte-identical to `urlparse` on `native_canon_eligible` rows — and
    only the weird remainder pays the Arrow UDF crossing.

    NB: the reference compares raw netloc (case-sensitive,
    crawler.py:487); corpus URLs keep hosts lowercase so engine and
    oracle agree — both branches expose raw netloc semantics plus the
    lowercased, port-stripped host.
    """
    alternation = "|".join(e.lstrip(".") for e in cfg.skip_extensions)
    eligible = native_canon_eligible(F.col("url"))

    scheme = F.lower(F.regexp_extract("url", r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    netloc = F.regexp_extract("url", r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    path = F.regexp_extract("url", r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    frag = F.regexp_extract("url", r"#(.*)$", 1)
    keep_native = (
        scheme.isin("http", "https")
        & (netloc == F.col("seed_netloc"))
        & ~F.lower(path).rlike(r"\.(" + alternation + r")$")
        & (frag == "")
    )
    fast = (
        candidates.filter(eligible)
        .filter(keep_native)
        # host_of semantics: lowercase netloc, text before the first ':'
        .withColumn("host", F.lower(F.substring_index(netloc, ":", 1)))
        .withColumn("path", path)
    )

    keep_udf = (
        F.col("_parts.scheme").isin("http", "https")
        & (F.col("_parts.netloc") == F.col("seed_netloc"))
        & ~F.lower(F.col("_parts.path")).rlike(r"\.(" + alternation + r")$")
        & (F.col("_parts.fragment") == "")
    )
    slow = (
        candidates.filter(~eligible)
        .withColumn("_parts", url_parts_udf(F.col("url")))
        .filter(keep_udf)
        .withColumn("host", F.col("_parts.host"))
        .withColumn("path", F.col("_parts.path"))
        .drop("_parts")
    )
    return fast.unionByName(slow)


def filter_robots(candidates: DataFrame, policy: DataFrame | None) -> DataFrame:
    """Drop candidates whose path starts with a disallowed prefix for its
    host (broadcast join with the tiny policy dim). No-op without policy."""
    if policy is None:
        return candidates
    dis = policy.select("host", F.col("disallow_prefixes").alias("_dis"))
    joined = candidates.join(F.broadcast(dis), "host", "left")
    blocked = F.exists(
        F.coalesce(F.col("_dis"), F.array().cast("array<string>")),
        lambda p: F.col("path").startswith(p),
    )
    return joined.filter(~blocked).drop("_dis")
