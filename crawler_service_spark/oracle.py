"""Reference-semantics oracle: a serial replay of the reference crawler.

Re-implements, from the cited spec (NOT copied code), the exact serial
BFS of /root/reference/app/services/crawler.py:75-181 over the synthetic
content store: deque FIFO (crawler.py:95-146), normalize-then-seen check
(crawler.py:107-118), the ``max_depth == 0`` quirk (crawler.py:114,
137-138), enqueue-time pending dedup (crawler.py:144-146), the retry
outcome of crawl_url (crawler.py:201-415) over the corpus-declared
failure schedule, and the internal-link predicate (crawler.py:476-509).

The golden outputs — crawl order, URL-seen set, per-page span sequences —
are what the Spark engine's distributed plan must equal exactly
(BASELINE.json equality contract). Canonicalization and HTML extraction
are shared leaf functions (functions/urls.py, functions/html.py): what
this oracle independently re-derives is the *orchestration* the engine
parallelizes — ordering, dedup, scheduling, retry.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from urllib.parse import urlparse

from crawler_service_spark.config import TRANSIENT_FAIL_STATUS, CrawlConfig
from crawler_service_spark.functions.html import extract_page
from crawler_service_spark.functions.urls import canonicalize_url


@dataclass
class OraclePage:
    task_id: str
    fetch_seq: int
    depth: int
    url: str
    canon_url: str
    status: int
    retry_attempts: int
    is_error: bool
    spans: list = field(default_factory=list)
    links: list = field(default_factory=list)
    title: str | None = None
    text_content: str | None = None


@dataclass
class OracleResult:
    order: list  # list[OraclePage] in fetch order
    seen: set  # set[(task_id, canon_url)]
    retry_stats: dict


def _fetch_outcome(record: dict | None, max_retries: int) -> tuple[int, int, bool]:
    """(effective_status, retry_attempts, is_error) — mirrors the retry
    loop's terminal state (crawler.py:201-415) for a declared schedule."""
    if record is None:
        return 404, 0, True  # not in store → permanent 404
    status = record["status_code"]
    fails = record["fail_times"]
    if 400 <= status < 500 and status != 429:
        return status, 0, True
    if status >= 500 or status == 429:
        return status, max_retries, True
    if fails <= max_retries:
        return status, fails, False
    return TRANSIENT_FAIL_STATUS, max_retries, True


def _is_internal_link(base_url: str, url: str, cfg: CrawlConfig) -> bool:
    """crawler.py:476-509 semantics (raw-netloc comparison, skip list,
    fragment drop), with the north-rule robots check applied separately."""
    try:
        base_parsed = urlparse(base_url)
        url_parsed = urlparse(url)
        if url_parsed.scheme not in ("http", "https"):
            return False
        if base_parsed.netloc != url_parsed.netloc:
            return False
        path = url_parsed.path.lower()
        for pattern in cfg.skip_extensions:
            if path.endswith(pattern):
                return False
        if url_parsed.fragment:
            return False
        return True
    except ValueError:
        return False


def _robots_allowed(url: str, policy: dict | None) -> bool:
    if not policy:
        return True
    p = urlparse(url)
    host = p.netloc.lower().split(":")[0]
    prefixes = policy.get(host, {}).get("disallow_prefixes") or []
    return not any(p.path.startswith(pre) for pre in prefixes)


def simulate_crawl(
    store: dict[str, dict],
    seed_url: str,
    cfg: CrawlConfig,
    task_id: str = "task0",
    policy: dict | None = None,
) -> OracleResult:
    """Replay one crawl request (one task) serially."""
    visited: set[str] = set()
    queue: deque[tuple[str, int]] = deque([(seed_url, 0)])
    order: list[OraclePage] = []
    fetch_seq = 0
    stats = {
        "total_retries": 0,
        "successful_retries": 0,
        "failed_retries": 0,
        "transient_errors": 0,
        "permanent_errors": 0,
    }

    while queue:
        current_url, depth = queue.popleft()
        canon = canonicalize_url(current_url, cfg.sort_query_params)
        if canon in visited:
            continue
        if cfg.max_depth > 0 and depth > cfg.max_depth:
            continue
        visited.add(canon)

        record = store.get(canon)
        status, attempts, is_error = _fetch_outcome(record, cfg.max_retries)
        _record_outcome(stats, status, attempts, is_error)

        page = OraclePage(
            task_id=task_id,
            fetch_seq=fetch_seq,
            depth=depth,
            url=current_url,
            canon_url=canon,
            status=status,
            retry_attempts=attempts,
            is_error=is_error,
        )
        if not is_error:
            ext = extract_page(
                record["html"],
                current_url,
                extract_text=cfg.extract_text,
                extract_images=cfg.extract_images,
                extract_links=cfg.extract_links,
                extract_headings=cfg.extract_headings,
                extract_image_alt_text=cfg.extract_image_alt_text,
                extract_canonical_url=cfg.extract_canonical_url,
            )
            page.spans = ext["spans"]
            page.links = ext["links"]
            page.title = ext["title"]
            page.text_content = ext["text_content"]
        order.append(page)
        fetch_seq += 1

        if not is_error and cfg.follow_links and (
            cfg.max_depth == 0 or depth < cfg.max_depth
        ):
            for link in page.links:
                if not _is_internal_link(seed_url, link, cfg):
                    continue
                if cfg.respect_robots and not _robots_allowed(link, policy):
                    continue
                normalized = canonicalize_url(link, cfg.sort_query_params)
                if normalized in visited:
                    continue
                if any(
                    canonicalize_url(u, cfg.sort_query_params) == normalized
                    for u, _ in queue
                ):
                    continue
                queue.append((link, depth + 1))

    return OracleResult(
        order=order,
        seen={(task_id, c) for c in visited},
        retry_stats=stats,
    )


def _record_outcome(stats: dict, status: int, attempts: int, is_error: bool) -> None:
    stats["total_retries"] += attempts
    if is_error:
        if status >= 500 or status == 429:
            stats["transient_errors"] += attempts + 1
            stats["failed_retries"] += 1
        else:
            stats["permanent_errors"] += 1
    elif attempts > 0:
        stats["transient_errors"] += attempts
        stats["successful_retries"] += 1


def simulate_crawl_rounds(
    store: dict[str, dict],
    seed_url: str,
    cfg: CrawlConfig,
    task_id: str = "task0",
    policy: dict | None = None,
    limits: dict[str, int] | None = None,
    max_rounds: int = 200,
) -> OracleResult:
    """Ground truth for the engine's ``budget_rounds`` deferral mode
    (rate_limiter.py:92-111 carried across scheduling rounds, a
    north-rule superset of the reference's sleep-only limiter).

    Per round: order the frontier by (depth, discovery_seq); admit at
    most ``budget_rounds × limit`` rows per host; fetch admitted in that
    order; expand their links (global discovery_seq counter, enqueue-time
    dedup against everything ever enqueued); defer the remainder with
    original (depth, seq) into the next round.
    """
    from crawler_service_spark.functions.urls import host_of

    k = cfg.budget_rounds or 1
    canon_seed = canonicalize_url(seed_url, cfg.sort_query_params)
    frontier: list[tuple[str, int, int]] = [(seed_url, 0, 0)]  # url, depth, seq
    next_seq = 1
    enqueued: set[str] = {canon_seed}
    order: list[OraclePage] = []
    fetch_seq = 0
    stats = {
        "total_retries": 0,
        "successful_retries": 0,
        "failed_retries": 0,
        "transient_errors": 0,
        "permanent_errors": 0,
    }

    rnd = 0
    while frontier and rnd < max_rounds:
        frontier.sort(key=lambda t: (t[1], t[2]))
        counts: dict[str, int] = {}
        admitted, deferred = [], []
        for url, depth, seq in frontier:
            host = host_of(url)
            cap = k * (limits or {}).get(host, cfg.default_rate_limit)
            if counts.get(host, 0) < cap:
                counts[host] = counts.get(host, 0) + 1
                admitted.append((url, depth, seq))
            else:
                deferred.append((url, depth, seq))

        new_rows: list[tuple[str, int, int]] = []
        for url, depth, seq in admitted:
            canon = canonicalize_url(url, cfg.sort_query_params)
            record = store.get(canon)
            status, attempts, is_error = _fetch_outcome(record, cfg.max_retries)
            _record_outcome(stats, status, attempts, is_error)
            page = OraclePage(
                task_id=task_id, fetch_seq=fetch_seq, depth=depth, url=url,
                canon_url=canon, status=status, retry_attempts=attempts,
                is_error=is_error,
            )
            if not is_error:
                ext = extract_page(
                    record["html"], url,
                    extract_text=cfg.extract_text,
                    extract_images=cfg.extract_images,
                    extract_links=cfg.extract_links,
                    extract_headings=cfg.extract_headings,
                    extract_image_alt_text=cfg.extract_image_alt_text,
                    extract_canonical_url=cfg.extract_canonical_url,
                )
                page.spans = ext["spans"]
                page.links = ext["links"]
                page.title = ext["title"]
                page.text_content = ext["text_content"]
            order.append(page)
            fetch_seq += 1

            if not is_error and cfg.follow_links and (
                cfg.max_depth == 0 or depth < cfg.max_depth
            ):
                for link in page.links:
                    if not _is_internal_link(seed_url, link, cfg):
                        continue
                    if cfg.respect_robots and not _robots_allowed(link, policy):
                        continue
                    normalized = canonicalize_url(link, cfg.sort_query_params)
                    if normalized in enqueued:
                        continue
                    enqueued.add(normalized)
                    new_rows.append((link, depth + 1, next_seq))
                    next_seq += 1

        frontier = new_rows + deferred
        rnd += 1

    return OracleResult(
        order=order,
        seen={(task_id, c) for c in enqueued},
        retry_stats=stats,
    )


def simulate_many(
    store: dict[str, dict],
    seeds: list[tuple[str, str]],  # (task_id, url) in seed_seq order
    cfg: CrawlConfig,
    policy: dict | None = None,
) -> list[OracleResult]:
    return [
        simulate_crawl(store, url, cfg, task_id=tid, policy=policy)
        for tid, url in seeds
    ]
