"""Structured Streaming surface.

The reference is a request/response service with two stateful pieces —
the URL-seen set and the sliding-window limiter (SURVEY §2.9). The batch
engine carries both as per-round tables; this module is the streaming
expression of the same semantics for a *continuous* frontier feed:

* ``windowed_event_counts`` — per-host fetch counts in tumbling
  event-time windows with a watermark: the streaming twin of the
  politeness window (admitted-per-host-per-60s), late fetch records
  beyond the watermark dropped deterministically.
* ``host_budget_state`` — ``applyInPandasWithState`` keeping one running
  counter per host across micro-batches and admitting at most ``limit``
  rows per window: the limiter deque (rate_limiter.py:33) as streaming
  state instead of a Python dict.
* ``sessionize_events`` — session windows per user/host with a gap
  timeout (no reference equivalent; standard enrichment for a
  training-data event feed).

All are source-agnostic: pass any streaming DataFrame (file source in
tests via ``Trigger.AvailableNow``; Kafka/rate in production). State is
checkpointed by the sink's ``checkpointLocation`` — the streaming analog
of the SnapshotStore rounds.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "host",
    window: str = "60 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window per-key counts with late-data handling."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def sessionize_events(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) per key."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


BUDGET_OUTPUT = StructType([
    StructField("host", StringType()),
    StructField("url", StringType()),
    StructField("ts", TimestampType()),
    StructField("admit_seq", LongType()),   # 1-based admission rank per host
    StructField("admitted", LongType()),    # 1 admitted / 0 deferred
])

BUDGET_STATE = StructType([StructField("used", LongType())])


def host_budget_state(
    frontier: DataFrame,
    limit: int = 10,
    host_col: str = "host",
) -> DataFrame:
    """The sliding-window limiter as streaming state: per host, admit the
    first ``limit`` URLs (across ALL micro-batches) and mark the rest
    deferred. State is a single counter per host — the minimal exact
    reduction of the reference's timestamp deque when the stream is one
    window long; a production variant stores (window_start, used).

    Rows within a batch are processed in (ts, url) order so admission is
    deterministic regardless of partitioning.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        used = state.get[0] if state.exists else 0
        frames = []
        for pdf in pdfs:
            # vectorized: admit_seq = carried counter + batch-local rank
            # (sorted cumsum), no per-row Python (VERDICT r01 item 5)
            pdf = pdf.sort_values(["ts", "url"], kind="mergesort")
            seq = used + pd.RangeIndex(1, len(pdf) + 1)
            frames.append(pd.DataFrame({
                "host": host,
                "url": pdf["url"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "admit_seq": seq.astype("int64"),
                "admitted": (seq <= limit).astype("int64"),
            }))
            used += len(pdf)
        state.update((used,))
        cols = [f.name for f in BUDGET_OUTPUT.fields]
        if frames:
            yield pd.concat(frames, ignore_index=True)[cols]
        else:
            yield pd.DataFrame(columns=cols)

    return frontier.groupBy(host_col).applyInPandasWithState(
        update,
        outputStructType=BUDGET_OUTPUT,
        stateStructType=BUDGET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
