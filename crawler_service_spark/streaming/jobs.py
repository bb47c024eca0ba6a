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
    StructField("window_start", TimestampType()),  # tumbling politeness window
    StructField("admit_seq", LongType()),   # 1-based admission rank per host+window
    StructField("admitted", LongType()),    # 1 admitted / 0 deferred
])

# (epoch-seconds start of the host's LATEST window, admissions used in it)
BUDGET_STATE = StructType([
    StructField("window_start", LongType()),
    StructField("used", LongType()),
])


def host_budget_state(
    frontier: DataFrame,
    limit: int = 10,
    host_col: str = "host",
    window_s: int = 60,
) -> DataFrame:
    """The politeness limiter as streaming state: per host, admit at most
    ``limit`` URLs per ``window_s``-second tumbling event-time window
    (the batch engine's window-slot semantics; the streaming analog of
    rate_limiter.py:57-65's deque eviction — r02 VERDICT item 6 replaced
    the old single-counter state that was exact only for one-window
    streams). State per host is ``(window_start, used)`` for the latest
    window; entering a newer window resets the budget, mirroring the
    deque having fully evicted the prior window's timestamps.

    Rows within a batch are processed in (ts, url) order so admission is
    deterministic regardless of partitioning. Assumes per-host event-time
    order across micro-batches at window granularity (a row older than
    the host's current window counts against a fresh budget — pair with a
    watermark-dropping upstream like ``windowed_event_counts`` to bound
    such lateness).
    """
    import numpy as np

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        cur_win, used = state.get if state.exists else (-1, 0)
        frames = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            # vectorized (no per-row Python): sort once, window ids from
            # epoch seconds, per-window rank = grouped cumsum, carry the
            # state counter into rows still in the carried window
            pdf = pdf.sort_values(["ts", "url"], kind="mergesort")
            epoch = pdf["ts"].to_numpy().astype("datetime64[s]").astype("int64")
            win = (epoch // window_s) * window_s
            local = pd.Series(1, index=pdf.index).groupby(win).cumsum().to_numpy()
            seq = local + np.where(win == cur_win, used, 0)
            frames.append(pd.DataFrame({
                "host": host,
                "url": pdf["url"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "window_start": win.astype("datetime64[s]"),
                "admit_seq": seq.astype("int64"),
                "admitted": (seq <= limit).astype("int64"),
            }))
            last_win = int(win[-1])
            last_n = int((win == last_win).sum())
            used = used + last_n if last_win == cur_win else last_n
            cur_win = last_win
        state.update((cur_win, used))
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
