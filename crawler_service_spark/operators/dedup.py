"""URL-seen deduplication (SURVEY §2 D1/D2) — the scale-critical operator.

D1 (cross-round): the reference's ``normalized in self.visited_urls``
(/root/reference/app/services/crawler.py:110-118) becomes a ``left_anti``
join against the cumulative ``url_seen`` table. Exactness is mandatory
(the URL-seen equality contract forbids probabilistic drops), so the
bloom bitmap is strictly a *prefilter*: rows whose bits are not all set
are **definitely new** and skip the shuffle entirely; only "maybe seen"
rows pay the exact anti-join. On a web-scale frontier most candidate
links are duplicates of hot pages, so the bitmap absorbs the common case
while the anti-join stays the source of truth.

D2 (in-batch): the reference's O(n) pending-queue scan
(crawler.py:144-146) — first raw variant of a canonical URL wins, where
"first" is the deterministic (parent_seq, link_pos) order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def first_occurrence(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """D2: keep the first row per key in deterministic order.

    Implemented as ``min(struct(order_cols…, payload))`` hash aggregation
    rather than a window rank: the partial (map-side) aggregate collapses
    duplicates BEFORE the shuffle, so on a dup-heavy link batch the
    exchange carries one row per key instead of every candidate — the
    window variant shuffles and sorts everything. Ties on ``order_cols``
    break deterministically by the remaining columns (struct comparison
    is lexicographic), which is strictly more deterministic than
    ``row_number``'s arbitrary tie order. Payload columns must be
    orderable (no maps) — true for frontier/link rows.
    """
    payload = [c for c in df.columns if c not in key_cols]
    m = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.min(
            F.struct(
                *[F.col(c) for c in order_cols],
                F.struct(*[F.col(c) for c in payload]).alias("_row"),
            )
        ).alias("_m")
    )
    return m.select(*key_cols, "_m._row.*")


class BloomPrefilter:
    """Broadcastable bloom bitmap over a key column.

    Built distributively: the seen table is hashed JVM-side
    (``xxhash64(key, seed_i) mod num_bits``) and only the *distinct bit
    positions* (≤ num_bits rows, independent of table size) are collected;
    the bitmap itself is a numpy array captured by the probe UDF's closure
    (Spark broadcasts closures to executors once per stage).
    """

    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 3):
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        self.bits = np.zeros(self.num_bits, dtype=bool)
        self.fitted = False

    def _positions(self, df: DataFrame, key: str) -> DataFrame:
        cols = [
            F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(self.num_bits)).alias(f"p{i}")
            for i in range(self.num_hashes)
        ]
        stacked = df.select(cols)
        exploded = stacked.select(
            F.explode(F.array(*[F.col(f"p{i}") for i in range(self.num_hashes)])).alias("pos")
        )
        return exploded.distinct()

    def fit(self, seen: DataFrame, key: str = "canon_url") -> "BloomPrefilter":
        pos = [r["pos"] for r in self._positions(seen, key).collect()]
        self.bits[np.asarray(pos, dtype=np.int64)] = True if pos else self.bits
        self.fitted = True
        return self

    def update(self, new_rows: DataFrame, key: str = "canon_url") -> None:
        pos = [r["pos"] for r in self._positions(new_rows, key).collect()]
        if pos:
            self.bits[np.asarray(pos, dtype=np.int64)] = True
        self.fitted = True

    def probe_col(self, key_col):
        """Native column: True iff all bloom bits for the key are set.

        Uses the same JVM-side xxhash64 as `fit`, then an array lookup via
        a tiny pandas UDF over the bit positions (Arrow-batched).
        """
        bits = self.bits

        @F.pandas_udf(BooleanType())
        def _all_set(*pos_cols: pd.Series) -> pd.Series:
            res = np.ones(len(pos_cols[0]), dtype=bool)
            for p in pos_cols:
                res &= bits[p.to_numpy(dtype=np.int64)]
            return pd.Series(res)

        pos = [
            F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(self.num_bits))
            for i in range(self.num_hashes)
        ]
        return _all_set(*pos)


def anti_join_seen(
    batch: DataFrame,
    seen: DataFrame,
    key_cols: list[str],
    bloom: BloomPrefilter | None = None,
    bloom_key: str = "canon_url",
) -> DataFrame:
    """D1: rows of ``batch`` whose key is NOT in ``seen`` (exact).

    With a fitted bloom prefilter, definitely-new rows bypass the shuffle;
    the exact anti-join runs only on the maybe-seen remainder and the
    result is their union (no false drops possible).
    """
    if bloom is not None and bloom.fitted:
        probed = batch.withColumn("_maybe_seen", bloom.probe_col(F.col(bloom_key)))
        definitely_new = probed.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        maybe = probed.filter(F.col("_maybe_seen")).drop("_maybe_seen")
        survived = maybe.join(seen.select(key_cols), key_cols, "left_anti")
        return definitely_new.unionByName(survived)
    return batch.join(seen.select(key_cols), key_cols, "left_anti")
