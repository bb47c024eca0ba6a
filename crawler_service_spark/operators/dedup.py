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
    keep_hash: bool = False,
    strategy: str = "agg",
) -> DataFrame:
    """D2: keep the first row per key in deterministic order.

    Implemented as ``min(struct(order_cols…, payload))`` aggregation
    rather than a window rank: the partial (map-side) aggregate collapses
    duplicates BEFORE the shuffle, so on a dup-heavy link batch the
    exchange carries one row per key instead of every candidate — the
    window variant shuffles and sorts everything. Ties on ``order_cols``
    break deterministically by the remaining columns (struct comparison
    is lexicographic), which is strictly more deterministic than
    ``row_number``'s arbitrary tie order. Payload columns must be
    orderable (no maps) — true for frontier/link rows.

    Physical note: a struct-with-strings min buffer forces SortAggregate
    (both sides of the exchange sort by key). A measured alternative —
    hash-agg ``min(order)`` + left-semi join for unique order keys — ran
    3× SLOWER end-to-end: Catalyst pushes the semi-join through the
    canonicalizer's fast/slow union, re-executing canonicalization per
    branch and planning SMJ sorts anyway. The map-side-combining
    SortAggregate is the right shape.

    Sort-prefix note: canonical URLs share a long common prefix
    ("https://…"), so Tungsten's 8-byte sort prefix never discriminates
    and every SortAggregate comparison falls through to a full string
    compare. Grouping by ``(xxhash64(keys), keys…)`` — identical
    equivalence classes, the hash is a pure function of the keys — makes
    the leading sort key a random long, so the radix/prefix comparator
    resolves almost every comparison (measured 32M rows × 16 cores:
    dedup stage 55.6 s → see BENCH notes).

    ``keep_hash=True`` keeps that hash as a ``_kh`` output column: the
    aggregate leaves the data hash-partitioned on ``(_kh, keys…)``, and a
    downstream ``anti_join_seen(..., hash_key=True)`` joining on the same
    composite reuses the partitioning — no extra exchange between dedup
    and the seen anti-join.

    ``strategy`` picks the physical shape by the batch's dup profile:

    * ``"agg"`` (default) — the map-side-combining min(struct) aggregate
      above. Right for DUP-HEAVY batches (in-crawl link expansions, where
      hot pages are linked from everywhere): partial aggregation collapses
      duplicates before the exchange.
    * ``"window"`` — ``row_number() over (partition by (hash, keys…)
      order by order_cols, payload…)`` + ``filter rn=1``. Right for
      UNIQUE-HEAVY batches (seed frontiers, post-dedup rounds): with few
      dups the partial aggregate collapses nothing, so the agg pays TWO
      full sorts (map-side partial + final) for nothing; the window pays
      ONE post-shuffle sort. Identical result — ties on ``order_cols``
      still break by the remaining columns because they extend the sort
      key, and the output partitioning is the same ``(_kh, keys…)``
      composite, so the anti-join exchange-reuse holds for both.
    """
    payload = [c for c in df.columns if c not in key_cols]
    kh = F.xxhash64(*[F.col(k) for k in key_cols]).alias("_kh")
    if strategy == "window":
        rest = [c for c in payload if c not in order_cols]
        w = Window.partitionBy("_kh", *key_cols).orderBy(*order_cols, *rest)
        head = ["_kh", *key_cols] if keep_hash else list(key_cols)
        return (
            df.select(kh, "*")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*head, *payload)
        )
    m = df.groupBy(kh, *[F.col(k) for k in key_cols]).agg(
        F.min(
            F.struct(
                *[F.col(c) for c in order_cols],
                F.struct(*[F.col(c) for c in payload]).alias("_row"),
            )
        ).alias("_m")
    )
    head = ["_kh", *key_cols] if keep_hash else list(key_cols)
    return m.select(*head, "_m._row.*")


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

    def annotate(self, batch: DataFrame, key_col: str) -> DataFrame:
        """Append ``_maybe_seen`` (the common prefilter interface)."""
        return batch.withColumn("_maybe_seen", self.probe_col(F.col(key_col)))


class ShardedBloomFilter:
    """Partitioned bloom prefilter — the 10^10-scale D1 path (SURVEY
    §7.5's sharded design; replaces the driver-sided bitmap the round-1
    VERDICT flagged).

    The bitmap lives as a DataFrame of ``(shard, bitmap: binary)`` rows —
    one shard per ``xxhash64(key) mod n_shards`` range — built and merged
    entirely as distributed ``applyInPandas`` aggregates. The driver
    never holds a bitmap, collects nothing, and no UDF closure captures
    one: probing cogroups the candidate batch with the shard table on the
    shard id, so each task sees exactly one shard's bytes (a shard-wise
    join). At 10^10 seen keys: 4096 shards × 16 MiB ≈ 64 GiB of filter,
    spread over the cluster — the same layout Iceberg/bucketed tables
    would give the seen set itself.

    Exactness contract unchanged: this is a PREFILTER. All-bits-set ⇒
    "maybe seen" ⇒ pay the exact anti-join; any-bit-clear ⇒ definitely
    new. Bit positions use the same JVM-side ``xxhash64(key, i)`` family
    as :class:`BloomPrefilter`, but modulo ``bits_per_shard`` within the
    key's shard (equivalent to a partitioned global bitmap).
    """

    def __init__(
        self,
        spark,
        num_bits: int = 1 << 23,
        num_hashes: int = 3,
        n_shards: int = 64,
    ):
        self.spark = spark
        self.n_shards = int(n_shards)
        # round bits-per-shard up to whole bytes
        bps = max(8, (int(num_bits) // self.n_shards + 7) // 8 * 8)
        self.bits_per_shard = bps
        self.num_hashes = int(num_hashes)
        self.shards: DataFrame | None = None   # (shard long, bitmap binary)
        self.fitted = False

    # -- internal ----------------------------------------------------------
    def _with_positions(self, df: DataFrame, key: str) -> DataFrame:
        cols = [F.pmod(F.xxhash64("_sb_shard", F.col(key), F.lit(i)),
                       F.lit(self.bits_per_shard)).alias(f"_sb_p{i}")
                for i in range(self.num_hashes)]
        return df.withColumn(
            "_sb_shard", F.pmod(F.xxhash64(F.col(key)), F.lit(self.n_shards))
        ).select("_sb_shard", *cols)

    def _build_delta(self, keys: DataFrame, key: str) -> DataFrame:
        """(shard, bitmap) rows for the shards touched by ``keys``."""
        nbytes = self.bits_per_shard // 8
        pos_cols = [f"_sb_p{i}" for i in range(self.num_hashes)]

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bitmap = np.zeros(nbytes, dtype=np.uint8)
            for c in pos_cols:
                p = pdf[c].to_numpy(dtype=np.int64)
                np.bitwise_or.at(bitmap, p >> 3, (1 << (p & 7)).astype(np.uint8))
            return pd.DataFrame({
                "shard": [int(pdf["_sb_shard"].iloc[0])],
                "bitmap": [bitmap.tobytes()],
            })

        return (
            self._with_positions(keys, key)
            .groupBy("_sb_shard")
            .applyInPandas(build, schema="shard long, bitmap binary")
        )

    def _materialize(self, shards: DataFrame) -> DataFrame:
        old = self.shards
        shards = shards.persist()
        shards.count()   # ≤ n_shards rows; breaks lineage across rounds
        if old is not None:
            old.unpersist()
        return shards

    # -- build -------------------------------------------------------------
    def fit(self, seen: DataFrame, key: str = "canon_url") -> "ShardedBloomFilter":
        self.shards = self._materialize(self._build_delta(seen, key))
        self.fitted = True
        return self

    def update(self, new_rows: DataFrame, key: str = "canon_url") -> None:
        delta = self._build_delta(new_rows, key)
        if self.shards is None:
            self.shards = self._materialize(delta)
            self.fitted = True
            return

        def or_reduce(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = np.bitwise_or.reduce(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["bitmap"]]
            )
            return pd.DataFrame({
                "shard": [int(pdf["shard"].iloc[0])],
                "bitmap": [acc.tobytes()],
            })

        merged = (
            self.shards.unionByName(delta)
            .groupBy("shard")
            .applyInPandas(or_reduce, schema="shard long, bitmap binary")
        )
        self.shards = self._materialize(merged)
        self.fitted = True

    # -- probe -------------------------------------------------------------
    def annotate(self, batch: DataFrame, key_col: str) -> DataFrame:
        """Append ``_maybe_seen`` via a shard-wise cogrouped probe: the
        batch shuffles on its shard id (uniform by construction) and each
        task tests its rows against exactly one shard bitmap with
        vectorized numpy bit lookups — no bitmap ever leaves the
        executors."""
        from pyspark.sql.types import StructField, StructType

        nh = self.num_hashes
        pos_cols = [f"_sb_p{i}" for i in range(nh)]
        probed = batch.withColumn(
            "_sb_shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(self.n_shards))
        )
        for i in range(nh):
            probed = probed.withColumn(
                f"_sb_p{i}",
                F.pmod(F.xxhash64("_sb_shard", F.col(key_col), F.lit(i)),
                       F.lit(self.bits_per_shard)),
            )
        out_schema = StructType(
            [f for f in probed.schema.fields if not f.name.startswith("_sb_")]
            + [StructField("_maybe_seen", BooleanType())]
        )
        keep = [f.name for f in probed.schema.fields
                if not f.name.startswith("_sb_")]

        def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0:
                return pd.DataFrame(columns=keep + ["_maybe_seen"])
            if len(right) == 0:
                res = np.zeros(len(left), dtype=bool)
            else:
                bitmap = np.frombuffer(right["bitmap"].iloc[0], dtype=np.uint8)
                res = np.ones(len(left), dtype=bool)
                for c in pos_cols:
                    p = left[c].to_numpy(dtype=np.int64)
                    res &= (bitmap[p >> 3] >> (p & 7)).astype(bool)
            out = left[keep].copy()
            out["_maybe_seen"] = res
            return out

        shards = self.shards
        if shards is None:
            return batch.withColumn("_maybe_seen", F.lit(False))
        return (
            probed.groupby("_sb_shard")
            .cogroup(shards.groupby("shard"))
            .applyInPandas(probe, schema=out_schema)
        )


def anti_join_seen(
    batch: DataFrame,
    seen: DataFrame,
    key_cols: list[str],
    bloom: "BloomPrefilter | ShardedBloomFilter | None" = None,
    bloom_key: str = "canon_url",
    shuffle_hash: bool = False,
    hash_key: bool = False,
) -> DataFrame:
    """D1: rows of ``batch`` whose key is NOT in ``seen`` (exact).

    With a fitted bloom prefilter (driver bitmap or sharded — both expose
    ``annotate``), definitely-new rows bypass the shuffle; the exact
    anti-join runs only on the maybe-seen remainder and the result is
    their union (no false drops possible).

    ``shuffle_hash=True`` hints the seen side into a shuffled-hash build:
    once both sides outgrow the planner's local-map threshold it falls to
    sort-merge, sorting BOTH relations — hashing the seen partition is
    strictly cheaper (measured 2.2-2.9× on the join at 4 and 16 cores)
    and spills gracefully. Leave False for small seen sets: the hint
    overrides the free broadcast-anti plan. The engine flips it once the
    cumulative seen count clears a threshold (known from round counters —
    no extra job); the cluster analog at 10^10 seen keys is a bucketed
    seen table, which keeps the same hash-build shape shuffle-free.

    ``hash_key=True`` joins on ``(xxhash64(keys), keys…)`` instead of the
    raw keys — the same equivalence classes (the hash is a pure function
    of the keys), but the composite matches the partitioning an upstream
    ``first_occurrence(..., keep_hash=True)`` leaves behind, so the batch
    side needs no new exchange; a batch already carrying ``_kh`` is used
    as-is. The output never contains ``_kh``.
    """
    join_cols = list(key_cols)
    seen_keys = seen.select(key_cols)
    if hash_key:
        kh = F.xxhash64(*[F.col(k) for k in key_cols]).alias("_kh")
        if "_kh" not in batch.columns:
            batch = batch.select(kh, "*")
        # a seen table that already carries _kh (e.g. persisted
        # pre-partitioned on (_kh, keys…)) joins without a new exchange;
        # otherwise compute the same pure-function hash on the fly
        if "_kh" in seen.columns:
            seen_keys = seen.select("_kh", *key_cols)
        else:
            seen_keys = seen_keys.select(kh, *key_cols)
        join_cols = ["_kh", *key_cols]
    if shuffle_hash:
        seen_keys = seen_keys.hint("shuffle_hash")
    if bloom is not None and bloom.fitted:
        probed = bloom.annotate(batch, bloom_key)
        definitely_new = probed.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        maybe = probed.filter(F.col("_maybe_seen")).drop("_maybe_seen")
        survived = maybe.join(seen_keys, join_cols, "left_anti")
        out = definitely_new.unionByName(survived)
    else:
        out = batch.join(seen_keys, join_cols, "left_anti")
    return out.drop("_kh") if hash_key else out
