"""Similarity search over embedding columns (`array<float>`).

The reference has no vector search; this is part of the training-data
pipeline surface this engine adds on top of the crawl semantics (the
crawled corpus feeds dedup + retrieval). Three tiers, all built from
native higher-order functions (``zip_with``/``aggregate`` stay inside the
JVM; no Python in the hot path):

* **Brute-force cosine top-k** — the exact baseline: broadcast the query
  vector, score every row, rank. O(n·d) work but a single narrow stage —
  on a cluster it scans partition-parallel with no shuffle before the
  final top-k.
* **Sign-LSH bucketing** — random-hyperplane LSH with ±1 hyperplanes
  derived deterministically from md5 (engine-neutral, so a SQL oracle can
  re-derive them): ``bit_p = sign(Σ_d w[p][d]·x[d])``. Near vectors agree
  on most bits; the bucket key (first ``n_planes`` bits) turns an O(n²)
  near-dup pair search into a groupBy — the shuffle moves only
  (bucket, id) pairs, never the vectors.
* **IVF (inverted-file) partitioning** — coarse-quantize each vector to
  its nearest of K centroids; a top-k query probes only its own cell
  (``n/K`` of the data). Centroid assignment is a broadcast cross-join of
  K small vectors against the table — no shuffle of the big side.

At 100 TB: the LSH bucket key and IVF cell id are *partition columns* for
the stored table, so probes become partition-pruned scans.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sign_weight(plane: int, dim: int) -> int:
    """Deterministic ±1 hyperplane weight — parity of the first hex digit
    of md5("p{plane}d{dim}"). Pure function of (plane, dim); identical in
    any engine with md5."""
    h = hashlib.md5(f"p{plane}d{dim}".encode()).hexdigest()
    return 1 if int(h[0], 16) >= 8 else -1


def dot(a, b):
    """<a, b> via zip_with + aggregate (native, codegen-friendly)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a, b):
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(emb: DataFrame, query: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine vs a single-row ``query`` (column ``qv``)."""
    scored = emb.crossJoin(F.broadcast(query)).select(
        id_col, F.round(cosine(F.col(vec_col), F.col("qv")), 6).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def lsh_sign_bits(emb: DataFrame, n_planes: int, dim: int,
                  vec_col: str = "embedding") -> DataFrame:
    """Append ``bucket`` — the ``n_planes``-bit sign-LSH key as a string
    of 0/1 (MSB = plane 0). Weights are literal ±1 arrays broadcast in
    the plan; the projection is zip_with/aggregate, fully JVM-side."""
    bits = []
    for p in range(n_planes):
        w = F.array(*[F.lit(sign_weight(p, d)) for d in range(dim)])
        proj = dot(F.col(vec_col), w)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return emb.withColumn("bucket", F.concat(*bits))


def lsh_candidate_buckets(emb: DataFrame, n_planes: int, dim: int,
                          id_col: str = "vec_id") -> DataFrame:
    """Near-dup candidate groups: buckets holding >1 vector."""
    return (
        lsh_sign_bits(emb, n_planes, dim)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"), F.min(id_col).alias("min_vec_id"))
        .filter(F.col("n_vecs") > 1)
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (ties → lowest
    centroid id). ``centroids``: (cent_id, cv). Broadcast cross-join +
    max_by — the big side never shuffles."""
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        id_col,
        "cent_id",
        F.round(cosine(F.col(vec_col), F.col("cv")), 9).alias("sim"),
    )
    return scored.groupBy(id_col).agg(
        F.expr("max_by(cent_id, (sim, -cent_id))").alias("cell")
    )


def deterministic_centroids(emb: DataFrame, k: int,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """First-K-vectors centroid seed (deterministic; stands in for a
    k-means fit, which at scale would be a sampled iterative job)."""
    return (
        emb.filter(F.col(id_col) < k)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cv"))
    )


def lsh_weights_sql_literal(n_planes: int, dim: int) -> str:
    """DuckDB list-literal of the same ±1 weights, for oracle SQL."""
    rows = [
        "[" + ",".join(str(sign_weight(p, d)) for d in range(dim)) + "]"
        for p in range(n_planes)
    ]
    return "[" + ",".join(rows) + "]"
