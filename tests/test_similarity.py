"""Similarity-search operators: exact top-k, sign-LSH bucketing, IVF."""

import math

from pyspark.sql import functions as F

from crawler_service_spark.operators.similarity import (
    cosine_topk,
    deterministic_centroids,
    ivf_assign,
    lsh_candidate_buckets,
    lsh_sign_bits,
    sign_weight,
)


def _vecs(spark, n=40, dim=8):
    rows = []
    for i in range(n):
        # deterministic pseudo-vectors; pairs (2k, 2k+1) are identical → near-dups
        base = i // 2
        v = [math.sin(base * 7.3 + d) for d in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_self_first(spark):
    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") == 4).select(F.col("embedding").alias("qv"))
    top = cosine_topk(emb, q, k=3).collect()
    # vec 4 and its twin vec 5 are identical → cos 1.0, lowest ids first
    assert [r["vec_id"] for r in top[:2]] == [4, 5]
    assert top[0]["cos"] == 1.0


def test_lsh_identical_vectors_share_bucket(spark):
    emb = _vecs(spark)
    bits = {r["vec_id"]: r["bucket"] for r in lsh_sign_bits(emb, 6, 8).collect()}
    for k in range(0, 40, 2):
        assert bits[k] == bits[k + 1]
    cands = lsh_candidate_buckets(emb, 6, 8).collect()
    assert all(r["n_vecs"] > 1 for r in cands)
    assert len(cands) >= 1


def test_sign_weight_deterministic():
    assert sign_weight(0, 0) == sign_weight(0, 0)
    vals = {sign_weight(p, d) for p in range(4) for d in range(16)}
    assert vals == {-1, 1}


def test_ivf_assign_matches_bruteforce(spark):
    emb = _vecs(spark)
    cents = deterministic_centroids(emb, 4)
    cells = {r["vec_id"]: r["cell"] for r in ivf_assign(emb, cents).collect()}
    # brute force in python
    data = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    for vid, v in data.items():
        sims = [(round(cos(v, data[c]), 9), -c) for c in range(4)]
        best = max(range(4), key=lambda c: (sims[c][0], -c))
        assert cells[vid] == best, (vid, cells[vid], best)
