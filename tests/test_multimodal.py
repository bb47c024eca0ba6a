"""Multimodal binary-column plumbing: payload determinism, mapInPandas
decode stage (stub decode), frame sampling, resize planning."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from crawler_service_spark.operators.multimodal import (
    attach_fake_media,
    decode_features,
    fake_bytes_oracle,
    frame_sample,
    resize_plan,
)


def _docs(spark):
    rows = [(i, f"document number {i} body text") for i in range(30)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_payload_matches_python_oracle(spark):
    media = attach_fake_media(_docs(spark))
    for r in media.orderBy("media_id").limit(5).collect():
        expected = fake_bytes_oracle(f"document number {r['media_id']} body text")
        assert bytes(r["media_bytes"]) == expected
        assert r["kind"] in ("image", "audio", "video")


def test_decode_features_stub(spark):
    media = attach_fake_media(_docs(spark))
    feats = {r["media_id"]: r for r in decode_features(media, allow_fake=True).collect()}
    assert len(feats) == 30
    for mid, r in feats.items():
        data = fake_bytes_oracle(f"document number {mid} body text")
        arr = np.frombuffer(data, dtype=np.uint8)
        assert r["n_bytes"] == 64
        assert r["byte_mean"] == pytest.approx(arr.mean(), abs=1e-6)
        counts = np.bincount(arr, minlength=256).astype(float)
        p = counts[counts > 0] / arr.size
        assert r["byte_entropy"] == pytest.approx(-(p * np.log2(p)).sum(), abs=1e-6)
        assert r["decoder"] == "stub"


def test_decode_without_codec_raises(spark):
    media = attach_fake_media(_docs(spark)).filter(F.col("kind") == "image")
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_features(media, allow_fake=False).collect()


def test_frame_sample(spark):
    media = attach_fake_media(_docs(spark))
    frames = frame_sample(media, every_n=5).collect()
    assert frames, "some docs must be videos"
    for r in frames:
        assert r["frame_idx"] % 5 == 0
        assert r["frame_idx"] < r["n_frames"]


def test_resize_plan_clamps_long_side(spark):
    media = attach_fake_media(_docs(spark))
    for r in resize_plan(media, max_dim=32).collect():
        assert max(r["target_w"], r["target_h"]) <= 32
        assert r["target_w"] >= 1 and r["target_h"] >= 1
        if max(r["width"], r["height"]) <= 32:
            assert (r["target_w"], r["target_h"]) == (r["width"], r["height"])
