"""Multimodal plumbing tests: schema shape, Arrow batch flow,
1→N frame fan-out, and determinism of the stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import multimodal as MM
from aoseventstreamer_spark.session import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return MM.attach_binary_payload(docs).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert dict(media.dtypes)["payload"] == "binary"


def test_feature_extraction(media):
    feats = MM.extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:5]:
        assert len(r.feat) == 8
        assert abs(sum(r.feat) - 1.0) < 1e-6  # normalized histogram
        assert len(r.checksum) == 32


def test_feature_extraction_deterministic(media):
    a = {r.media_id: r.checksum for r in MM.extract_image_features(media).collect()}
    b = {r.media_id: r.checksum for r in MM.extract_image_features(media).collect()}
    assert a == b


def test_frame_sampling_fan_out(media):
    frames = MM.sample_frames(media, every_n_bytes=64, max_frames=4)
    per_doc = frames.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per_doc)
    # long docs produce multiple frames
    assert any(r["count"] > 1 for r in per_doc)


def test_stub_decode_raises_on_empty():
    with pytest.raises(NotImplementedError):
        MM._stub_decode_image(b"")
