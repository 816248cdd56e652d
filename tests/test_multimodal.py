"""Multimodal plumbing: schema, mapInPandas batch shape, decode stub."""

from __future__ import annotations

import pytest

from dedupe_algo_spark.multimodal import (
    decode_stub,
    extract_features,
    media_stats,
    synth_media,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x00\x01", "image/png")


def test_decode_stub_fake_is_deterministic():
    a = decode_stub(b"\x00\x01\x02\xff", "image/png", fake=True)
    b = decode_stub(b"\x00\x01\x02\xff", "image/png", fake=True)
    assert (a == b).all()
    assert a.sum() == 4 and len(a) == 16


def test_extract_features_end_to_end(spark):
    media = synth_media(spark, 60)
    feats = extract_features(media, fake=True).toPandas()
    assert len(feats) == 60
    assert set(feats["kind"]) == {"image", "audio", "video"}
    assert feats["feature"].map(len).eq(16).all()
    # histogram mass equals payload byte count
    assert (feats["feature"].map(sum) == feats["n_bytes"]).all()


def test_media_stats(spark):
    out = media_stats(synth_media(spark, 30)).toPandas()
    assert list(out["kind"]) == ["audio", "image", "video"]
    assert (out["n"] == 10).all()
