"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake decode."""

from __future__ import annotations

import pytest

from dedup.ops.multimodal import (
    _FEATURE_DIM,
    _decode_fake,
    _decode_real,
    extract_features,
    media_dedup_by_payload,
    synthesize_media,
)

SF_DIR = "/root/testdata/sf0.001"


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_real(b"xx", "image")


def test_fake_decode_deterministic():
    a = _decode_fake(b"payload", "image")
    b = _decode_fake(b"payload", "image")
    c = _decode_fake(b"payload", "audio")  # kind participates in the hash
    assert (a == b).all()
    assert not (a == c).all()
    assert a.shape == (_FEATURE_DIM,)
    assert a.dtype.name == "float64"  # double: exact cross-engine value-hash parity


def test_extract_features_plumbing(spark):
    media = synthesize_media(spark, SF_DIR)
    feats = extract_features(media, fake=True, batch_partitions=4)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert len(r["feature"]) == _FEATURE_DIM
        assert r["payload_bytes"] > 0
        assert r["kind"] in ("image", "audio", "video")
    # determinism across runs
    again = {r["media_id"]: r["feature"] for r in extract_features(
        media, fake=True).collect()}
    for r in rows[:20]:
        assert again[r["media_id"]] == r["feature"]


def test_media_dedup_matches_doc_identity(spark):
    media = synthesize_media(spark, SF_DIR)
    out = media_dedup_by_payload(media).toPandas()
    # driver documents are all-distinct -> every media is its own canonical
    assert out.is_canonical.all()
    assert (out.media_id == out.cluster_id).all()
