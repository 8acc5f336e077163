"""Multimodal plumbing tests: schema, mapInPandas batch shape, mime sniff,
deterministic fake features, codec stub gating."""

from __future__ import annotations

import pytest

from opengin_ingestion_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    fake_feature,
    media_metadata,
    real_decode,
    sniff_mime,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", b"\x89PNG\r\n" + b"x" * 100, ("image/png", 106, 10, 10, None)),
        (1, "image", b"\xff\xd8\xff\xe0" + b"y" * 50, ("image/jpeg", 54, 8, 8, None)),
        (2, "audio", b"RIFF" + b"z" * 200, ("audio/wav", 204, None, None, 1000)),
        (3, "video", b"\x00\x00\x00 ftyp" + b"q" * 10, (None, 18, None, None, None)),
        (4, "image", None, (None, None, None, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_sniff_mime():
    assert sniff_mime(b"\x89PNGxxxx") == "image/png"
    assert sniff_mime(b"\xff\xd8\xff\xe0") == "image/jpeg"
    assert sniff_mime(b"RIFFdata") == "audio/wav"
    assert sniff_mime(b"weird") == "application/octet-stream"
    assert sniff_mime(None) is None


def test_media_metadata(media):
    out = {r["media_id"]: r for r in media_metadata(media).collect()}
    assert out[0]["mime"] == "image/png" and out[0]["payload_bytes"] == 106
    assert out[2]["mime"] == "audio/wav"
    assert out[4]["mime"] is None and out[4]["payload_bytes"] is None


def test_fake_features_deterministic(media):
    a = {r["media_id"]: r for r in extract_media_features(media, fake=True).collect()}
    b = {r["media_id"]: r for r in extract_media_features(media, fake=True).collect()}
    for mid in a:
        assert a[mid]["sha256"] == b[mid]["sha256"]
        assert a[mid]["feature"] == b[mid]["feature"]
    assert a[4]["feature"] is None  # null payload → null feature
    assert len(a[0]["feature"]) == 16
    # matches the driver-side pure function
    import hashlib

    assert a[0]["sha256"] == hashlib.sha256(b"\x89PNG\r\n" + b"x" * 100).hexdigest()
    assert a[0]["feature"] == pytest.approx(fake_feature(b"\x89PNG\r\n" + b"x" * 100).tolist())


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        real_decode(b"x", "image")
