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


def test_resize_images_plumbing(media):
    from opengin_ingestion_spark.operators.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(media, 4, 3).collect()}
    assert len(out) == 5  # 1→1 rows, nulls preserved
    assert out[0]["width"] == 4 and out[0]["height"] == 3
    assert len(bytes(out[0]["payload"])) == 12
    assert out[4]["payload"] is None and out[4]["width"] is None
    # deterministic surrogate (stable across invocations)
    again = {r["media_id"]: r for r in resize_images(media, 4, 3).collect()}
    assert bytes(out[1]["payload"]) == bytes(again[1]["payload"])


def test_sample_frames_plumbing(media):
    from opengin_ingestion_spark.operators.multimodal import sample_frames

    rows = sample_frames(media, every_ms=500, max_frames=4).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    # null payload contributes no frames
    assert 4 not in by_id
    # media 2 has meta.duration_ms=1000 → min(4, 1000//500) = 2 frames
    assert len(by_id[2]) == 2
    f = sorted(by_id[2], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in f] == [0, 1]
    assert [r["ts_ms"] for r in f] == [0, 500]
    assert all(len(bytes(r["frame"])) == 256 for r in f)
    # no-duration media falls back to the deterministic payload-size rule
    assert len(by_id[3]) >= 1
    # per-frame payloads are distinct and deterministic
    assert bytes(f[0]["frame"]) != bytes(f[1]["frame"])
    again = sorted(
        (r for r in sample_frames(media, every_ms=500, max_frames=4).collect()
         if r["media_id"] == 2),
        key=lambda r: r["frame_idx"],
    )
    assert [bytes(r["frame"]) for r in again] == [bytes(r["frame"]) for r in f]
