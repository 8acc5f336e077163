"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A web-scale training pipeline carries images/audio/video as opaque
``binary`` columns with a typed metadata struct, processed by Arrow-batched
``mapInPandas`` stages. The image/audio codec libraries are NOT in this
container, so the decode kernel is stubbed (deterministic fake behind a
flag, NotImplementedError otherwise) — but the Spark-side plumbing is real
and tested: schema, batch iteration shape, partition-preserving map, and
metadata extraction that needs no codec (magic-byte sniffing, sizes).

Reference analog: the reference also treats its payload (PDF bytes) as an
opaque blob handed to an external extractor
(/root/reference/python/src/opengin/tracer/services/gemini.py:44-66).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("bytes", T.LongType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"OggS": "audio/ogg",
}


def sniff_mime(payload: bytes | None) -> str | None:
    if not payload:
        return None
    for magic, mime in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


def real_decode(payload: bytes, kind: str):  # pragma: no cover - env-gated
    """The codec hook. Plug in PIL/torchaudio/pyav where available."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "use fake=True for the deterministic stub"
    )


def fake_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature: seeded from the payload digest —
    stable across processes, so tests can assert end-to-end."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])
    return rng.standard_normal(dim).astype(np.float32)


def extract_media_features(
    df: DataFrame, fake: bool = True, dim: int = 16
) -> DataFrame:
    """mapInPandas feature-extraction stage: binary payload → (sha256,
    feature vector). Arrow-batched; one pandas frame per batch, never
    per-row Python at the Spark level."""

    from opengin_ingestion_spark.operators.salt import ensure_min_parallelism

    df = ensure_min_parallelism(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            sha = payloads.map(
                lambda b: None if b is None else hashlib.sha256(bytes(b)).hexdigest()
            )
            if fake:
                feats = payloads.map(
                    lambda b: None if b is None else fake_feature(bytes(b), dim).tolist()
                )
            else:  # pragma: no cover - env-gated
                feats = payloads.map(
                    lambda b: None if b is None else real_decode(bytes(b), "image")
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "sha256": sha, "feature": feats}
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _fake_bytes(payload: bytes, n: int, salt: bytes = b"") -> bytes:
    """Deterministic surrogate bytes derived from the payload digest — the
    clearly-marked stand-in for a codec's output (stable across processes,
    so plumbing tests can assert exact values)."""
    out = bytearray()
    h = hashlib.sha256(payload + salt).digest()
    while len(out) < n:
        out.extend(h)
        h = hashlib.sha256(h).digest()
    return bytes(out[:n])


def resize_images(
    df: DataFrame, width: int = 64, height: int = 64, fake: bool = True
) -> DataFrame:
    """Image resize stage: payload → resized payload + target dimensions.

    Plumbing is real (Arrow-batched mapInPandas, 1→1 rows, binary in/out,
    null-safe); the pixel kernel is the env-gated codec hook — ``fake``
    emits a deterministic ``width×height``-byte surrogate so the stage is
    testable end-to-end without PIL in this container."""
    from opengin_ingestion_spark.operators.salt import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    n_bytes = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                resized = pdf["payload"].map(
                    lambda b: None if b is None else _fake_bytes(bytes(b), n_bytes, b"resize")
                )
            else:  # pragma: no cover - env-gated
                resized = pdf["payload"].map(
                    lambda b: None if b is None else real_decode(bytes(b), "image")
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": resized,
                    "width": np.where(pdf["payload"].isna(), None, width),
                    "height": np.where(pdf["payload"].isna(), None, height),
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    frame_bytes: int = 256,
    fake: bool = True,
) -> DataFrame:
    """Video frame sampling: one input row → N frame rows (media_id,
    frame_idx, ts_ms, frame payload) — the 1→N mapInPandas shape a video
    pipeline needs (the Spark-side contract: exploded cardinality, stable
    per-frame keys, bounded by ``max_frames``).

    Frame count comes from ``meta.duration_ms`` when present, else a
    deterministic function of the payload size; the frame decode kernel is
    the same env-gated codec hook as everywhere (``fake`` emits
    digest-derived surrogate frames)."""
    from opengin_ingestion_spark.operators.salt import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    has_meta = "meta" in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            durations = (
                pdf["meta"].map(
                    lambda m: None if m is None else m.get("duration_ms")
                )
                if has_meta
                else pd.Series([None] * len(pdf))
            )
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], durations
            ):
                if payload is None:
                    continue
                b = bytes(payload)
                dur_ms = int(dur) if dur is not None else (len(b) % 7 + 1) * every_ms
                n = min(max_frames, max(1, dur_ms // every_ms))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    if fake:
                        frames.append(
                            _fake_bytes(b, frame_bytes, f"frame{i}".encode())
                        )
                    else:  # pragma: no cover - env-gated
                        frames.append(real_decode(b, "video"))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Codec-free metadata: mime (magic bytes) + payload size. Vectorized
    pandas UDF for the sniff, built-ins for the rest."""
    from opengin_ingestion_spark.operators.salt import ensure_min_parallelism

    df = ensure_min_parallelism(df)  # same guard as the sibling operators

    @F.pandas_udf(T.StringType())
    def mime_udf(payload: pd.Series) -> pd.Series:
        return payload.map(lambda b: sniff_mime(None if b is None else bytes(b)))

    return df.select(
        "media_id",
        "kind",
        mime_udf(F.col("payload")).alias("mime"),
        F.length(F.col("payload")).cast("long").alias("payload_bytes"),
    )
