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


def media_metadata(df: DataFrame) -> DataFrame:
    """Codec-free metadata: mime (magic bytes) + payload size. Vectorized
    pandas UDF for the sniff, built-ins for the rest."""

    @F.pandas_udf(T.StringType())
    def mime_udf(payload: pd.Series) -> pd.Series:
        return payload.map(lambda b: sniff_mime(None if b is None else bytes(b)))

    return df.select(
        "media_id",
        "kind",
        mime_udf(F.col("payload")).alias("mime"),
        F.length(F.col("payload")).cast("long").alias("payload_bytes"),
    )
