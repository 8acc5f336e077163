"""Change-log readers: batch replay + Structured Streaming tail.

Reference analog: the per-page sequential consumption loop
(/root/reference/python/src/opengin/tracer/agents/scanner.py:55-72) becomes
a partitioned Parquet file source. Bounded replay uses ``spark.read`` (or a
stream with ``Trigger.AvailableNow``); live tailing uses
``spark.readStream`` with ``maxFilesPerTrigger``.

Schema handling: the log may contain multiple physical schema eras
(pre/post evolution — see sources/changelog.py). Spark 4's Parquet reader
performs widening upcasts (int32→int64) and missing-column null-fill when
given the latest schema, verified in tests/test_reader.py — so one
``.schema(latest)`` read covers the whole log, with filters and column
pruning still pushed to the scan.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Latest logical schema of the change log (schema v2 of changelog.py).
CHANGES_SPARK_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("content_len", T.LongType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def arrow_field_spark_type(field) -> T.DataType:
    """Widened Spark type for one Arrow field (int32/int64 → long,
    float/double → double — the widening upcasts Spark 4's Parquet reader
    performs on read, so a file of the narrower physical type reads cleanly
    under the widened schema and is NOT schema drift)."""
    st = str(field.type)
    if st in ("int32", "int64"):
        return T.LongType()
    if st in ("string", "large_string"):
        return T.StringType()
    if st in ("binary", "large_binary"):
        return T.BinaryType()
    if st.startswith("timestamp"):
        return T.TimestampType()
    if st in ("double", "float"):
        return T.DoubleType()
    return T.StringType()


def file_schema_sig(path: str) -> frozenset[tuple[str, str]]:
    """Footer-peek signature of one Parquet file under the widening map —
    {(name, widened_spark_type)}. Two files with equal signatures are the
    same schema era; a signature not covered by the stream's pinned schema
    is drift (streaming/tail.py supervisor)."""
    schema = pq.read_schema(path)
    return frozenset(
        (f.name, arrow_field_spark_type(f).simpleString()) for f in schema
    )


def infer_log_schema(log_dir: str) -> T.StructType:
    """Union the physical schemas in the log into the widest Spark schema.

    Driver-side footer peek at ONE file per distinct schema signature —
    at scale the log's schema eras are few (schema changes are rare events),
    so this stays O(#eras), not O(#files): we stop reading footers once a
    file matches an already-seen column signature.
    """
    fields: dict[str, T.StructField] = {}
    seen_sigs: set[frozenset] = set()
    for f in sorted(os.listdir(log_dir)):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(log_dir, f)
        # era identity must include TYPES: a type-only era change (same
        # column names, e.g. string→binary) would otherwise never be
        # footer-peeked and the union schema could silently miss it
        sig = file_schema_sig(path)
        if sig in seen_sigs:
            continue
        seen_sigs.add(sig)
        for field in pq.read_schema(path):
            spark_t = arrow_field_spark_type(field)
            if field.name not in fields:
                fields[field.name] = T.StructField(field.name, spark_t, True)
            elif isinstance(spark_t, T.LongType):
                fields[field.name] = T.StructField(field.name, T.LongType(), True)
    return T.StructType(list(fields.values()))


def read_changelog(
    spark: SparkSession, log_dir: str, schema: T.StructType | None = None
) -> DataFrame:
    """Batch replay read of the whole change log."""
    return spark.read.schema(schema or infer_log_schema(log_dir)).parquet(log_dir)


def read_changelog_stream(
    spark: SparkSession,
    log_dir: str,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured Streaming tail over the change-log directory.

    ``maxFilesPerTrigger`` bounds micro-batch size (the scale knob: on a
    real cluster you'd size it so a micro-batch's shuffle fits memory).
    """
    reader = spark.readStream.schema(schema or infer_log_schema(log_dir))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # latestFirst stays False: replay in arrival order (LWW makes order
    # irrelevant for correctness, but in-order keeps lag metrics meaningful)
    return reader.parquet(log_dir)
