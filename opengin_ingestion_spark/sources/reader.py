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
    """Widened Spark type for one Arrow field (ints → long, float/double →
    double — the widening upcasts Spark 4's Parquet reader performs on
    read, so a file of the narrower physical type reads cleanly under the
    widened schema and is NOT schema drift).

    Arrow types OUTSIDE the widening map raise: this function is the
    era/drift identity (schema_sig), and a silent fallback (e.g. → string)
    would collapse two incompatible eras of such a column into one
    signature — infer_log_schema could not fail fast and the drift
    supervisor could not see the change, surfacing instead as a raw
    Parquet cast error mid-batch with no recovery direction."""
    st = str(field.type)
    if st in ("int8", "int16", "int32", "int64"):
        return T.LongType()
    if st in ("string", "large_string"):
        return T.StringType()
    if st in ("binary", "large_binary"):
        return T.BinaryType()
    if st.startswith("timestamp"):
        return T.TimestampType()
    if st in ("double", "float", "halffloat"):
        return T.DoubleType()
    if st == "bool":
        return T.BooleanType()
    if st == "date32[day]":
        return T.DateType()
    raise ValueError(
        f"change-log column '{field.name}' has Arrow type {st}, which is "
        "outside the widening map — cast it upstream (SchemaMapping) to a "
        "supported type (int/float/string/binary/bool/date/timestamp)"
    )


def schema_sig(arrow_schema) -> frozenset[tuple[str, str]]:
    """Signature of an Arrow schema under the widening map —
    {(name, widened_spark_type)}. Two files with equal signatures are the
    same schema era; a signature not covered by the stream's pinned schema
    is drift (streaming/tail.py supervisor)."""
    return frozenset(
        (f.name, arrow_field_spark_type(f).simpleString()) for f in arrow_schema
    )


def file_schema_sig(path: str) -> frozenset[tuple[str, str]]:
    """Footer-peek signature of one Parquet file (see schema_sig)."""
    return schema_sig(pq.read_schema(path))


def infer_log_schema(log_dir: str) -> T.StructType:
    """Union the physical schemas in the log into the widest Spark schema.

    One driver-side footer read per file (the footer is needed to know a
    file's era at all), but era PROCESSING is O(#eras): files whose
    (name, widened type) signature was already seen contribute nothing.
    Era identity includes TYPES — a type-only era change (same column
    names, e.g. string→binary) must not be silently skipped.

    Eras that conflict beyond the widening map (int→long, float→double —
    the upcasts Spark 4's Parquet reader performs) raise: reading a
    double-era file under a long schema would fail at scan time anyway,
    so fail fast with direction (apply a SchemaMapping cast upstream).
    """
    fields: dict[str, T.StructField] = {}
    seen_sigs: set[frozenset] = set()
    for f in sorted(os.listdir(log_dir)):
        if not f.endswith(".parquet"):
            continue
        arrow = pq.read_schema(os.path.join(log_dir, f))
        sig = schema_sig(arrow)
        if sig in seen_sigs:
            continue
        seen_sigs.add(sig)
        for field in arrow:
            spark_t = arrow_field_spark_type(field)
            prev = fields.get(field.name)
            if prev is None:
                fields[field.name] = T.StructField(field.name, spark_t, True)
            elif prev.dataType != spark_t:
                raise ValueError(
                    f"incompatible schema eras in {log_dir} for column "
                    f"'{field.name}': {prev.dataType.simpleString()} vs "
                    f"{spark_t.simpleString()} (file {f}) — no widening "
                    "covers this; map the upstream era onto one type with "
                    "a SchemaMapping cast"
                )
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
