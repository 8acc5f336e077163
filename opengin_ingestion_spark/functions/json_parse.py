"""LLM-response parsing operators (reference P1-P3 parity, Spark-native).

The reference strips ```json fences, parses JSON, normalizes shape (bare
list vs {"tables": [...]}) and captures parse errors without killing the
run (/root/reference/python/src/opengin/tracer/schema.py:68-100). Here the
same pipeline is Catalyst expressions: `regexp_replace` + `from_json` +
`coalesce` defaults; a failed parse yields null → routed to dead letters,
never an exception.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The reference's Table record (schema.py:12-29): all-string cells.
TABLE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("id", T.StringType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("columns", T.ArrayType(T.StringType()), True),
            T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType())), True),
            T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )
)

_FENCE_RE = r"(?s)^\s*```(?:json)?\s*(.*?)\s*```\s*$"


def strip_fences(col: Column | str) -> Column:
    """P1: remove ```json ... ``` fences if present (schema.py:68-73)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.rlike(r"^\s*```"), F.regexp_extract(c, _FENCE_RE, 1)
    ).otherwise(c)


def parse_tables(col: Column | str) -> Column:
    """P2: parse a response into the tables array, accepting either a bare
    JSON list or an object with a "tables" field (schema.py:75-93). A
    malformed response parses to null (P3 — error capture, not failure)."""
    c = strip_fences(col)
    as_obj = F.from_json(
        c, T.StructType([T.StructField("tables", TABLE_SCHEMA, True)])
    )
    as_list = F.from_json(c, TABLE_SCHEMA)
    return F.coalesce(as_obj["tables"], as_list)


def parse_responses(
    df: DataFrame, response_col: str = "raw_response"
) -> tuple[DataFrame, DataFrame]:
    """Parse a column of responses → (parsed, dead_letters).

    parsed: original columns + `tables` (non-null array).
    dead_letters: rows whose response failed to parse, with a reason —
    the record survives (scanner.py:98-100 semantics)."""
    tagged = df.withColumn("tables", parse_tables(response_col))
    ok = tagged.filter(F.col("tables").isNotNull())
    dead = tagged.filter(F.col("tables").isNull()).drop("tables").withColumn(
        "reason", F.lit("json_parse_error")
    )
    return ok, dead


def sanitize_name(col: Column | str) -> Column:
    """P6: filename sanitization — lower, spaces→_, keep [a-z0-9_-]
    (exporter.py:55-57)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(c)), r"\s+", "_"), r"[^a-z0-9_-]", ""
    )
