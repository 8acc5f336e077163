"""Validation + dead-letter split (poison-record handling).

Reference analog: a failing page writes an ``{error}`` intermediate file
and the run continues (/root/reference/python/src/opengin/tracer/agents/
scanner.py:98-100); parse errors yield an error message + empty tables
(schema.py:95-100); the SSRF/URL-safety predicate rejects suspect urls
(cli.py:18-46).

Engine form: a `_valid`/`_reason` pair computed with JVM-side expressions
(codegen'd — validation must not drop out of whole-stage codegen for
rules expressible as Column ops), then one filter each way. Invalid rows
flow to a dead-letter table with their reason; valid rows continue. The
record always survives somewhere — a poison batch never kills the run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_OPS = ("I", "U", "D")
MAX_URL_LEN = 8192


def _url_ok() -> F.Column:
    """url scheme allowlist — the engine-side version of the reference's
    SSRF guard (only http(s) pages belong in a web-crawl change log).
    Built lazily: Column construction needs an active session, and this
    module also hosts session-free helpers (is_safe_path)."""
    return F.col("url").rlike(r"^https?://")


def validation_reason() -> F.Column:
    """NULL when the event is valid, else a short reason string."""
    return (
        F.when(F.col("url").isNull(), "null_url")
        .when(F.length("url") > MAX_URL_LEN, "url_too_long")
        .when(~_url_ok(), "bad_url_scheme")
        .when(F.col("seq").isNull() | (F.col("seq") < 0), "bad_seq")
        .when(F.col("warc_ts").isNull(), "null_ts")
        .when(~F.col("op").isin(*VALID_OPS), "bad_op")
        .when(
            (F.col("op") != "D") & F.col("html").isNull(), "null_html_on_upsert"
        )
        .otherwise(F.lit(None).cast("string"))
    )


def is_safe_path(base_path: str, target_path: str) -> bool:
    """Path-containment predicate (reference P9,
    /root/reference/python/src/opengin/server/api.py:235-249): True iff
    ``target_path``, after resolving symlinks and relative segments,
    lies inside ``base_path``. Used wherever the engine accepts a
    user-supplied filesystem location relative to a sandbox root —
    export packaging (plans/export.py::export_zip), dead-letter dirs,
    index paths — so a crafted `../` or symlink can never escape it.
    """
    import os as _os

    real_base = _os.path.realpath(base_path)
    real_target = _os.path.realpath(target_path)
    try:
        return _os.path.commonpath([real_base, real_target]) == real_base
    except ValueError:  # different drives / mixed abs-rel on some OSes
        return False


def split_dead_letter(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, dead) split. ``dead`` carries a `reason` column."""
    tagged = df.withColumn("_reason", validation_reason())
    valid = tagged.filter(F.col("_reason").isNull()).drop("_reason")
    dead = tagged.filter(F.col("_reason").isNotNull()).withColumnRenamed(
        "_reason", "reason"
    )
    return valid, dead
