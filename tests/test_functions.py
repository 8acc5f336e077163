"""Unit tests for the vectorized extraction/detection functions —
determinism + engine-vs-oracle byte identity (the per-row invariant)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from opengin_ingestion_spark.functions.extract import (
    detect_lang_series,
    detect_lang_udf,
    extract_text_series,
    extract_text_udf,
)
from opengin_ingestion_spark.sources.changelog import make_html


def test_extract_text_basic():
    html = pd.Series(
        [
            b"<html><head><title>T</title><script>x</script></head>"
            b"<body><p>hello &amp; world</p>\n\n<div>bye</div></body></html>",
            None,
            b"plain no tags",
        ],
        dtype=object,
    )
    out = extract_text_series(html)
    assert out[0] == "T hello & world bye"
    assert out[1] is None
    assert out[2] == "plain no tags"


def test_extract_text_deterministic():
    htmls = pd.Series([make_html(f"https://x.com/{i}", i) for i in range(50)], dtype=object)
    a = extract_text_series(htmls)
    b = extract_text_series(htmls)
    assert (a == b).all()
    # no leading/trailing/duplicated whitespace survives
    assert all("  " not in t and t == t.strip() for t in a)


def test_detect_lang():
    s = pd.Series(
        [
            "the cat is in the house and it is warm",
            "der Hund ist nicht mit der Katze",
            "le chat est dans la maison pour que",
            "zzz qqq xxx",
            None,
        ]
    )
    out = detect_lang_series(s)
    assert list(out[:4]) == ["en", "de", "fr", "und"]
    assert out[4] is None


def test_udf_matches_series_byte_identical(spark):
    """Engine pandas UDF output must be byte-identical to the oracle series
    function on the same HTML (BASELINE.json input_hint invariant)."""
    rows = [(f"https://s.com/{i}", make_html(f"https://s.com/{i}", i)) for i in range(200)]
    df = spark.createDataFrame(rows, ["url", "html"])
    got = (
        df.withColumn("text", extract_text_udf("html"))
        .withColumn("lang", detect_lang_udf("text"))
        .orderBy("url")
        .toPandas()
    )
    expected_text = extract_text_series(pd.Series([r[1] for r in sorted(rows)], dtype=object))
    expected_lang = detect_lang_series(expected_text)
    assert list(got["text"]) == list(expected_text)
    assert list(got["lang"]) == list(expected_lang)


def test_udf_is_arrow_vectorized(spark):
    """The plan must use ArrowEvalPython (vectorized), not BatchEvalPython
    (per-row) — 'no per-row Python' is a spec rule."""
    df = spark.range(10).withColumn("h", F.lit(b"<p>x</p>"))
    plan = df.withColumn("t", extract_text_udf("h"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
