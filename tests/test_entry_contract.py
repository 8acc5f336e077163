"""Replicates the driver's correctness gate locally: every oracle-backed
``queries()`` entry must match its ``oracle_sql()`` on row count, column
names, and EXACT values (order-insensitive) at sf0.01 — same bar as the
driver's value-hash."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _tz_kinds(pdf: pd.DataFrame) -> dict[str, bool]:
    """Per-column tz-awareness map for datetime columns. The driver's
    value-hash is tz-KIND-sensitive (a tz-aware dtype hashes differently
    from a naive one even when every instant agrees — round-3's
    cdc_replay_pages red cell), so the local gate must assert tz-kind
    parity BEFORE normalizing, exactly like the numeric-kind assert below."""
    out = {}
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            out[c] = getattr(pdf[c].dt, "tz", None) is not None
    return out


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            s = pd.to_datetime(pdf[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            pdf[c] = s
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


ORACLE_QUERIES = sorted(entry_mod.oracle_sql().keys())


def test_oracle_keys_subset_of_queries():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    spark_raw = q(spark, SF_DIR).toPandas()
    duck_raw = ddb.execute(entry_mod.oracle_sql()[name]).df()
    # tz-kind parity BEFORE normalization strips it (driver hash is
    # tz-kind-sensitive; see _tz_kinds)
    assert _tz_kinds(spark_raw) == _tz_kinds(duck_raw), (
        f"tz-awareness differs between Spark and oracle: "
        f"{_tz_kinds(spark_raw)} vs {_tz_kinds(duck_raw)} — the driver "
        "hash fails on this even when values agree; align the parquet "
        "fixture / oracle cast to naive timestamps"
    )
    spark_pdf = _normalize(spark_raw)
    duck_pdf = _normalize(duck_raw)
    assert list(spark_pdf.columns) == list(duck_pdf.columns), "column names differ"
    assert len(spark_pdf) == len(duck_pdf), "row counts differ"
    for c in spark_pdf.columns:
        a, b = spark_pdf[c], duck_pdf[c]
        # the driver's value-hash is dtype-insensitive across int WIDTHS but
        # NOT across numeric KIND: DuckDB HUGEINT (sum of BIGINT) lands in
        # pandas as float64/object and hashes differently from Spark's
        # bigint — that was round-1's doc_stats red cell. Replicate that.
        assert (a.dtype.kind in "iu") == (b.dtype.kind in "iu"), (
            f"column {c}: numeric kind differs ({a.dtype} vs {b.dtype}) — "
            "cast the oracle (e.g. CAST(sum(x) AS BIGINT)) or the query"
        )
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.array_equal(
                a.to_numpy(dtype="float64"), b.to_numpy(dtype="float64"),
                equal_nan=True,
            ), f"float column {c} differs (exact compare, like the driver hash)"
        else:
            pd.testing.assert_series_equal(a, b, check_dtype=False, check_names=False)


def test_tz_kind_gate_detects_drift():
    """The round-3 driver red cell: tz-aware vs naive timestamps with equal
    instants. _tz_kinds must distinguish them (the pre-r4 gate normalized
    both to naive and passed locally while the driver failed)."""
    naive = pd.DataFrame({"ts": pd.to_datetime(["2023-11-14T22:13:20"])})
    aware = pd.DataFrame(
        {"ts": pd.to_datetime(["2023-11-14T22:13:20"]).tz_localize("UTC")}
    )
    assert _tz_kinds(naive) == {"ts": False}
    assert _tz_kinds(aware) == {"ts": True}
    assert _tz_kinds(naive) != _tz_kinds(aware)
    # and normalization makes the VALUES equal — exactly the trap
    pd.testing.assert_frame_equal(_normalize(naive), _normalize(aware))


def test_changelog_fixture_is_tz_naive(tmp_path):
    """Driver-convention guard: the changelog generator must write naive
    timestamp[us] like /root/testdata (tz annotation ⇒ tz-aware DuckDB
    oracle dtype ⇒ driver hash mismatch)."""
    import pyarrow.parquet as pq

    from opengin_ingestion_spark.sources.changelog import (
        ChangeLogSpec,
        generate_changelog,
    )

    info = generate_changelog(
        str(tmp_path / "log"), ChangeLogSpec(n_events=60, n_urls=10, n_batches=2)
    )
    for f in info["files"]:
        field = pq.read_schema(f).field("warc_ts")
        assert field.type.tz is None, f"{f}: warc_ts must be tz-naive"
        assert str(field.type) == "timestamp[us]"


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a stable schema."""
    rows_only = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    for name in sorted(rows_only):
        df = entry_mod.queries()[name](spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"user_id", "last_type", "last_value", "last_ts"}
