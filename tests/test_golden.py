"""Golden-snapshot regression: recorded expected outputs, re-recordable via
``UPDATE_GOLDEN_DATA=1`` — the reference's golden-replay workflow
(/root/reference/python/integration_tests/test_cli_integration.py:43-66,
DEVELOPER.md:151-159) adapted to this engine.

Two golden families:

* **Oracle snapshots** — the DuckDB oracle result of every oracled contract
  query at sf0.01, recorded to ``tests/golden/oracle/*.parquet``. The
  live-recomputed oracle is compared against the recording, so drift in the
  oracle itself (an edited SQL string, a DuckDB semantics change) is caught
  instead of silently re-baselining the correctness gate.
* **Replay snapshot** — the engine's final `pages` state for a fixed
  ChangeLogSpec, recorded to ``tests/golden/replay_final_state.parquet``.
  Catches any change to generator/extract/LWW/merge semantics, independent
  of the in-process pandas oracle (which would drift WITH a shared bug).

Re-record intentionally:  UPDATE_GOLDEN_DATA=1 python -m pytest tests/test_golden.py
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tests.test_entry_contract import _normalize  # same normal form as the gate

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
ORACLE_DIR = os.path.join(GOLDEN_DIR, "oracle")
SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
UPDATE = os.environ.get("UPDATE_GOLDEN_DATA") == "1"


def _check_or_record(got: pd.DataFrame, path: str, name: str) -> None:
    got = _normalize(got)
    if UPDATE:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        got.to_parquet(path, index=False)
        return
    # a missing golden is a FAILURE, not a record-and-skip: otherwise a new
    # query whose golden was never committed passes CI forever uncompared
    assert os.path.exists(path), (
        f"no golden recorded for {name} — run UPDATE_GOLDEN_DATA=1 "
        "python -m pytest tests/test_golden.py and commit tests/golden/"
    )
    want = _normalize(pd.read_parquet(path))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_oracle_matches_golden(ddb, name):
    got = ddb.execute(entry_mod.oracle_sql()[name]).df()
    _check_or_record(got, os.path.join(ORACLE_DIR, f"{name}.parquet"), name)


# the two legitimately non-SQL-expressible queries (Spark-internal
# murmur3/xxhash64 signatures): their PAIR SETS at sf0.01 are small and
# fully deterministic, so a golden snapshot closes the rows-only gap — a
# silent signature regression can no longer ship behind a rows-only check.
ROWS_ONLY_GOLDEN = ["minhash_neardup", "simhash_neardup"]


@pytest.mark.parametrize("name", ROWS_ONLY_GOLDEN)
def test_rows_only_pairs_match_golden(spark, name):
    got = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    _check_or_record(
        got, os.path.join(GOLDEN_DIR, "rows_only", f"{name}.parquet"), name
    )


def test_replay_final_state_matches_golden(spark, tmp_path):
    from opengin_ingestion_spark.plans.replay import replay_changelog
    from opengin_ingestion_spark.sources.changelog import (
        ChangeLogSpec,
        generate_changelog,
    )

    d = str(tmp_path / "log")
    generate_changelog(
        d, ChangeLogSpec(n_events=3_000, n_urls=250, n_batches=6, seed=1234)
    )
    table, _ = replay_changelog(spark, d, str(tmp_path / "pages"), n_buckets=16)
    got = table.read().toPandas()
    got["html"] = got["html"].map(lambda b: None if b is None else bytes(b))
    _check_or_record(
        got, os.path.join(GOLDEN_DIR, "replay_final_state.parquet"), "replay"
    )
