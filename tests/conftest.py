"""Shared fixtures: one SparkSession for the whole test run (JVM spin-up is
~10s; reuse mirrors the reference's session-scoped fixtures,
/root/reference/python/tests/conftest.py:6-32)."""

from __future__ import annotations

import pytest

from opengin_ingestion_spark.session import get_spark
from opengin_ingestion_spark.sources.changelog import ChangeLogSpec, generate_changelog


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def tiny_log(tmp_path_factory):
    """Tiny deterministic change log (FIXTURES.md F5 'tiny'): 4k events,
    400 urls, 8 batches, no evolution."""
    d = str(tmp_path_factory.mktemp("log_tiny") / "changes")
    spec = ChangeLogSpec(n_events=4_000, n_urls=400, n_batches=8, seed=42)
    info = generate_changelog(d, spec)
    return {"dir": d, "spec": spec, **info}


@pytest.fixture(scope="session")
def evolving_log(tmp_path_factory):
    """Change log whose schema evolves at batch 4: +lang, content_len
    int32→int64 (FIXTURES.md F2 evolution schedule)."""
    d = str(tmp_path_factory.mktemp("log_evolve") / "changes")
    spec = ChangeLogSpec(n_events=4_000, n_urls=400, n_batches=8, seed=43, evolution_k=4)
    info = generate_changelog(d, spec)
    return {"dir": d, "spec": spec, **info}
