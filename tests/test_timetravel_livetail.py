"""Snapshot time travel + live (processing-time) streaming tail."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from opengin_ingestion_spark.plans.replay import replay_changelog
from opengin_ingestion_spark.sources.changelog import ChangeLogSpec, generate_changelog
from opengin_ingestion_spark.sources.gintable import GinTable
from opengin_ingestion_spark.streaming.tail import tail_changelog
from tests.oracle import assert_states_equal, oracle_final_state


def test_time_travel_reads(spark, tiny_log, tmp_path):
    """read(snapshot(v)) returns the table AS OF v — snapshot isolation."""
    table, results = replay_changelog(
        spark, tiny_log["dir"], str(tmp_path / "pages"), n_buckets=16, group_files=2
    )
    counts = {}
    for v in range(table.current_version() + 1):
        snap = table.snapshot(v)
        counts[v] = table.read(snap).count()
    assert counts[0] == 0  # empty at creation
    assert counts[table.current_version()] == table.read().count()
    # row counts move as batches apply (monotone-ish; at least changing)
    assert len(set(counts.values())) > 2
    # old snapshot unaffected by later commits (files carried by reference)
    v1 = table.snapshot(1)
    before = sorted(map(tuple, table.read(v1).collect()))
    from opengin_ingestion_spark.operators.compact import compact

    compact(table, max_files_per_bucket=0)  # force a rewrite commit
    assert sorted(map(tuple, table.read(v1).collect())) == before


def test_live_tail_picks_up_new_files(spark, tmp_path):
    """Processing-time trigger: files appearing while the query runs are
    merged; the final state matches the oracle over everything delivered."""
    log = str(tmp_path / "log")
    spec = ChangeLogSpec(n_events=2_000, n_urls=200, n_batches=4, seed=9)
    generate_changelog(log, spec)
    # hold back the last 2 batch files
    held = sorted(f for f in os.listdir(log))[-2:]
    stash = str(tmp_path / "stash")
    os.makedirs(stash)
    for f in held:
        shutil.move(os.path.join(log, f), os.path.join(stash, f))

    q = tail_changelog(
        spark, log, str(tmp_path / "pages"), str(tmp_path / "ckpt"),
        n_buckets=16, available_now=False, processing_time="1 seconds",
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if GinTable.exists(str(tmp_path / "pages")):
                t = GinTable.load(spark, str(tmp_path / "pages"))
                if t.is_batch_applied(0):
                    break
            time.sleep(0.5)
        # deliver the held-back files mid-stream
        for f in held:
            shutil.move(os.path.join(stash, f), os.path.join(log, f))
        deadline = time.time() + 120
        while time.time() < deadline:
            t = GinTable.load(spark, str(tmp_path / "pages"))
            m = t.current_snapshot()["metrics"]
            total = sum(
                s["metrics"].get("events_in", 0) for s in t.history()
            )
            if total >= spec.n_events:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)

    t = GinTable.load(spark, str(tmp_path / "pages"))
    engine = t.read(include_internal=True).toPandas()
    assert_states_equal(engine, oracle_final_state(log))


def test_table_changes_incremental_read(spark, tiny_log, tmp_path):
    """CDC-out: the delta between consecutive snapshots reproduces exactly
    the batch LWW effects — replaying all deltas on top of the v_from
    state reconstructs the final state; carried-forward rows never appear."""
    from opengin_ingestion_spark.plans.replay import replay_changelog
    from opengin_ingestion_spark.sources.gintable import GinTable, table_changes

    table, results = replay_changelog(
        spark, tiny_log["dir"], str(tmp_path / "pages"), n_buckets=8,
        group_files=2,
    )
    versions = [r.version for r in results]
    assert len(versions) >= 3

    # delta between v0 (empty) and final == full internal state
    full_delta = table_changes(table, 0).drop("_change_type")
    full = table.read(include_internal=True)
    assert sorted(map(tuple, full_delta.collect())) == sorted(
        map(tuple, full.collect())
    )

    # per-step deltas: each row of the final state appears in EXACTLY the
    # step that produced its (_seq); no carried row is re-emitted
    steps = [0] + versions
    seen_seqs: list[int] = []
    for a, b in zip(steps, steps[1:]):
        d = table_changes(table, a, b)
        seqs = [r["_seq"] for r in d.select("_seq").collect()]
        assert len(seqs) == len(set(seqs))
        seen_seqs += seqs
    final_seqs = [r["_seq"] for r in full.select("_seq").collect()]
    # every final row was emitted by some step; a seq superseded in a LATER
    # step may appear twice across steps (as winner then replaced) — but
    # the FINAL winners must each appear at least once
    assert set(final_seqs) <= set(seen_seqs)

    # change types: deletes flagged
    d_all = table_changes(table, 0)
    n_tomb = d_all.filter(F.col("_change_type") == "delete").count()
    internal = full.toPandas()
    assert n_tomb == int(internal["_deleted"].fillna(False).sum())


def test_table_changes_rejects_reversed_range(spark, tiny_log, tmp_path):
    """A reversed (from > to) range must raise, not silently misreport all
    of the earlier snapshot's rows as upserts."""
    import pytest

    from opengin_ingestion_spark.plans.replay import replay_changelog
    from opengin_ingestion_spark.sources.gintable import table_changes

    table, results = replay_changelog(
        spark, tiny_log["dir"], str(tmp_path / "pages"), n_buckets=8,
        group_files=2,
    )
    with pytest.raises(ValueError, match="reversed"):
        table_changes(table, results[-1].version, 0)


def test_table_changes_refuses_range_across_tombstone_expiry(spark, tmp_path):
    """A tombstone expiry erases delete evidence — an incremental consumer
    synced before it must get an error, not silent resurrection."""
    import pytest

    from opengin_ingestion_spark.operators.merge import expire_tombstones
    from opengin_ingestion_spark.sources.gintable import table_changes

    d = str(tmp_path / "log")
    spec = ChangeLogSpec(
        n_events=1_000, n_urls=100, n_batches=2, seed=4, p_delete=0.2,
        jitter_us=1_000_000,
    )
    generate_changelog(d, spec)
    table, results = replay_changelog(
        spark, d, str(tmp_path / "pages"), n_buckets=4, group_files=1
    )
    v_synced = results[0].version
    import datetime

    expire_tombstones(table, datetime.datetime(2030, 1, 1))
    with pytest.raises(ValueError, match="tombstone expiry"):
        table_changes(table, v_synced)
    # ranges starting AT or AFTER the expiry commit still work
    assert table_changes(table, table.current_version()).count() == 0
