"""Snapshot time travel + live (processing-time) streaming tail."""

from __future__ import annotations

import os
import shutil
import time

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
