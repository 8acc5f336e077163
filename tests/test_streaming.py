"""Streaming tests: AvailableNow replay, kill/resume from checkpoint,
exactly-once across restart, dead-letter split (SURVEY.md §5)."""

from __future__ import annotations

import glob
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from opengin_ingestion_spark.sources.gintable import GinTable
from opengin_ingestion_spark.streaming.tail import tail_changelog
from tests.oracle import assert_states_equal, oracle_final_state


def test_streaming_availablenow_matches_oracle(spark, tiny_log, tmp_path):
    q = tail_changelog(
        spark,
        tiny_log["dir"],
        str(tmp_path / "pages"),
        str(tmp_path / "ckpt"),
        n_buckets=16,
        max_files_per_trigger=3,
        available_now=True,
    )
    assert q.awaitTermination(300)
    table = GinTable.load(spark, str(tmp_path / "pages"))
    engine = table.read(include_internal=True).toPandas()
    assert_states_equal(engine, oracle_final_state(tiny_log["dir"]))
    # 8 files / 3 per trigger = 3 micro-batches, each applied exactly once
    snap = table.current_snapshot()
    assert snap["applied_batch_ranges"] == [[0, 2]]


def test_streaming_resume_from_checkpoint(spark, tiny_log, tmp_path):
    """Kill the query mid-replay, restart with the same checkpoint →
    completes with no duplicates or gaps; final state matches oracle."""
    # phase 1: one file per trigger; stop as soon as some (not all) batches
    # are applied. Under load the stream can drain everything before the
    # poll loop catches it mid-replay — retry with a fresh dir (the timing
    # is environmental, not a property under test).
    for attempt in range(3):
        table_path = str(tmp_path / f"pages{attempt}")
        ckpt = str(tmp_path / f"ckpt{attempt}")
        q = tail_changelog(
            spark, tiny_log["dir"], table_path, ckpt,
            n_buckets=16, max_files_per_trigger=1, available_now=True,
        )
        deadline = time.time() + 300
        while time.time() < deadline:
            if GinTable.exists(table_path):
                t = GinTable.load(spark, table_path)
                v = t.current_version()
                if v and v >= 2:
                    break
            time.sleep(0.05)
        q.stop()
        q.awaitTermination(60)
        t = GinTable.load(spark, table_path)
        v_mid = t.current_version()
        if 0 < v_mid < tiny_log["n_batches"]:
            break
    assert 0 < v_mid < tiny_log["n_batches"], "should have stopped mid-replay"

    # phase 2: restart from the same checkpoint; drain the rest
    q2 = tail_changelog(
        spark, tiny_log["dir"], table_path, ckpt,
        n_buckets=16, max_files_per_trigger=1, available_now=True,
    )
    assert q2.awaitTermination(300)

    t = GinTable.load(spark, table_path)
    engine = t.read(include_internal=True).toPandas()
    assert_states_equal(engine, oracle_final_state(tiny_log["dir"]))
    # every micro-batch id applied exactly once, no gaps
    snap = t.current_snapshot()
    assert snap["applied_batch_ranges"] == [[0, tiny_log["n_batches"] - 1]]
    # each non-empty commit consumed a distinct batch id
    bids = [
        s["metrics"].get("batch_id")
        for s in t.history()
        if s["metrics"].get("batch_id") is not None
    ]
    assert len(bids) == len(set(bids))


def test_stream_dedup_within_watermark(spark, tiny_log, tmp_path):
    """dropDuplicatesWithinWatermark over a log with duplicated events:
    each seq is emitted exactly once; state is watermark-bounded."""
    from opengin_ingestion_spark.sources.changelog import make_duplicated_variant
    from opengin_ingestion_spark.sources.reader import read_changelog_stream
    from opengin_ingestion_spark.streaming.dedup import dedup_stream

    dup_dir = str(tmp_path / "dup_log")
    make_duplicated_variant(tiny_log["dir"], dup_dir, dup_batches=[0, 3])
    stream = read_changelog_stream(spark, dup_dir, max_files_per_trigger=4)
    deduped = dedup_stream(stream, keys=["seq"], ts_col="warc_ts", lateness="2 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = spark.sql("SELECT seq, count(*) n FROM dedup_out GROUP BY seq")
    dup_emitted = out.filter(F.col("n") > 1).count()
    total = out.count()
    n_src = spark.read.parquet(tiny_log["dir"]).select("seq").distinct().count()
    assert total == n_src, "every distinct event exactly once"
    assert dup_emitted == 0
    spark.catalog.dropTempView("dedup_out")


def test_dead_letter_split(spark, tiny_log, tmp_path):
    """A poisoned batch file: bad rows land in the dead-letter dir with
    reasons; good rows are merged; the run completes."""
    import shutil

    log2 = str(tmp_path / "log_poison")
    shutil.copytree(tiny_log["dir"], log2)
    # craft a poison batch: bad op, null url, ftp scheme, null html upsert
    ts = pa.array([1_700_000_000_000_000] * 4, pa.timestamp("us", tz="UTC"))
    bad = pa.table(
        {
            "seq": pa.array([900001, 900002, 900003, 900004], pa.int64()),
            "op": pa.array(["X", "I", "I", "I"]),
            "url": pa.array(["https://ok.example.com/1", None, "ftp://bad", "https://ok.example.com/2"]),
            "warc_ts": ts,
            "html": pa.array([b"<p>a</p>", b"<p>b</p>", b"<p>c</p>", None], pa.binary()),
            "content_len": pa.array([8, 8, 8, None], pa.int32()),
        }
    )
    pq.write_table(bad, os.path.join(log2, "batch_00099.parquet"))

    dl = str(tmp_path / "dead")
    q = tail_changelog(
        spark, log2, str(tmp_path / "pages"), str(tmp_path / "ckpt"),
        n_buckets=16, available_now=True, dead_letter_dir=dl,
    )
    assert q.awaitTermination(300)

    dead = spark.read.parquet(dl)
    reasons = {r["reason"] for r in dead.select("reason").collect()}
    assert reasons == {"bad_op", "null_url", "bad_url_scheme", "null_html_on_upsert"}
    assert dead.count() == 4
    # the clean events still merged to the oracle state
    table = GinTable.load(spark, str(tmp_path / "pages"))
    engine = table.read(include_internal=True).toPandas()
    assert_states_equal(engine, oracle_final_state(tiny_log["dir"]))


def test_streaming_over_evolving_log(spark, evolving_log, tmp_path):
    """Regression: streaming the whole evolving log (source schema already
    includes `lang`, which the transform also declares) must not produce a
    duplicate column — final state matches the oracle."""
    q = tail_changelog(
        spark, evolving_log["dir"], str(tmp_path / "pages"), str(tmp_path / "ckpt"),
        n_buckets=16, max_files_per_trigger=3, available_now=True,
    )
    assert q.awaitTermination(300)
    table = GinTable.load(spark, str(tmp_path / "pages"))
    sch = table.schema()
    assert sch.fieldNames().count("lang") == 1
    engine = table.read(include_internal=True).toPandas()
    assert_states_equal(engine, oracle_final_state(evolving_log["dir"]))


def test_supervised_tail_restarts_on_midstream_schema_drift(
    spark, evolving_log, tmp_path
):
    """The supervisor closes the fixed-stream-schema gap end-to-end: a tail
    is started over the pre-evolution half of the log; the post-evolution
    files (new `lang` column, widened content_len) land while it runs; the
    supervisor kills the query BEFORE the drifted batch merges, re-infers,
    restarts from the checkpoint, and the final state equals the batch
    oracle over the WHOLE log — no silently dropped columns."""
    import glob
    import os
    import shutil
    import threading
    import time

    from opengin_ingestion_spark.streaming.tail import supervised_tail

    src_files = sorted(glob.glob(os.path.join(evolving_log["dir"], "*.parquet")))
    assert len(src_files) == 8  # evolution_k=4 → files 0-3 v1, 4-7 v2
    live = str(tmp_path / "live_log")
    os.makedirs(live)
    for f in src_files[:4]:
        shutil.copy(f, live)
    ckpt = str(tmp_path / "ckpt")

    def add_evolved_files():
        # wait until the first micro-batch is planned, then land the
        # evolved era mid-run (the query still has ≥3 batches to go at
        # maxFilesPerTrigger=1, so this is mid-stream, not post-drain)
        deadline = time.time() + 120
        while not os.path.exists(os.path.join(ckpt, "offsets", "0")):
            if time.time() > deadline:
                return
            time.sleep(0.05)
        for f in src_files[4:]:
            # atomic landing (temp name + rename, the changelog writer's
            # publish convention): the live file source / supervisor footer
            # peek must never observe a partially copied parquet
            tmp = os.path.join(live, "." + os.path.basename(f) + ".tmp")
            shutil.copy(f, tmp)
            os.rename(tmp, os.path.join(live, os.path.basename(f)))

    t = threading.Thread(target=add_evolved_files)
    t.start()
    res = supervised_tail(
        spark, live, str(tmp_path / "pages"), ckpt,
        n_buckets=8, max_files_per_trigger=1, available_now=True,
    )
    t.join()
    assert res["restarts"] >= 1, "drift must force at least one restart"
    assert "lang" in res["schema"].fieldNames()
    table = GinTable.load(spark, str(tmp_path / "pages"))
    engine = table.read(include_internal=True).toPandas()
    assert_states_equal(engine, oracle_final_state(live))
    # post-evolution winners carry their log-provided lang
    assert table.read().filter("lang is not null").count() > 0


def test_windowed_event_counts_match_batch(spark, tmp_path):
    """Streaming watermarked tumbling-window counts == the same aggregation
    run in batch over the whole log (completeness under in-bound lateness).

    Lateness must exceed the CROSS-BATCH disorder (2x the generator's
    jitter: a previous batch's max ts vs a later batch's min ts), so a
    dedicated low-jitter log is used — tiny_log's ±1h jitter would need
    >2h lateness, longer than the log itself."""
    from opengin_ingestion_spark.sources.changelog import (
        ChangeLogSpec,
        generate_changelog,
    )
    from opengin_ingestion_spark.sources.reader import read_changelog_stream
    from opengin_ingestion_spark.streaming.windows import windowed_event_counts

    d = str(tmp_path / "wlog")
    generate_changelog(
        d, ChangeLogSpec(n_events=4_000, n_urls=400, n_batches=8, seed=17,
                         jitter_us=300_000_000)  # ±5 min
    )
    stream = read_changelog_stream(spark, d, max_files_per_trigger=2)
    agg = windowed_event_counts(stream, window="10 minutes", lateness="11 minutes")
    q = (
        agg.writeStream.format("memory").queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    got = {
        (r["window_start"], r["op"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    batch = spark.read.parquet(d)
    expect = {
        (r["w"]["start"], r["op"]): r["n"]
        for r in batch.groupBy(
            F.window("warc_ts", "10 minutes").alias("w"), "op"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # append mode only emits windows the final watermark passed; every
    # emitted window must match the batch aggregation exactly
    assert len(got) >= 5, f"too few emitted windows: {len(got)}"
    assert all(expect[k] == v for k, v in got.items())
    spark.catalog.dropTempView("win_out")


def test_sessionize_gap_sessions(spark, tmp_path):
    """applyInPandasWithState sessionization: gap splits sessions (data
    path), idle keys close via event-time timeout (timeout path)."""
    import pyarrow as pa

    from opengin_ingestion_spark.sources.reader import read_changelog_stream
    from opengin_ingestion_spark.streaming.windows import sessionize

    t0 = 1_700_000_000_000_000  # us
    HOUR = 3_600_000_000

    def write(path, rows, mtime):
        tbl = pa.table(
            {
                "op": pa.array([r[0] for r in rows]),
                "seq": pa.array([r[1] for r in rows], pa.int64()),
                "url": pa.array([r[2] for r in rows]),
                "warc_ts": pa.array(
                    [r[3] for r in rows], pa.timestamp("us", tz="UTC")
                ),
                "html": pa.array([b"<html/>"] * len(rows), pa.binary()),
                "content_len": pa.array([7] * len(rows), pa.int64()),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    d = tmp_path / "slog"
    d.mkdir()
    # file 1: A has 2 close events; B and C one each
    write(
        str(d / "batch_00000.parquet"),
        [("U", 1, "A", t0), ("U", 2, "A", t0 + 10_000_000),
         ("U", 3, "B", t0), ("U", 4, "C", t0)],
        mtime=1_000_000,
    )
    # file 2 (processed later): A and B again 2h later; C idle
    write(
        str(d / "batch_00001.parquet"),
        [("U", 5, "A", t0 + 2 * HOUR), ("U", 6, "B", t0 + 2 * HOUR)],
        mtime=1_000_100,
    )
    stream = read_changelog_stream(spark, str(d), max_files_per_trigger=1)
    sessions = sessionize(stream, gap_seconds=600, lateness="10 minutes")
    q = (
        sessions.writeStream.format("memory").queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    got = {
        (r["url"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # sessions emit only once the watermark seals them (end+gap passed):
    # the 2h-later events advance the watermark, the final no-data batch
    # fires the timeouts. A: 2 events spanning 10s; B and C singletons
    # (C had NO new data — pure timeout path).
    assert got["A"][2] == 2
    assert (got["A"][1] - got["A"][0]).total_seconds() == 10
    assert got["B"][2] == 1
    assert got["C"][2] == 1
    # the 2h-later open sessions are NOT emitted (watermark never passed)
    assert len(got) == 3
    spark.catalog.dropTempView("sess_out")


def test_sessionize_stream_equals_batch_oracle(spark, tmp_path):
    """Stream sessionize over a low-jitter log == batch gap_sessions for
    every watermark-sealed session, and both custom-state and built-in
    session_window variants agree."""
    from opengin_ingestion_spark.operators.aggregate_tables import gap_sessions
    from opengin_ingestion_spark.sources.changelog import (
        ChangeLogSpec,
        generate_changelog,
    )
    from opengin_ingestion_spark.sources.reader import read_changelog_stream
    from opengin_ingestion_spark.streaming.windows import sessionize

    d = str(tmp_path / "slog2")
    generate_changelog(
        d, ChangeLogSpec(n_events=3_000, n_urls=300, n_batches=6, seed=31,
                         jitter_us=10_000_000)  # ±10 s
    )
    GAP = 120
    stream = read_changelog_stream(spark, d, max_files_per_trigger=2)
    q = (
        sessionize(stream, gap_seconds=GAP, lateness="60 seconds")
        .writeStream.format("memory").queryName("sess_eq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    stream_sessions = {
        (r["url"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_eq").collect()
    }
    batch_df = spark.read.parquet(d).withColumnRenamed("seq", "_seq")
    batch_sessions = {
        (r["url"], r["session_start"], r["session_end"], r["n_events"])
        for r in gap_sessions(batch_df, gap_seconds=GAP).collect()
    }
    assert stream_sessions, "no sessions emitted"
    assert stream_sessions <= batch_sessions, (
        f"stream emitted sessions batch disagrees with: "
        f"{sorted(stream_sessions - batch_sessions)[:3]}"
    )
    # everything except the unsealed tail must have been emitted
    assert len(stream_sessions) >= 0.7 * len(batch_sessions)
    spark.catalog.dropTempView("sess_eq")
