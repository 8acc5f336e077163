"""Round-6 correctness fixes (ADVICE items): byte-suffix conf parsing,
follow_changes bounded drain, ts_range timezone independence, upload
Content-Length validation, IVF concurrent-update conflict detection."""

from __future__ import annotations

import urllib.error
import urllib.request

import pytest

from opengin_ingestion_spark.operators.salt import _parse_bytes


def test_parse_bytes_suffixes():
    assert _parse_bytes("134217728b", default=1) == 134217728
    assert _parse_bytes("128m", default=1) == 128 * 1024 * 1024
    assert _parse_bytes("1g", default=1) == 1024**3
    assert _parse_bytes("64k", default=1) == 64 * 1024
    assert _parse_bytes("12345", default=1) == 12345
    assert _parse_bytes("garbage", default=7) == 7


def test_follow_changes_max_polls_bounds_unreachable_until_version(
    spark, tmp_path
):
    """max_polls idle polls terminate the drain even when until_version is
    never reached (previously looped forever)."""
    from opengin_ingestion_spark.plans.replay import replay_changelog
    from opengin_ingestion_spark.sources.changelog import (
        ChangeLogSpec,
        generate_changelog,
    )
    from opengin_ingestion_spark.streaming.follow import follow_changes

    log = str(tmp_path / "log")
    generate_changelog(log, ChangeLogSpec(n_events=500, n_urls=50, n_batches=1, seed=5))
    table, _ = replay_changelog(spark, log, str(tmp_path / "pages"), n_buckets=4)
    seen = []
    out = follow_changes(
        table,
        lambda delta, lo, hi: seen.append((lo, hi)),
        str(tmp_path / "ckpt.json"),
        poll_seconds=0.05,
        until_version=10_000,  # the table will never reach this
        max_polls=2,
    )
    assert out["version"] < 10_000
    assert len(seen) == 1  # the one real delta was applied before idling out


def test_ts_range_read_is_timezone_independent(spark, tmp_path):
    """A GinTable opened under a non-UTC session must return the same
    ts_range rows as under UTC (file pruning compares naive-UTC manifest
    strings; the exact row filter previously cast bounds in session tz)."""
    from opengin_ingestion_spark.plans.replay import replay_changelog
    from opengin_ingestion_spark.sources.changelog import (
        ChangeLogSpec,
        generate_changelog,
    )

    log = str(tmp_path / "log")
    generate_changelog(log, ChangeLogSpec(n_events=800, n_urls=80, n_batches=2, seed=9))
    table, _ = replay_changelog(spark, log, str(tmp_path / "pages"), n_buckets=4)
    full = table.read().select("warc_ts").toPandas()["warc_ts"].sort_values()
    lo, hi = full.iloc[len(full) // 4], full.iloc[3 * len(full) // 4]
    utc_rows = table.read(ts_range=(lo, hi)).count()
    assert utc_rows > 0
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted_rows = table.read(ts_range=(lo, hi)).count()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert shifted_rows == utc_rows


def test_upload_malformed_and_negative_content_length(tmp_path):
    from opengin_ingestion_spark.sources.upload import UploadServer

    import socket

    with UploadServer(str(tmp_path / "staging")) as srv:
        host, port = srv.address
        for bad in ("notanumber", "-5"):
            # raw socket: urllib/http.client refuse to send a malformed
            # Content-Length themselves
            with socket.create_connection((host, port), timeout=10) as s:
                s.sendall(
                    (
                        "POST /upload HTTP/1.1\r\n"
                        f"Host: {host}:{port}\r\n"
                        "X-Filename: a.parquet\r\n"
                        f"Content-Length: {bad}\r\n"
                        "Connection: close\r\n\r\n"
                    ).encode()
                )
                resp = s.recv(4096).decode(errors="replace")
            assert resp.split("\r\n")[0].split(" ")[1] == "400", resp


def test_update_ivf_index_detects_concurrent_generation_move(spark, tmp_path):
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from opengin_ingestion_spark.operators.similarity import (
        _commit_ivf_meta,
        build_ivf_index,
        load_ivf_meta,
        update_ivf_index,
    )

    rng = np.random.RandomState(0)
    rows = [(int(i), rng.standard_normal(8).astype(float).tolist()) for i in range(200)]
    emb = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_centroids=4, seed=1)

    delta = emb.limit(10).withColumn("_change_type", F.lit("upsert"))

    # simulate a concurrent writer landing between this update's meta read
    # and its commit by bumping the generation under it
    import opengin_ingestion_spark.operators.similarity as sim

    real_loader = sim.load_ivf_meta
    calls = {"n": 0}

    def racing_loader(path):
        meta = real_loader(path)
        if calls["n"] == 0 and path == idx:
            calls["n"] += 1
            bumped = {**meta, "generation": meta.get("generation", 0) + 1}
            _commit_ivf_meta(idx, bumped)
            return meta  # this updater still believes the OLD generation
        return meta

    sim.load_ivf_meta = racing_loader
    try:
        with pytest.raises(RuntimeError, match="concurrent IVF update"):
            update_ivf_index(delta, idx)
    finally:
        sim.load_ivf_meta = real_loader
    # the loser left no half-written generation referenced
    assert load_ivf_meta(idx)["generation"] >= 1


def test_ngram_fast_path_equals_distributed_path(spark, monkeypatch):
    """The in-worker CSR fast path of ngram_jaccard_pairs must produce the
    EXACT same (id_a, id_b, jaccard) set as the distributed join path —
    same pairs, bit-identical doubles (the driver's value hash tolerates
    no drift between the gated tiers)."""
    import pandas as pd

    import opengin_ingestion_spark.operators.dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    fast = (
        dd.ngram_jaccard_pairs(docs, threshold=0.3)
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    monkeypatch.setattr(dd, "_ngram_pairs_inworker", lambda *a, **k: None)
    dist = (
        dd.ngram_jaccard_pairs(docs, threshold=0.3)
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, dist)
