"""Checkpointed CDC-out consumer (streaming/follow.py): bounded drains,
restart resume, at-least-once idempotence, and the continuous IVF sync."""

from __future__ import annotations

import datetime as dt
import json

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opengin_ingestion_spark.operators.merge import merge_batch
from opengin_ingestion_spark.sources.gintable import GinTable
from opengin_ingestion_spark.streaming.follow import follow_changes, sync_ivf_index

T0 = dt.datetime(2024, 1, 1)


def _vec_table(spark, path, n_buckets=4):
    schema = T.StructType([
        T.StructField("vec_key", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ])
    return GinTable.create(
        spark, path, schema, n_buckets=n_buckets,
        key_col="vec_key", ts_col="ts",
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "op string, seq long, vec_key string, ts timestamp, "
              "embedding array<float>"
    )


def _centers(seed=17, n_centers=4, dim=8):
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_centers, dim)) * 4, rng


def _rows(centers, rng, ids, seq0, t, op="I"):
    return [
        (op, seq0 + j, f"v{i}", t,
         [float(x) for x in (centers[i % len(centers)]
                             + 0.3 * rng.standard_normal(centers.shape[1]))])
        for j, i in enumerate(ids)
    ]


def test_follow_changes_applies_each_range_once(spark, tmp_path):
    table = _vec_table(spark, str(tmp_path / "t"))
    centers, rng = _centers()
    merge_batch(table, _batch(spark, _rows(centers, rng, range(10), 0, T0)),
                batch_id=0)
    merge_batch(table, _batch(
        spark, _rows(centers, rng, range(10, 16), 100, T0)), batch_id=1)

    seen = []
    ckpt = str(tmp_path / "ckpt.json")
    res = follow_changes(
        table,
        lambda d, a, b: seen.append((a, b, d.count())),
        ckpt, poll_seconds=0.01, until_version=table.current_version(),
    )
    # one delta covering (0, current] — all 16 rows are new
    assert res["applied_ranges"] == [(0, table.current_version())]
    assert seen[0][2] == 16
    assert json.load(open(ckpt))["version"] == table.current_version()

    # resume: a third merge, second drain applies ONLY the new range
    v2 = table.current_version()
    merge_batch(table, _batch(
        spark, _rows(centers, rng, range(16, 19), 200, T0)), batch_id=2)
    res2 = follow_changes(
        table, lambda d, a, b: seen.append((a, b, d.count())),
        ckpt, poll_seconds=0.01, until_version=table.current_version(),
    )
    assert res2["applied_ranges"] == [(v2, table.current_version())]
    assert seen[-1] == (v2, table.current_version(), 3)

    # nothing new: bounded idle poll exits without applying
    res3 = follow_changes(
        table, lambda d, a, b: seen.append("never"), ckpt,
        poll_seconds=0.01, max_polls=2,
    )
    assert res3["applied_ranges"] == [] and "never" not in seen


def test_sync_ivf_index_continuous(spark, tmp_path):
    """Merges → sync → index equals direct assignment of table state;
    resumable; re-applying a delta (lost checkpoint) converges."""
    from opengin_ingestion_spark.operators.similarity import (
        _ivf_assign_udf,
        build_ivf_index,
        ivf_cells_path,
        load_ivf_centroids,
    )

    table = _vec_table(spark, str(tmp_path / "vt"))
    centers, rng = _centers(seed=23)
    merge_batch(table, _batch(spark, _rows(centers, rng, range(24), 0, T0)),
                batch_id=0)
    v0 = table.current_version()
    idx = str(tmp_path / "ivf")
    build_ivf_index(
        table.read().select("vec_key", "embedding"), idx,
        id_col="vec_key", n_centroids=4, seed=42,
    )
    ckpt = str(tmp_path / "sync.json")
    # checkpoint starts at the version the index was built from
    from opengin_ingestion_spark.streaming.follow import _write_checkpoint

    _write_checkpoint(ckpt, v0)

    # two more merges: moves + deletes + fresh ids
    t1 = T0 + dt.timedelta(hours=1)
    merge_batch(table, _batch(spark, (
        [("D", 1000 + j, f"v{j}", t1, None) for j in range(4)]
        + _rows(centers, rng, range(24, 30), 1100, t1)
    )), batch_id=1)
    merge_batch(table, _batch(
        spark, _rows(centers, rng, range(5, 9), 1200,
                     T0 + dt.timedelta(hours=2), op="U")), batch_id=2)

    res = sync_ivf_index(
        table, idx, ckpt, poll_seconds=0.01,
        until_version=table.current_version(),
    )
    assert len(res["applied_ranges"]) == 1  # both merges in one drain

    def index_state():
        return {
            (r["vec_key"], int(r["cell"]), tuple(r["embedding"]))
            for r in spark.read.parquet(ivf_cells_path(idx)).collect()
        }

    cent = load_ivf_centroids(idx)
    expected = {
        (r["vec_key"], int(r["cell"]), tuple(r["embedding"]))
        for r in table.read().select(
            "vec_key", "embedding",
            _ivf_assign_udf(cent, 1)(F.col("embedding")).getItem(0).alias("cell"),
        ).collect()
    }
    assert index_state() == expected

    # at-least-once: lose the checkpoint, re-sync from v0 — the replayed
    # deltas converge to the SAME index content (idempotent consumer)
    import os

    os.unlink(ckpt)
    _write_checkpoint(ckpt, v0)
    sync_ivf_index(
        table, idx, ckpt, poll_seconds=0.01,
        until_version=table.current_version(),
    )
    assert index_state() == expected

    # quiet table: no new generation is committed
    from opengin_ingestion_spark.operators.similarity import load_ivf_meta

    g = load_ivf_meta(idx)["generation"]
    sync_ivf_index(table, idx, ckpt, poll_seconds=0.01, max_polls=1)
    assert load_ivf_meta(idx)["generation"] == g
