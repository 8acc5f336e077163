"""Similarity-search tests: brute-force vs numpy oracle; LSH-ANN recall."""

from __future__ import annotations

import numpy as np
import pytest

from opengin_ingestion_spark.operators.similarity import (
    brute_force_topk,
    lsh_ann_topk,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(42)
    n, dim = 120, 16
    m = rng.standard_normal((n, dim)).astype(np.float32)
    # plant exact near-neighbors: vec i+100 ≈ vec i for i<10
    for i in range(10):
        m[100 + i] = m[i] + 0.01 * rng.standard_normal(dim).astype(np.float32)
    rows = [(int(i), [float(x) for x in m[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, m


def _numpy_topk(m: np.ndarray, k: int) -> dict[int, list[int]]:
    x = m.astype(np.float64)
    norm = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = norm @ norm.T
    np.fill_diagonal(sims, -np.inf)
    out = {}
    for i in range(len(m)):
        order = np.lexsort((np.arange(len(m)), -sims[i]))
        out[i] = [int(j) for j in order[:k]]
    return out


def test_brute_force_matches_numpy(vecs):
    df, m = vecs
    got = brute_force_topk(df, k=5).collect()
    by_q: dict[int, dict[int, int]] = {}
    for r in got:
        by_q.setdefault(r["vec_id"], {})[r["rank"]] = r["neighbor_id"]
    expect = _numpy_topk(m, 5)
    for q, ranks in by_q.items():
        assert [ranks[i] for i in sorted(ranks)] == expect[q]


def test_lsh_ann_finds_planted_pairs(vecs):
    """Multi-probe LSH must find the planted nearest neighbor for every
    planted near-identical pair (uniform random data has no cluster
    structure, so overall recall is not meaningful there)."""
    df, m = vecs
    approx = {(r["vec_id"], r["neighbor_id"]) for r in lsh_ann_topk(df, k=5, n_planes=8).collect()}
    for i in range(10):
        assert (i, 100 + i) in approx


def test_lsh_ann_recall_on_clustered_data(spark):
    """On clustered embeddings (the realistic case) LSH recall@5 vs brute
    force must be high — same-cluster vectors share sign buckets."""
    rng = np.random.RandomState(7)
    centers = rng.standard_normal((8, 16)) * 4
    rows = []
    for i in range(160):
        c = centers[i % 8]
        rows.append((i, [float(x) for x in (c + 0.3 * rng.standard_normal(16))]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["vec_id"], r["neighbor_id"]) for r in brute_force_topk(df, k=5).collect()}
    approx = {(r["vec_id"], r["neighbor_id"]) for r in lsh_ann_topk(df, k=5, n_planes=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@5 too low on clustered data: {recall}"


def test_brute_force_chunked_matches_unchunked(vecs):
    """Self-search with a tiny driver-broadcast budget (forces 4+ chunks —
    the no-full-corpus-collect path) returns exactly the single-chunk
    result."""
    df, m = vecs
    one = sorted(map(tuple, brute_force_topk(df, k=3).collect()))
    chunked = sorted(map(tuple, brute_force_topk(df, k=3, max_broadcast_rows=30).collect()))
    assert one == chunked


def test_empty_corpus_returns_empty_frames(spark):
    """Zero-row inputs yield empty results with the contract schema, not an
    IndexError from an empty chunk list."""
    from opengin_ingestion_spark.operators.similarity import exact_neardup_pairs

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    topk = brute_force_topk(empty, k=3)
    assert topk.columns == ["vec_id", "neighbor_id", "rank"]
    assert topk.count() == 0
    pairs = exact_neardup_pairs(empty, threshold=0.5)
    assert pairs.columns == ["id_a", "id_b", "cos"]
    assert pairs.count() == 0


def test_exact_neardup_pairs_matches_numpy(vecs):
    """exact_neardup_pairs == numpy full-pair cosine at the threshold, in
    both single-chunk and chunked mode."""
    from opengin_ingestion_spark.operators.similarity import exact_neardup_pairs

    df, m = vecs
    x = m.astype(np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    sims = x @ x.T
    expect = {
        (i, j)
        for i in range(len(m))
        for j in range(i + 1, len(m))
        if sims[i, j] >= 0.9
    }
    got = {(r["id_a"], r["id_b"]) for r in exact_neardup_pairs(df, threshold=0.9).collect()}
    assert got == expect and len(expect) >= 10
    got_chunked = {
        (r["id_a"], r["id_b"])
        for r in exact_neardup_pairs(df, threshold=0.9, max_broadcast_rows=30).collect()
    }
    assert got_chunked == expect


def test_ivf_ann_recall_on_clustered_data(spark):
    """IVF with data-adaptive centroids: recall@5 vs brute force on
    clustered embeddings; deterministic across invocations."""
    from opengin_ingestion_spark.operators.similarity import ivf_ann_topk

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((8, 16)) * 4
    rows = []
    for i in range(160):
        c = centers[i % 8]
        rows.append((i, [float(x) for x in (c + 0.3 * rng.standard_normal(16))]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["vec_id"], r["neighbor_id"]) for r in brute_force_topk(df, k=5).collect()}
    a = {(r["vec_id"], r["neighbor_id"], r["rank"])
         for r in ivf_ann_topk(df, k=5, n_centroids=8, n_probe=2).collect()}
    b = {(r["vec_id"], r["neighbor_id"], r["rank"])
         for r in ivf_ann_topk(df, k=5, n_centroids=8, n_probe=2).collect()}
    assert a == b, "IVF must be deterministic"
    approx = {(q, n) for q, n, _ in a}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall@5 too low on clustered data: {recall}"


def test_ivf_search_batch_recall(spark, tmp_path):
    """The serving path: a query batch searched through the persisted
    index has high recall@5 vs exact brute force of the same batch, and
    never returns self-matches."""
    from opengin_ingestion_spark.operators.similarity import (
        build_ivf_index,
        ivf_search,
    )

    rng = np.random.RandomState(11)
    centers = rng.standard_normal((8, 16)) * 4
    rows = []
    for i in range(160):
        c = centers[i % 8]
        rows.append((i, [float(x) for x in (c + 0.3 * rng.standard_normal(16))]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ivf_s")
    build_ivf_index(df, idx, n_centroids=8, seed=42)
    batch = df.filter("vec_id % 10 = 0")  # 16 queries
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in brute_force_topk(df, queries=batch, k=5).collect()
    }
    got = ivf_search(batch, idx, k=5, n_probe=2).collect()
    approx = {(r["vec_id"], r["neighbor_id"]) for r in got}
    assert all(r["vec_id"] != r["neighbor_id"] for r in got)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"ivf_search recall@5 too low: {recall}"


def test_ivf_persisted_index_matches_inline(spark, tmp_path):
    """build_ivf_index persists quantizer + assignments; querying through
    the index returns exactly the inline (train-per-call) result, and the
    persisted centroids round-trip bit-for-bit (determinism across
    sessions — the JSON float repr is exact)."""
    import numpy as np

    from opengin_ingestion_spark.operators.similarity import (
        build_ivf_index,
        ivf_ann_topk,
        load_ivf_centroids,
        train_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(emb, idx, n_centroids=8, seed=42)
    assert meta["n_centroids"] == 8 and meta["dim"] == 64
    inline = sorted(
        map(tuple, ivf_ann_topk(emb, k=5, n_centroids=8, seed=42).collect())
    )
    indexed = sorted(map(tuple, ivf_ann_topk(emb, k=5, index_path=idx).collect()))
    assert inline == indexed
    cent = load_ivf_centroids(idx)
    fresh = train_centroids(emb, n_centroids=8, seed=42)
    assert cent.shape == (8, 64)
    assert np.array_equal(cent, fresh)


def test_embedding_neardup_pairs(spark, vecs):
    """Planted near-identical vectors (cos ≈ 1) are found as near-dup
    pairs; unrelated random vectors are not."""
    from opengin_ingestion_spark.operators.similarity import embedding_neardup_pairs

    df, m = vecs
    pairs = {(r["id_a"], r["id_b"]): r["cos"] for r in
             embedding_neardup_pairs(df, threshold=0.98).collect()}
    for i in range(10):
        assert (i, 100 + i) in pairs and pairs[(i, 100 + i)] > 0.99
    # random 16-dim gaussians essentially never reach cos 0.98
    assert len(pairs) == 10
