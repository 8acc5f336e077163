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
    broken by neighbor_id for determinism. ``queries`` defaults to the
    corpus itself (all-pairs self-search); broadcast the smaller side.
    """
    q = (queries or corpus).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("q_id") != F.col("c_id"))
    scored = pairs.withColumn("cos", _cosine("q_vec", "c_vec"))
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
    )
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
        .select("q_id", "q_vec", "c_id", "c_vec")
        .distinct()
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
