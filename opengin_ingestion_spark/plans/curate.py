"""Training-data curation pipeline: the document-side counterpart of the
CDC replay — what a 100 TB corpus goes through before tokenization.

    documents ──► quality filter (JVM expressions, pushed to the scan)
              ──► exact dedup (hash-agg on md5(text))
              ──► near-dup pairs (MinHash-LSH, banded, bucket-capped)
              ──► transitive groups (connected components)
              ──► exemplar selection (one survivor per group)
              ──► curated corpus + per-stage decision report

Every stage is an existing engine operator; this module only composes them
and accounts for every dropped document (a curation pipeline that cannot
explain WHY a document vanished is undebuggable at scale — the report is
the dead-letter analog for dedup).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opengin_ingestion_spark.functions.textstats import quality_score, token_count
from opengin_ingestion_spark.operators.dedup import (
    dedup_groups,
    exact_dedup,
    minhash_lsh_pairs,
)


@dataclass(frozen=True)
class CurateConfig:
    min_quality: float = 0.2
    min_tokens: int = 5
    near_dup_threshold: float = 0.7
    minhash_bands: int = 8
    minhash_hashes: int = 32


def curate_documents(
    docs: DataFrame,
    config: CurateConfig = CurateConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs_fn: Callable[[DataFrame], DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(kept, decisions)``.

    ``kept``: the curated corpus (original columns).
    ``decisions``: one row per INPUT document — (id, decision, detail);
    decision ∈ kept | null_text | too_short | low_quality | exact_dup |
    near_dup. The quality flags are computed in ONE scan and checkpointed
    as a slim (id, flags) frame; every decision branch and filter derives
    from it by key, so the expressions never re-evaluate per branch and
    the report costs no extra pass over the corpus text.

    ``pairs_fn(exact_survivors) -> (id_a, id_b, ...)`` swaps the near-dup
    pair stage: default is MinHash-LSH (the 100 TB path); pass e.g. exact
    n-gram Jaccard to make the whole pipeline SQL-oracle-able (the driver
    contract query does this) or an embedding-cosine stage for semantic
    dedup. Everything downstream (CC grouping, exemplars, the report) is
    stage-agnostic.
    """
    # one scoring scan → slim checkpointed flags (ids + two numbers)
    flags = docs.select(
        F.col(id_col),
        quality_score(text_col).alias("_q"),
        token_count(text_col).alias("_tok"),
        F.col(text_col).isNull().alias("_null"),
    ).localCheckpoint(eager=True)
    null_text = F.col("_null")
    too_short = ~null_text & (F.col("_tok") < config.min_tokens)
    low_q = ~null_text & ~too_short & (F.col("_q") < config.min_quality)
    ok_ids = flags.filter(~null_text & ~too_short & ~low_q).select(id_col)
    quality_ok = docs.join(ok_ids, id_col, "left_semi")

    # exact dedup on the text digest: smallest id survives. Checkpointed:
    # the slim id frame feeds three branches (survivor semi-join, the
    # exact_dup anti-join, the kept report) whose join shapes differ, so
    # Catalyst cannot reuse one exchange across them — without the
    # barrier the md5 scan+aggregate subtree executes once per branch
    # (measured ~1 s of the report's cost at sf1.0).
    exact_keep = exact_dedup(
        quality_ok.select(id_col, F.md5(text_col).alias("_fp")), ["_fp"], id_col
    ).select(id_col).localCheckpoint(eager=True)
    exact_survivors = quality_ok.join(exact_keep, id_col, "left_semi")

    # near-dup: LSH pairs → transitive groups → exemplar = smallest id
    if pairs_fn is not None:
        pairs = pairs_fn(exact_survivors)
    else:
        pairs = minhash_lsh_pairs(
            exact_survivors,
            text_col=text_col,
            id_col=id_col,
            n_hashes=config.minhash_hashes,
            bands=config.minhash_bands,
            threshold=config.near_dup_threshold,
        )
    groups = dedup_groups(pairs)
    near_losers = groups.filter(F.col("node") != F.col("group")).select(
        F.col("node").alias(id_col), F.col("group").alias("_kept_as")
    )
    kept = exact_survivors.join(near_losers.select(id_col), id_col, "left_anti")

    # ---- decision report (id-only frames, no second text scan) ----------
    def ids(df, decision, detail=F.lit(None).cast("string")):
        return df.select(
            F.col(id_col), F.lit(decision).alias("decision"), detail.alias("detail")
        )

    d_null = ids(flags.filter(null_text), "null_text")
    d_short = ids(flags.filter(too_short), "too_short", F.col("_tok").cast("string"))
    d_lowq = ids(flags.filter(low_q), "low_quality", F.round("_q", 4).cast("string"))
    d_exact = ids(ok_ids.join(exact_keep, id_col, "left_anti"), "exact_dup")
    d_near = near_losers.select(
        F.col(id_col), F.lit("near_dup").alias("decision"),
        F.col("_kept_as").cast("string").alias("detail"),
    )
    d_kept = ids(kept, "kept")
    decisions = (
        d_kept.unionByName(d_null).unionByName(d_short).unionByName(d_lowq)
        .unionByName(d_exact).unionByName(d_near)
    )
    return kept, decisions
