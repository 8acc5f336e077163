"""MERGE INTO: bucket-pruned copy-on-write upsert with LWW + exactly-once.

Reference analog: the hash-probe merge of page fragments into the
aggregated map (/root/reference/python/src/opengin/tracer/agents/
aggregator.py:61-84) — generalized to a transactional upsert of a change
batch into a GinTable.

Physical strategy (the scale story):

1. Within-batch LWW collapse (partial-aggregable ``max_by`` — hot urls
   shrink map-side, see operators/lww.py).
2. **Bucket pruning**: the batch's winners touch a set of url-hash buckets;
   ONLY those buckets' data files are read and rewritten. At 10^10 rows
   with B=4096 buckets, a micro-batch touching 1% of urls rewrites ~B
   files, not the table. (This is the engine's MERGE partition pruning,
   done at the manifest layer — the scan never lists untouched files.)
3. Union (aligned via the schema-evolution lattice) of current bucket
   contents + batch winners, LWW again → final bucket contents. Deletes
   drop out here (a 'D' winner erases the url — anti-join semantics
   without a second shuffle).
4. Write new bucket files, then ONE atomic manifest commit recording the
   batch id → duplicate delivery of the same batch id is a no-op
   (exactly-once under ``foreachBatch`` retry semantics: the check happens
   *inside* the merge and the commit is atomic).

Metrics ride on ``df.observe`` (no extra pass over the data) and land in
the snapshot manifest together with per-bucket lineage.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opengin_ingestion_spark.operators.evolution import align_to_schema, evolve_schema
from opengin_ingestion_spark.operators.lww import lww_winners
from opengin_ingestion_spark.sources.gintable import (
    BUCKET_COL,
    DELETED_COL,
    SEQ_COL,
    CommitConflict,
    GinTable,
)

OP_COL = "op"


@dataclass
class MergeResult:
    skipped: bool
    version: int | None = None
    metrics: dict[str, Any] = field(default_factory=dict)


def merge_batch(
    table: GinTable,
    batch_df: DataFrame,
    batch_id: int,
    key: str = "url",
    ts: str = "warc_ts",
    seq: str = "seq",
    max_retries: int = 3,
) -> MergeResult:
    """Apply one change batch (columns: op,'I'|'U'|'D'; seq; key; ts;
    payload...) to the table. Idempotent per ``batch_id``."""
    last_err: Exception | None = None
    for _attempt in range(max_retries):
        try:
            return _merge_once(table, batch_df, batch_id, key, ts, seq)
        except CommitConflict as e:  # concurrent writer won — recompute on top
            last_err = e
    raise last_err  # type: ignore[misc]


def _merge_once(
    table: GinTable,
    batch_df: DataFrame,
    batch_id: int,
    key: str,
    ts: str,
    seq: str,
) -> MergeResult:
    snap = table.current_snapshot()
    if table.is_batch_applied(batch_id, snap):
        return MergeResult(skipped=True, version=snap["version"])

    t_start = time.time()

    # --- schema evolution decision (user columns only) ---------------------
    batch_user = T.StructType(
        [f for f in batch_df.schema.fields if f.name not in (OP_COL, seq)]
    )
    current_user = table.schema(snap)
    evolved_user = evolve_schema(current_user, batch_user)
    stored_schema = GinTable._with_internal(evolved_user)
    schema_changed = stored_schema != table.schema(snap, include_internal=True)
    schema_version = snap["schema_version"] + (1 if schema_changed else 0)

    # --- within-batch LWW winners (carry op through) -----------------------
    updates = batch_df.withColumnRenamed(seq, SEQ_COL)
    obs_in = Observation()
    updates = updates.observe(
        obs_in,
        F.count(F.lit(1)).alias("events_in"),
        F.sum(F.coalesce(F.length(F.col("html")), F.lit(0))).alias("bytes_in"),
        F.max(F.col(ts)).alias("max_event_ts"),
    )
    updates = align_to_schema(
        updates,
        T.StructType(
            [T.StructField(OP_COL, T.StringType(), False)] + list(stored_schema.fields)
        ),
    )
    updates = updates.withColumn(BUCKET_COL, table.bucket_expr(key, snap))
    winners = lww_winners(updates, key=key, ts=ts, seq=SEQ_COL).persist()

    touched = {r[0] for r in winners.select(BUCKET_COL).distinct().collect()}
    if not touched:  # empty batch: still record the batch id (exactly-once)
        winners.unpersist()
        new_snap = table.commit(
            [], set(), [batch_id],
            metrics={"events_in": 0, "rows_written": 0, "batch_id": batch_id},
            new_schema=evolved_user,
        )
        return MergeResult(skipped=False, version=new_snap["version"])

    # --- read ONLY touched buckets of the current snapshot ------------------
    # (include_internal keeps tombstones: they must participate in LWW so a
    # late out-of-order event cannot resurrect a deleted url)
    target = table.read(snap, buckets=touched, include_internal=True)
    target = align_to_schema(target, stored_schema)
    target = (
        target.withColumn(
            OP_COL,
            F.when(F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit("D")).otherwise(
                F.lit("I")
            ),
        )
        .withColumn(BUCKET_COL, table.bucket_expr(key, snap))
        .select(*winners.columns)
    )

    # --- cross LWW: existing state vs batch winners --------------------------
    obs_out = Observation()
    combined = target.unionByName(winners.select(*winners.columns))
    final_all = lww_winners(combined, key=key, ts=ts, seq=SEQ_COL).observe(
        obs_out,
        F.count(F.lit(1)).alias("winners"),
        F.sum((F.col(OP_COL) == "D").cast("long")).alias("deletes_applied"),
    )
    # deletes become tombstones: payload nulled, (warc_ts, _seq) retained
    payload_cols = [
        f.name
        for f in stored_schema.fields
        if f.name not in (key, ts) and not f.name.startswith("_")
    ]
    final = final_all.withColumn(DELETED_COL, F.col(OP_COL) == "D")
    for c in payload_cols:
        final = final.withColumn(
            c, F.when(F.col(DELETED_COL), F.lit(None)).otherwise(F.col(c))
        )
    final = final.drop(OP_COL)

    # --- copy-on-write: rewrite touched buckets, carry the rest -------------
    new_files = table.write_data_files(final, snap["version"] + 1, schema_version)
    winners.unpersist()

    in_m = obs_in.get
    out_m = obs_out.get
    max_ts = in_m.get("max_event_ts")
    lineage = [
        {
            "bucket": b,
            "rows": sum(f.rows for f in new_files if f.bucket == b),
            "bytes": sum(f.bytes for f in new_files if f.bucket == b),
            "files": sum(1 for f in new_files if f.bucket == b),
        }
        for b in sorted(touched)
    ]
    metrics = {
        "batch_id": batch_id,
        "events_in": in_m.get("events_in", 0),
        "bytes_in": in_m.get("bytes_in", 0) or 0,
        "winners": out_m.get("winners", 0),
        "deletes_applied": out_m.get("deletes_applied", 0) or 0,
        "rows_written": sum(f.rows for f in new_files),
        "buckets_rewritten": len(touched),
        "merge_seconds": round(time.time() - t_start, 3),
        "lag_seconds": (
            round(time.time() - max_ts.timestamp(), 3) if max_ts is not None else None
        ),
    }
    new_snap = table.commit(
        new_files,
        replaced_buckets=touched,
        batch_ids=[batch_id],
        metrics=metrics,
        lineage=lineage,
        new_schema=evolved_user,
        expected_parent=snap["version"],
    )
    return MergeResult(skipped=False, version=new_snap["version"], metrics=metrics)


def expire_tombstones(table: GinTable, watermark_ts) -> dict:
    """Physically drop tombstones older than the event-time watermark.

    A tombstone is only needed while an out-of-order event with a smaller
    (warc_ts, seq) could still arrive; once the source's lateness bound has
    passed (the watermark), it is dead weight. This is the GinTable analog
    of streaming state eviction — run it periodically (it rewrites every
    bucket that holds expirable tombstones, so schedule like a compaction).
    """
    snap = table.current_snapshot()
    full = table.read(snap, include_internal=True)
    expirable = F.coalesce(F.col(DELETED_COL), F.lit(False)) & (
        F.col("warc_ts") < F.lit(watermark_ts)
    )
    buckets_df = (
        full.filter(expirable)
        .select(table.bucket_expr("url", snap).alias(BUCKET_COL))
        .distinct()
    )
    touched = {r[0] for r in buckets_df.collect()}
    if not touched:
        return snap
    kept = (
        table.read(snap, buckets=touched, include_internal=True)
        .filter(~expirable)
        .withColumn(BUCKET_COL, table.bucket_expr("url", snap))
    )
    new_files = table.write_data_files(kept, snap["version"] + 1, snap["schema_version"])
    return table.commit(
        new_files,
        replaced_buckets=touched,
        batch_ids=[],
        metrics={"op": "expire_tombstones", "buckets_rewritten": len(touched)},
        expected_parent=snap["version"],
    )
