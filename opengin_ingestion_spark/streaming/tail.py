"""Streaming tail: readStream over the change-log dir → foreachBatch MERGE.

Exactly-once story (the layered guarantee):

1. Structured Streaming's checkpoint gives at-least-once delivery of each
   micro-batch with a STABLE, monotone ``batch_id`` (a batch replayed after
   a crash keeps its id).
2. ``merge_batch`` consults the table's applied-batch ranges *inside* the
   batch function and commits the id atomically with the data — so the
   replayed duplicate becomes a no-op.

Together: exactly-once table state under any crash/restart point, verified
by tests/test_streaming.py (kill mid-replay → restart → state equals the
batch oracle; manifest shows each batch id applied once).

``Trigger.AvailableNow`` = bounded replay mode (drain the log, then stop);
a processing-time trigger = live tailing. ``maxFilesPerTrigger`` bounds
micro-batch size — the knob that keeps a micro-batch's shuffle within
executor memory at scale.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from opengin_ingestion_spark.operators.merge import merge_batch
from opengin_ingestion_spark.plans.replay import (
    TRANSFORM_FIELDS,
    load_or_create_pages_table,
    pages_pandas_transform,
)
from opengin_ingestion_spark.sources.reader import read_changelog_stream


def tail_changelog(
    spark: SparkSession,
    log_dir: str,
    table_path: str,
    checkpoint_dir: str,
    n_buckets: int | None = 64,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
    dead_letter_dir: str | None = None,
    maintenance_every: int | None = None,
    tombstone_retention_seconds: float = 7 * 24 * 3600.0,
    compact_max_files: int = 4,
    schema_mapping=None,
    schema=None,
    drift_check=None,
) -> StreamingQuery:
    """Start the tail. Returns the StreamingQuery (caller awaits/stops).

    ``n_buckets=None`` sizes the table automatically from the log backlog
    on disk (``choose_n_buckets``; an empty dir estimates 0 bytes → the
    16-bucket floor; rebucket later if the table outgrows it).

    ``maintenance_every=k`` runs table maintenance inline every k
    micro-batches (after the merge commit): small-file compaction plus
    tombstone expiry at (max event time seen − ``tombstone_retention``).
    Without it a long-running tail accumulates one file per touched bucket
    per batch and tombstones forever. Maintenance commits are ordinary
    conflict-checked commits — a crash between merge and maintenance loses
    only maintenance, never data.

    ``schema`` pins the stream schema (default: inferred from the log at
    start — a Structured Streaming query cannot change schema mid-run).
    ``drift_check()`` (supervised_tail wires one) runs at the TOP of every
    micro-batch, BEFORE the merge: raising there kills the query with the
    batch id uncommitted, so the restarted query reprocesses that batch
    under the evolved schema — new columns are never silently dropped.
    """
    table = load_or_create_pages_table(spark, table_path, log_dir, n_buckets)

    stream = read_changelog_stream(
        spark, log_dir, schema=schema, max_files_per_trigger=max_files_per_trigger
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if drift_check is not None:
            drift_check()
        df = batch_df
        if dead_letter_dir is not None:
            from opengin_ingestion_spark.operators.validate import split_dead_letter

            df, dead = split_dead_letter(df)
            # validate BEFORE the expensive extract stage; dead letters are
            # written idempotently per batch id (a replayed batch overwrites
            # its own subdir, so duplicate delivery can't double-write)
            (
                dead.write.mode("overwrite").parquet(
                    f"{dead_letter_dir}/batch_id={batch_id}"
                )
            )
        res = merge_batch(
            table, df, batch_id=batch_id,
            pandas_transform=pages_pandas_transform,
            transform_fields=TRANSFORM_FIELDS,
            schema_mapping=schema_mapping,
        )
        if (
            maintenance_every
            and not res.skipped
            and batch_id % maintenance_every == maintenance_every - 1
        ):
            from opengin_ingestion_spark.operators.compact import compact
            from opengin_ingestion_spark.operators.merge import expire_tombstones
            from opengin_ingestion_spark.sources.gintable import CommitConflict

            # maintenance is best-effort: a concurrent writer winning the
            # commit race must not fail the micro-batch (the MERGE is
            # already committed; the next maintenance window retries)
            try:
                max_ts = res.metrics.get("max_event_ts")
                if max_ts is not None:
                    watermark = datetime.fromisoformat(max_ts) - timedelta(
                        seconds=tombstone_retention_seconds
                    )
                    expire_tombstones(table, watermark)
                compact(table, max_files_per_bucket=compact_max_files)
            except CommitConflict:
                pass

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


# Unique marker embedded in every SchemaDrift message. foreachBatch errors
# surface as StreamingQueryException whose Python cause chain is not
# reliably preserved across the JVM boundary, so the supervisor must match
# on the rendered string — this sentinel makes that match collision-proof
# (an unrelated error that merely *mentions* "SchemaDrift" is not
# misclassified as drift, and a genuine drift is recognized even when only
# the message text survives the wrapping).
DRIFT_SENTINEL = "[opengin-schema-drift:e5b1c6f2]"


class SchemaDrift(Exception):
    """New log files carry columns/types outside the stream's pinned
    schema — the running query must restart to pick them up."""

    def __init__(self, msg: str):
        super().__init__(f"{DRIFT_SENTINEL} {msg}")


def supervised_tail(
    spark: SparkSession,
    log_dir: str,
    table_path: str,
    checkpoint_dir: str,
    max_restarts: int = 5,
    **tail_kwargs,
) -> dict:
    """Run the tail under a schema-drift supervisor: when the log evolves
    mid-stream (a new file whose footer signature the pinned stream schema
    does not cover), the query is killed BEFORE the offending micro-batch
    merges, the schema is re-inferred, and the query restarts from its
    checkpoint — the aborted batch replays under the evolved schema and
    the table layer evolves at merge as usual. This closes the standard
    Structured Streaming gap (a running query's schema is fixed at start)
    without manual intervention.

    Drift detection is O(new files) per micro-batch: one Parquet footer
    peek per file not seen when the attempt's schema was pinned; widening
    (int32→int64) is NOT drift — Spark's reader already absorbs it.

    With ``available_now`` (default) each attempt drains the log and the
    call returns ``{"restarts": n, "schema": <final StructType>}``; a
    clean drain is followed by one more drift check so files that evolved
    the schema AFTER the drain's file listing still get applied. With a
    processing-time trigger the call supervises forever (until an
    unrelated error or ``max_restarts`` schema changes).
    """
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from opengin_ingestion_spark.sources.reader import (
        file_schema_sig,
        infer_log_schema,
    )

    restarts = 0
    while True:
        # list BEFORE pinning: a file landing between the two calls is then
        # NOT in `seen`, so drift_check footer-peeks it — it either fits the
        # pinned schema (infer saw it) or raises before its batch merges.
        # The reverse order would let such a file slip into `seen`
        # unchecked and have its new columns silently dropped.
        seen = {
            f for f in os.listdir(log_dir) if f.endswith(".parquet")
        }
        pinned = infer_log_schema(log_dir)
        pinned_sig = {
            (f.name, f.dataType.simpleString()) for f in pinned.fields
        }

        def drift_check(_seen=seen, _pinned=pinned_sig):
            for f in sorted(os.listdir(log_dir)):
                if not f.endswith(".parquet") or f in _seen:
                    continue
                sig = file_schema_sig(os.path.join(log_dir, f))
                if not sig <= _pinned:
                    raise SchemaDrift(
                        f"log file {f} carries {sorted(sig - _pinned)} "
                        "outside the pinned stream schema"
                    )
                _seen.add(f)  # covered era: never re-peek this footer

        q = tail_changelog(
            spark, log_dir, table_path, checkpoint_dir,
            schema=pinned, drift_check=drift_check, **tail_kwargs,
        )
        try:
            q.awaitTermination()
        except StreamingQueryException as e:
            # only an actual SchemaDrift raised by drift_check warrants a
            # restart — an unrelated failure (dead-letter IO error, a merge
            # bug) must surface even if the log happens to be evolving at
            # the same moment, not burn max_restarts re-running it. Match
            # on the unique sentinel, not the class name: an unrelated
            # error whose message mentions "SchemaDrift" must not be
            # misrouted to the restart path.
            if DRIFT_SENTINEL not in str(e):
                raise
            new_sig = {
                (f.name, f.dataType.simpleString())
                for f in infer_log_schema(log_dir).fields
            }
            if new_sig == pinned_sig or restarts >= max_restarts:
                # re-infer resolves to the same schema (shouldn't happen:
                # a non-widenable era now raises inside infer_log_schema),
                # or a drift storm past max_restarts — surface it
                raise
            restarts += 1
            continue
        # clean drain: files may still have evolved after this attempt's
        # listing — re-pin and drain them too
        new_sig = {
            (f.name, f.dataType.simpleString())
            for f in infer_log_schema(log_dir).fields
        }
        if new_sig != pinned_sig:
            if restarts >= max_restarts:
                # never return success-shaped output with evolved files
                # left unapplied (the exception path raises here too)
                raise RuntimeError(
                    f"log schema evolved again after {restarts} restarts "
                    f"(max_restarts={max_restarts}); the newest era's files "
                    "are NOT applied — raise max_restarts or re-run"
                )
            restarts += 1
            continue
        return {"restarts": restarts, "schema": pinned}
