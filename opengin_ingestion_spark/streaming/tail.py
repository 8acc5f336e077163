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
    """
    table = load_or_create_pages_table(spark, table_path, log_dir, n_buckets)

    stream = read_changelog_stream(
        spark, log_dir, max_files_per_trigger=max_files_per_trigger
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
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
