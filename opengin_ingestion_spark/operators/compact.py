"""Table maintenance: small-file compaction for GinTable buckets.

A long-running incremental-ingest table accumulates one file per bucket
per touched batch. Compaction rewrites fragmented buckets back to one file
each, in a normal copy-on-write commit (snapshot isolation: readers of the
old snapshot are unaffected; the commit is atomic and conflict-checked).

Scale posture: compaction is scheduled per-bucket by a fragmentation
threshold, so the work is proportional to fragmentation, not table size —
the same strategy as Iceberg's bin-packing rewriteDataFiles (public
knowledge). Reference analog: the reference's exporter rewrites whole
outputs each run (exporter.py:28-103); here rewrite is surgical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opengin_ingestion_spark.sources.gintable import BUCKET_COL, GinTable


def fragmented_buckets(table: GinTable, max_files_per_bucket: int = 4) -> set[int]:
    """Buckets where ANY column family's live-file count exceeds the
    threshold. On a split table the MERGE keeps base at one file per bucket
    but appends a heavy file per touched batch — heavy accumulation is the
    normal compaction trigger."""
    snap = table.current_snapshot()
    counts: dict[tuple[int, str], int] = {}
    for f in snap["files"]:
        k = (f["bucket"], f.get("family", "base"))
        counts[k] = counts.get(k, 0) + 1
    return {b for (b, _fam), n in counts.items() if n > max_files_per_bucket}


def rebucket(table: GinTable, new_n_buckets: int, key: str = "url") -> dict:
    """Change the table's bucket count: rewrite EVERY row under the new
    ``pmod(xxhash64(key), new_n_buckets)`` scheme in one copy-on-write
    commit. Use when a table sized by the first batch outgrows its buckets
    (a bucket's working set must stay within executor memory — see
    choose_n_buckets). Snapshot-isolated: old snapshots keep their own
    n_buckets, so time-travel reads still prune correctly."""
    from pyspark.sql import functions as F

    snap = table.current_snapshot()
    if new_n_buckets == snap["n_buckets"]:
        return snap
    rows = (
        table.read(snap, include_internal=True)
        .withColumn(BUCKET_COL, table.bucket_expr(key, snap, n_buckets=new_n_buckets))
        .repartition(new_n_buckets, F.col(BUCKET_COL))
    )
    new_files = table.write_split_data_files(
        rows, snap["version"] + 1, snap["schema_version"]
    )
    return table.commit(
        new_files,
        replaced_buckets={f["bucket"] for f in snap["files"]},
        batch_ids=[],
        metrics={
            "op": "rebucket",
            "n_buckets_old": snap["n_buckets"],
            "n_buckets_new": new_n_buckets,
            "files_written": len(new_files),
        },
        expected_parent=snap["version"],
        new_n_buckets=new_n_buckets,
        # full-table rewrite from deduplicated read state: preserves the
        # invariant (establishing it on a pre-invariant table would also
        # require base-row _seq uniqueness, which a legacy external writer
        # could have violated — stay conservative)
        heavy_seq_unique=snap.get("heavy_seq_unique", False),
    )


def compact(table: GinTable, max_files_per_bucket: int = 4) -> dict:
    """Rewrite fragmented buckets to one file each. Returns the new
    snapshot (or the current one if nothing to do)."""
    snap = table.current_snapshot()
    buckets = fragmented_buckets(table, max_files_per_bucket)
    if not buckets:
        return snap
    rows = (
        table.read(snap, buckets=buckets, include_internal=True)
        .withColumn(BUCKET_COL, table.bucket_expr("url", snap))
        .repartition(len(buckets), F.col(BUCKET_COL))
    )
    # full rewrite of the fragmented buckets: both families; stale heavy
    # rows (superseded payload versions) are dropped here
    new_files = table.write_split_data_files(
        rows, snap["version"] + 1, snap["schema_version"]
    )
    return table.commit(
        new_files,
        replaced_buckets=buckets,
        batch_ids=[],
        metrics={
            "op": "compact",
            "buckets_compacted": len(buckets),
            "files_written": len(new_files),
        },
        expected_parent=snap["version"],
        # partial rewrite from deduplicated read state: preserves (but
        # cannot establish) the invariant — untouched buckets keep their
        # old heavy files
        heavy_seq_unique=snap.get("heavy_seq_unique", False),
    )
