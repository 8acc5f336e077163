"""Streaming deduplication: exactly-once-style event dedup inside the
stream itself, state bounded by the event-time watermark.

The table layer already makes REPLAYED MICRO-BATCHES idempotent
(applied-batch ranges); this operator handles the other duplicate class —
the same EVENT delivered in two different micro-batches (an at-least-once
upstream re-sending rows). ``dropDuplicatesWithinWatermark`` keeps one row
per key and evicts its dedup state once the watermark passes, so state is
O(events within the lateness window), never unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream_df: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "warc_ts",
    lateness: str = "1 hour",
) -> DataFrame:
    """Drop duplicate events by ``keys`` (default: the CDC sequence number)
    within the event-time lateness window.

    ``lateness`` must be ≥ the source's true out-of-orderness: a duplicate
    arriving later than the window is no longer in dedup state (it will be
    re-emitted — downstream LWW still converges, so this is a bandwidth
    optimization with a correctness backstop, not a single line of
    defense).
    """
    keys = keys or ["seq"]
    return stream_df.withWatermark(ts_col, lateness).dropDuplicatesWithinWatermark(
        keys
    )
