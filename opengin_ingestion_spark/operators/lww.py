"""Last-writer-wins conflict resolution by (warc_ts, seq).

Reference analog: page order decides merge order — fragments are applied in
ascending page number (/root/reference/python/src/opengin/tracer/
orchestrator.py:171-175 sorts intermediate files; aggregator.py:82-84
extends rows in that order). The CDC engine generalizes "arrival order" to
an explicit event-time ordering key ``(warc_ts, seq)`` so replay becomes
order-insensitive: whatever order events arrive in, the winner per url is
the max ordering key.

Two implementations:

* ``lww_winners`` (DEFAULT) — ``groupBy(url).agg(max_by(payload, ord))``.
  Catalyst plans this as HashAggregate with **partial (map-side)
  aggregation**, so a hot url collapses to one row per map task *before*
  the shuffle — this is the skew-resistant path and the one the engine
  uses at scale. No sort, no full window buffering.
* ``lww_winners_window`` — the textbook ``row_number() over (partition by
  url order by warc_ts desc, seq desc) = 1``. Kept for plan comparison and
  as an oracle for the aggregate variant (tests assert they agree); a
  window must shuffle ALL rows of a hot url to one partition, which is
  exactly the skew the aggregate variant avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_winners(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    seq: str = "_seq",
) -> DataFrame:
    """One winning row per ``key``: max (ts, seq). Skew-resistant
    (partial-aggregable). ``seq`` must be unique → deterministic."""
    payload = F.struct(*[F.col(c) for c in df.columns])
    order_key = F.struct(F.col(ts), F.col(seq))
    return (
        df.groupBy(key)
        .agg(F.max_by(payload, order_key).alias("_winner"))
        .select("_winner.*")
    )


# above this many winner keys, a forced driver broadcast (8 B/key → ~160 MB
# at the limit) risks driver/executor memory; below it, forcing BHJ is a
# clear win because the alternative SMJ shuffles the full payload
_BROADCAST_KEY_LIMIT = 20_000_000


def lww_winners_semi(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    seq: str = "_seq",
    broadcast: bool | None = None,
    est_keys: int | None = None,
) -> DataFrame:
    """Payload-free LWW: aggregate ONLY (key, ts, seq) to find winner seqs,
    then join back to recover winner rows.

    This is the scale path for wide payloads (html is ~KB per event): the
    aggregation shuffle moves 24-byte keys instead of full rows, partial
    aggregation collapses hot urls map-side, and the join-back is a
    broadcast hash join whenever the winner-key set is small enough — so
    the payload NEVER crosses a shuffle in this operator.

    ``broadcast=None`` (default) auto-selects: with ``est_keys`` (callers
    in the merge path already know events_in, an upper bound on winners)
    the BHJ hint is forced only under ``_BROADCAST_KEY_LIMIT`` keys; with
    NO estimate, no extra action is spent — the join is left unhinted and
    AQE builds a runtime BHJ from the aggregate's actual size whenever it
    fits. Pass True/False to override.

    Requires ``seq`` globally unique (CDC sequence numbers are). If the
    input can contain full duplicate rows with the same seq (duplicate
    file delivery), dedupe downstream on (key, seq).
    """
    winner_seqs = (
        df.select(key, ts, seq)
        .groupBy(key)
        .agg(F.max(F.struct(F.col(ts), F.col(seq))).alias("_k"))
        .select(F.col(f"_k.{seq}").alias(seq))
    )
    if broadcast is None:
        broadcast = est_keys is not None and est_keys <= _BROADCAST_KEY_LIMIT
    if broadcast:
        winner_seqs = F.broadcast(winner_seqs)
    return df.join(winner_seqs, seq)


def lww_winners_window(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    seq: str = "_seq",
) -> DataFrame:
    """Window formulation of the same semantics (reference/oracle path)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col(seq).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
