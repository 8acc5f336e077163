"""Event-time windowed aggregation and custom stateful sessionization over
the change-event stream (SURVEY §2.9: watermarks + windowed aggs for late
data; applyInPandasWithState for operators Spark lacks).

* ``windowed_event_counts`` — the canonical Structured Streaming shape:
  watermark → tumbling event-time window → partial-aggregable counts.
  Late events inside the lateness bound still land in their window; later
  than that, the window's state has been evicted and they are dropped
  (counted by Spark's numDroppedRows metric).
* ``sessionize`` — a custom stateful operator: per-key gap-based sessions
  (a session ends after ``gap`` of event-time silence). Not expressible
  with built-in windows pre-3.2-style; implemented with
  ``applyInPandasWithState`` — per-key pandas state (open session bounds),
  event-time timeout closes idle sessions, state size O(open sessions).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def session_schema(key_col: str = "url", key_type: T.DataType | None = None) -> T.StructType:
    return T.StructType(
        [
            T.StructField(key_col, key_type or T.StringType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )


SESSION_SCHEMA = session_schema()

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts_ns", T.ArrayType(T.LongType())),
        T.StructField("ends_ns", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
    ]
)


def windowed_event_counts(
    stream_df: DataFrame,
    window: str = "10 minutes",
    lateness: str = "1 hour",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Tumbling event-time window counts per op type, watermarked so state
    is bounded and late data inside the bound is still aggregated."""
    return (
        stream_df.withWatermark(ts_col, lateness)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("url").alias("approx_urls"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "n_events",
            "approx_urls",
        )
    )


def sessionize_builtin(
    stream_df: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "warc_ts",
    key_col: str = "url",
    lateness: str = "1 hour",
) -> DataFrame:
    """Gap sessions via Spark's BUILT-IN session_window (the preferred
    path: correct session merging under late data comes from the engine's
    own state store, no custom code). Emits a session once the watermark
    passes its close."""
    return (
        stream_df.withWatermark(ts_col, lateness)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("sw"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def _merge_sessions(
    sessions: list[tuple[int, int, int]], gap_ns: int
) -> list[tuple[int, int, int]]:
    """Merge (start, end, n) intervals whose gaps are ≤ gap_ns."""
    sessions = sorted(sessions)
    out: list[tuple[int, int, int]] = []
    for s, e, n in sessions:
        if out and s - out[-1][1] <= gap_ns:
            ps, pe, pn = out[-1]
            out[-1] = (ps, max(pe, e), pn + n)
        else:
            out.append((s, e, n))
    return out


def sessionize(
    stream_df: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "warc_ts",
    key_col: str = "url",
    lateness: str = "1 hour",
) -> DataFrame:
    """The same gap sessions via ``applyInPandasWithState`` — the template
    for stateful logic session_window can NOT express (per-session custom
    aggregates, early heartbeats, cross-field state).

    Correctness under late data: the per-key state holds the full MERGED
    session set; nothing is emitted when a session merely looks closed
    (a late in-bound event may still bridge it). A session is emitted —
    exactly once, final — only when the event-time watermark passes its
    end + gap, on either a data call or an event-time timeout. State is
    O(sessions within the lateness horizon) per key.
    """
    gap_ns = gap_seconds * 1_000_000_000
    gap_ms = gap_seconds * 1000
    out_schema = session_schema(key_col, stream_df.schema[key_col].dataType)

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        sessions: list[tuple[int, int, int]] = []
        if state.exists:
            starts, ends, ns = state.get
            sessions = list(zip(starts, ends, ns))
        if not state.hasTimedOut:
            # pandas datetime64[ns] → int64 is NANOSECONDS since epoch
            new_ts = pd.concat([p[ts_col] for p in pdfs]).astype("int64")
            sessions = _merge_sessions(
                sessions + [(int(t), int(t), 1) for t in new_ts], gap_ns
            )
        # emit only sessions the watermark has STRICTLY sealed: Spark
        # admits events with ts >= watermark, so a bridging event at
        # exactly end+gap is still possible until wm_ns > end+gap (and the
        # ms floor must round AGAINST sealing, never toward it)
        wm_ns = state.getCurrentWatermarkMs() * 1_000_000
        ripe = [x for x in sessions if x[1] + gap_ns < wm_ns]
        keep = [x for x in sessions if x[1] + gap_ns >= wm_ns]
        if keep:
            state.update((
                [s for s, _, _ in keep],
                [e for _, e, _ in keep],
                [n for _, _, n in keep],
            ))
            # wake when the earliest remaining session matures (must be
            # strictly beyond the current watermark)
            state.setTimeoutTimestamp(
                max(
                    min(e // 1_000_000 for _, e, _ in keep) + gap_ms + 1,
                    wm_ns // 1_000_000 + 1,
                )
            )
        else:
            state.remove()
        if ripe:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(ripe),
                    "session_start": [pd.Timestamp(s, unit="ns") for s, _, _ in ripe],
                    "session_end": [pd.Timestamp(e, unit="ns") for _, e, _ in ripe],
                    "n_events": [n for _, _, n in ripe],
                }
            )

    return (
        stream_df.withWatermark(ts_col, lateness)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
