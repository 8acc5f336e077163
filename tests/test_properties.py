"""Property-based tests (hypothesis): the LWW/merge laws that make the
engine correct under ANY delivery schedule — order-insensitivity,
duplicate-insensitivity, batching-insensitivity — checked against a plain
pandas fold. Complements the example-based replay tests."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from opengin_ingestion_spark.operators.evolution import (
    SchemaEvolutionError,
    evolve_schema,
)
from pyspark.sql import types as T


# --- pure-model properties (no Spark: fast, thousands of cases) -----------

def _lww_fold(events: list[tuple]) -> dict:
    """Reference fold: events (url, ts, seq, op, payload) → final state."""
    best: dict[str, tuple] = {}
    for url, ts, seq, op, payload in events:
        cur = best.get(url)
        if cur is None or (ts, seq) > (cur[0], cur[1]):
            best[url] = (ts, seq, op, payload)
    return {u: v for u, v in best.items() if v[2] != "D"}


event_st = st.tuples(
    st.sampled_from([f"u{i}" for i in range(8)]),  # few urls → collisions
    st.integers(0, 50),  # ts (ties possible)
    st.integers(0, 10_000),  # seq
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 99),
)
events_st = st.lists(event_st, max_size=60, unique_by=lambda e: e[2])  # unique seq


@given(events_st, st.randoms())
@settings(max_examples=200)
def test_lww_fold_order_insensitive(events, rnd):
    shuffled = list(events)
    rnd.shuffle(shuffled)
    assert _lww_fold(events) == _lww_fold(shuffled)


@given(events_st, st.data())
@settings(max_examples=200)
def test_lww_fold_duplicate_insensitive(events, data):
    if events:
        dup = data.draw(st.lists(st.sampled_from(events), max_size=10))
    else:
        dup = []
    assert _lww_fold(events + dup) == _lww_fold(events)


def _live(state: dict) -> dict:
    """Observable state: url → (ts, seq, payload). The op label is not
    observable (carried rows relabel to 'I', exactly as the engine's
    target side does)."""
    return {u: (ts, seq, p) for u, (ts, seq, _op, p) in state.items()}


@given(events_st, st.integers(1, 5))
@settings(max_examples=200)
def test_lww_fold_batching_insensitive(events, k):
    """Folding batch-by-batch (with carry) equals one-shot fold — the law
    that makes incremental MERGE equal full replay."""
    whole = _lww_fold(events)
    state: dict = {}
    carry: list = []
    for i in range(0, max(len(events), 1), k):
        batch = events[i : i + k]
        state = _lww_fold(
            [(u, ts, seq, "I", p) for u, (ts, seq, _op, p) in state.items()]
            + [
                (u, ts, seq, op, p)
                for (u, ts, seq, op, p) in carry + batch
            ]
        )
        # tombstones must carry too — model them as the raw D events
        carry = [
            e
            for e in carry + batch
            if e[3] == "D"
        ]
    assert _live(state) == _live(whole)


# --- evolution lattice properties ------------------------------------------

_types = st.sampled_from(
    [T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType(), T.StringType()]
)
_schema_st = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d"]), _types, min_size=1, max_size=4
).map(lambda d: T.StructType([T.StructField(k, v, True) for k, v in d.items()]))


def _try_evolve(cur, inc):
    try:
        return evolve_schema(cur, inc)
    except SchemaEvolutionError:
        return None


@given(_schema_st, _schema_st)
@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
def test_evolution_idempotent_and_monotone(cur, inc):
    out = _try_evolve(cur, inc)
    if out is None:
        return
    # idempotent: applying the same incoming again changes nothing
    assert _try_evolve(out, inc) == out
    # monotone: every current column survives, possibly widened, never lost
    names = out.fieldNames()
    assert all(f.name in names for f in cur.fields)
    # the evolved schema accepts both sides (no information loss)
    assert _try_evolve(out, cur) == out


@given(_schema_st, _schema_st, _schema_st)
@settings(max_examples=200, suppress_health_check=[HealthCheck.too_slow])
def test_evolution_associative_when_defined(a, b, c):
    ab = _try_evolve(a, b)
    left = _try_evolve(ab, c) if ab is not None else None
    bc = _try_evolve(b, c)
    right = _try_evolve(a, bc) if bc is not None else None
    if left is not None and right is not None:
        assert {f.name: f.dataType for f in left.fields} == {
            f.name: f.dataType for f in right.fields
        }


# --- one Spark-backed property (sampled: Spark runs are slow) --------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spark_lww_matches_fold(spark, seed):
    import random

    rnd = random.Random(seed)
    events = [
        (
            f"u{rnd.randint(0, 7)}",
            rnd.randint(0, 50),
            seq,
            rnd.choice(["I", "U", "D"]),
            rnd.randint(0, 99),
        )
        for seq in range(120)
    ]
    rnd.shuffle(events)
    from pyspark.sql import functions as F

    from opengin_ingestion_spark.operators.lww import (
        lww_winners,
        lww_winners_semi,
        lww_winners_window,
    )

    df = spark.createDataFrame(
        [(u, ts, seq, op, p) for (u, ts, seq, op, p) in events],
        "url string, ts long, _seq long, op string, payload long",
    )
    expect = _lww_fold(events)
    for impl in (lww_winners, lww_winners_window, lww_winners_semi):
        got = {
            r["url"]: (r["ts"], r["_seq"], r["op"], r["payload"])
            for r in impl(df, key="url", ts="ts", seq="_seq").collect()
            if r["op"] != "D"
        }
        assert got == expect, impl.__name__


# --- heavy-family _seq uniqueness under ANY delivery schedule (round 3) ----

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_heavy_uniqueness_under_redelivery(spark, seed, tmp_path):
    """For a random event set, random batching, and random REDELIVERY of
    whole batches under fresh batch ids: the heavy family never holds two
    rows for one _seq (the heavy_seq_unique manifest invariant), and the
    final table state equals the pandas LWW fold."""
    import os
    import random
    from datetime import datetime, timezone

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from opengin_ingestion_spark.operators.merge import merge_batch
    from opengin_ingestion_spark.sources.gintable import GinTable

    rnd = random.Random(seed)
    events = [
        (
            f"u{rnd.randint(0, 9)}",
            datetime(2024, 1, 1, tzinfo=timezone.utc).replace(hour=rnd.randint(0, 23)),
            seq,
            rnd.choice(["I", "I", "U", "D"]),
            f"payload-{seq}".encode(),
        )
        for seq in range(80)
    ]
    rnd.shuffle(events)
    # random batching + redelivery of some batches under fresh ids
    batches = []
    i = 0
    while i < len(events):
        k = rnd.randint(1, 20)
        batches.append(events[i : i + k])
        i += k
    delivery = list(batches) + [rnd.choice(batches) for _ in range(2)]

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("html", T.BinaryType()),
    ])
    table = GinTable.create(
        spark, str(tmp_path / f"t{seed}"),
        T.StructType([f for f in schema.fields if f.name not in ("seq", "op")]),
        n_buckets=4, heavy_columns=("html",),
    )
    for bid, batch in enumerate(delivery):
        df = spark.createDataFrame(
            [(u, ts, s, op, h) for (u, ts, s, op, h) in batch], schema
        )
        merge_batch(table, df, batch_id=bid)

    snap = table.current_snapshot()
    assert snap["heavy_seq_unique"] is True
    heavy_paths = [
        os.path.join(table.path, f["path"])
        for f in snap["files"] if f.get("family") == "heavy"
    ]
    if heavy_paths:
        hdf = spark.read.parquet(*heavy_paths)
        dup = hdf.groupBy("_seq").count().filter(F.col("count") > 1).count()
        assert dup == 0, "heavy family holds a duplicate _seq"

    # final state == pandas LWW fold (live winners with their payload)
    best: dict = {}
    for u, ts, s, op, h in events:
        cur = best.get(u)
        if cur is None or (ts, s) > (cur[0], cur[1]):
            best[u] = (ts, s, op, h)
    expect = {
        u: (ts, h) for u, (ts, s, op, h) in best.items() if op != "D"
    }
    got = {
        r["url"]: (r["warc_ts"].replace(tzinfo=timezone.utc), bytes(r["html"]))
        for r in table.read().collect()
    }
    assert got == expect
