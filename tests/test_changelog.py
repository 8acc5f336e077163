"""Generator unit tests: determinism, zipf skew, evolution schedule."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from opengin_ingestion_spark.sources.changelog import (
    ChangeLogSpec,
    generate_changelog,
    make_duplicated_variant,
    make_html,
    make_shuffled_variant,
)
from tests.oracle import read_log_pandas


def test_make_html_deterministic():
    a = make_html("https://a.com/1", 7)
    b = make_html("https://a.com/1", 7)
    c = make_html("https://a.com/1", 8)
    assert a == b and a != c
    assert b"<script>" in a and b"</html>" in a


def test_generate_deterministic(tmp_path):
    spec = ChangeLogSpec(n_events=500, n_urls=50, n_batches=4, seed=7)
    i1 = generate_changelog(str(tmp_path / "a"), spec)
    i2 = generate_changelog(str(tmp_path / "b"), spec)
    assert i1["n_events"] == i2["n_events"] == 500
    for f1, f2 in zip(i1["files"], i2["files"]):
        assert pq.read_table(f1).equals(pq.read_table(f2))


def test_zipf_skew(tiny_log):
    df = read_log_pandas(tiny_log["dir"])
    counts = df["url"].value_counts()
    # hot url should dominate: top url sees >5% of all events
    assert counts.iloc[0] > 0.05 * len(df)
    assert df["seq"].is_unique
    # first event per url is an insert
    firsts = df.sort_values("seq").groupby("url").first()
    assert (firsts["op"] == "I").all()


def test_evolution_schedule(evolving_log):
    files = sorted(os.listdir(evolving_log["dir"]))
    pre = pq.read_schema(os.path.join(evolving_log["dir"], files[0]))
    post = pq.read_schema(os.path.join(evolving_log["dir"], files[-1]))
    assert "lang" not in pre.names and "lang" in post.names
    assert str(pre.field("content_len").type) == "int32"
    assert str(post.field("content_len").type) == "int64"


def test_variants(tiny_log, tmp_path):
    dup = make_duplicated_variant(tiny_log["dir"], str(tmp_path / "dup"), [0, 3])
    assert len(dup) == tiny_log["n_batches"] + 2
    shuf = make_shuffled_variant(tiny_log["dir"], str(tmp_path / "shuf"))
    base = read_log_pandas(tiny_log["dir"]).sort_values("seq").reset_index(drop=True)
    shufd = read_log_pandas(str(tmp_path / "shuf")).sort_values("seq").reset_index(drop=True)
    # same logical events, different physical order
    assert base.equals(shufd)


def test_infer_log_schema_widens_and_rejects(tmp_path):
    """Era inference: int32→long and float→double widen (Parquet-reader
    upcasts, one schema covers all eras); a conflict beyond the widening
    map fails fast with direction instead of silently narrowing."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from opengin_ingestion_spark.sources.reader import infer_log_schema

    ok = tmp_path / "ok"
    ok.mkdir()
    pq.write_table(pa.table({"x": pa.array([1], pa.int32())}), str(ok / "a.parquet"))
    pq.write_table(
        pa.table({"x": pa.array([2], pa.int64()), "y": pa.array([0.5], pa.float32())}),
        str(ok / "b.parquet"),
    )
    sch = {f.name: f.dataType.simpleString() for f in infer_log_schema(str(ok)).fields}
    assert sch == {"x": "bigint", "y": "double"}

    bad = tmp_path / "bad"
    bad.mkdir()
    pq.write_table(pa.table({"x": pa.array([1.0], pa.float64())}), str(bad / "a.parquet"))
    pq.write_table(pa.table({"x": pa.array(["s"], pa.string())}), str(bad / "b.parquet"))
    with pytest.raises(ValueError, match="incompatible schema eras"):
        infer_log_schema(str(bad))


def test_unmapped_arrow_type_fails_fast(tmp_path):
    """An Arrow type outside the widening map (e.g. decimal) must raise at
    inference — NOT silently map to string, which would collapse two
    incompatible eras into one signature, blind the drift supervisor, and
    surface as a raw Parquet cast error mid-batch instead."""
    import decimal

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from opengin_ingestion_spark.sources.reader import (
        arrow_field_spark_type,
        infer_log_schema,
    )

    d = tmp_path / "dec"
    d.mkdir()
    pq.write_table(
        pa.table({"x": pa.array([decimal.Decimal("1.5")], pa.decimal128(10, 2))}),
        str(d / "a.parquet"),
    )
    with pytest.raises(ValueError, match="outside the widening map"):
        infer_log_schema(str(d))
    # supported additions map, not raise
    assert arrow_field_spark_type(pa.field("b", pa.bool_())).simpleString() == "boolean"
    assert arrow_field_spark_type(pa.field("d", pa.date32())).simpleString() == "date"
    assert arrow_field_spark_type(pa.field("i", pa.int8())).simpleString() == "bigint"


def test_schema_drift_sentinel():
    """supervised_tail routes restart-vs-fail on a unique sentinel token in
    the rendered exception — an unrelated error that merely mentions
    'SchemaDrift' must not be classified as drift."""
    from opengin_ingestion_spark.streaming.tail import DRIFT_SENTINEL, SchemaDrift

    e = SchemaDrift("file x carries new columns")
    assert DRIFT_SENTINEL in str(e)
    impostor = RuntimeError("merge failed while log SchemaDrift was pending")
    assert DRIFT_SENTINEL not in str(impostor)
