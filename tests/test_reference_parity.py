"""Reference-parity tests mirroring the reference's own unit suite
(/root/reference/python/tests/test_agents.py): fragment merge across
pages, schema-mismatch variant forking, CSV export content, filename
collision idempotence, and response parsing (fences / shapes / errors)."""

from __future__ import annotations

import csv
import json

from pyspark.sql import functions as F

from opengin_ingestion_spark.functions.json_parse import (
    parse_responses,
    sanitize_name,
    strip_fences,
)
from opengin_ingestion_spark.operators.aggregate_tables import (
    aggregate_table_fragments,
)
from opengin_ingestion_spark.plans.export import export_csv

FRAG_SCHEMA = (
    "page_num int, table_name string, columns array<string>, "
    "rows array<array<string>>"
)


def test_fragment_merge_across_pages(spark):
    """Same name + same columns on two pages → one table, rows in page
    order (reference tests/test_agents.py:59-84)."""
    frags = spark.createDataFrame(
        [
            (2, "Invoice Table", ["id", "amount"], [["3", "30"], ["4", "40"]]),
            (1, " invoice table ", ["id", "amount"], [["1", "10"], ["2", "20"]]),
        ],
        FRAG_SCHEMA,
    )
    out = aggregate_table_fragments(frags).collect()
    assert len(out) == 1
    row = out[0]
    assert row["table_name"] == "invoice table"
    assert row["name_variant"] == "invoice table"
    assert row["rows"] == [["1", "10"], ["2", "20"], ["3", "30"], ["4", "40"]]
    assert row["n_fragments"] == 2 and row["n_rows"] == 4


def test_schema_mismatch_forks_variant(spark):
    """Same name, different columns → deterministic variants in page order
    (reference tests/test_agents.py:143-195: Sales + Sales variant)."""
    frags = spark.createDataFrame(
        [
            (1, "Sales", ["month", "total"], [["jan", "1"]]),
            (2, "Sales", ["month", "total", "region"], [["feb", "2", "us"]]),
            (3, "Sales", ["month", "total"], [["mar", "3"]]),
        ],
        FRAG_SCHEMA,
    )
    out = {r["name_variant"]: r for r in aggregate_table_fragments(frags).collect()}
    assert set(out) == {"sales", "sales_1"}
    assert out["sales"]["rows"] == [["jan", "1"], ["mar", "3"]]  # merged
    assert out["sales_1"]["rows"] == [["feb", "2", "us"]]
    assert out["sales"]["variant"] == 0 and out["sales_1"]["variant"] == 1


def test_export_csv_content_and_collision(spark, tmp_path):
    """CSV content + sidecar + collision-counter idempotence (reference
    tests/test_agents.py:88-140)."""
    df = spark.createDataFrame([("1", "10"), ("2", "20")], "id string, amount string")
    out = str(tmp_path)
    r1 = export_csv(df, out, "my_table", metadata={"source": "t"})
    with open(r1["csv"]) as fh:
        rows = list(csv.reader(fh))
    assert rows == [["id", "amount"], ["1", "10"], ["2", "20"]]
    assert json.load(open(r1["metadata"])) == {"source": "t"}
    # re-export never overwrites: my_table.csv, my_table_1.csv, my_table_2.csv
    r2 = export_csv(df, out, "my_table")
    r3 = export_csv(df, out, "my_table")
    assert r1["csv"].endswith("my_table.csv")
    assert r2["csv"].endswith("my_table_1.csv")
    assert r3["csv"].endswith("my_table_2.csv")


def test_sanitize_name(spark):
    df = spark.createDataFrame([("  My Table (v2)! ",), ("already_ok-1",)], ["n"])
    got = [r[0] for r in df.select(sanitize_name("n")).collect()]
    assert got == ["my_table_v2", "already_ok-1"]


def test_parse_responses_shapes_and_errors(spark):
    """P1-P3: fenced / bare-list / object shapes parse; garbage → dead
    letter with reason (reference schema.py:48-100)."""
    table_json = (
        '{"id": "t1", "name": "Inv", "columns": ["a"], "rows": [["1"]],'
        ' "metadata": {"k": "v"}}'
    )
    rows = [
        (1, f'```json\n{{"tables": [{table_json}]}}\n```'),
        (2, f"[{table_json}]"),
        (3, f'{{"tables": [{table_json}]}}'),
        (4, "this is not json at all {"),
    ]
    df = spark.createDataFrame(rows, "page int, raw_response string")
    ok, dead = parse_responses(df)
    parsed = {r["page"]: r["tables"] for r in ok.collect()}
    assert set(parsed) == {1, 2, 3}
    for tables in parsed.values():
        assert tables[0]["name"] == "Inv"
        assert tables[0]["rows"] == [["1"]]
        assert tables[0]["metadata"] == {"k": "v"}
    dead_rows = dead.collect()
    assert len(dead_rows) == 1
    assert dead_rows[0]["page"] == 4 and dead_rows[0]["reason"] == "json_parse_error"


def test_strip_fences_only_when_fenced(spark):
    df = spark.createDataFrame(
        [("```json\n[1]\n```",), ("```\n[2]\n```",), ("[3]",)], ["s"]
    )
    got = [r[0] for r in df.select(strip_fences("s")).collect()]
    assert got == ["[1]", "[2]", "[3]"]


def test_export_zip_and_path_safety(spark, tmp_path):
    """S9 zip export + P9 path-containment parity: the archive carries
    every export artifact under relative names, names collision-free like
    the other sinks, publishes atomically, and refuses symlinked members
    that resolve outside the export tree."""
    import os
    import zipfile

    from opengin_ingestion_spark.operators.validate import is_safe_path
    from opengin_ingestion_spark.plans.export import export_zip

    out = str(tmp_path / "run")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    export_csv(df, out, "t1", metadata={"source": "x"})
    export_csv(df, out, "t2")

    z1 = export_zip(out, str(tmp_path / "dl"))
    with zipfile.ZipFile(z1) as zf:
        names = set(zf.namelist())
        assert {"t1.csv", "t1_metadata.json", "t2.csv"} <= names
        with zf.open("t1.csv") as fh:
            body = fh.read().decode()
        assert "id" in body and "a" in body
    # collision-free second archive
    z2 = export_zip(out, str(tmp_path / "dl"))
    assert os.path.basename(z1) == "run.zip"
    assert os.path.basename(z2) == "run_1.zip"
    # no torn archives: the temp file is gone
    assert not any(f.endswith(".tmp") for f in os.listdir(tmp_path / "dl"))

    # P9 predicate semantics (reference api.py:235-249)
    assert is_safe_path(out, os.path.join(out, "t1.csv"))
    assert not is_safe_path(out, str(tmp_path / "elsewhere.txt"))
    assert not is_safe_path(out, os.path.join(out, "..", "escape.txt"))

    # a symlink inside the export tree pointing OUTSIDE it must abort
    secret = tmp_path / "secret.txt"
    secret.write_text("not yours")
    os.symlink(str(secret), os.path.join(out, "link.csv"))
    import pytest

    with pytest.raises(ValueError, match="resolves outside"):
        export_zip(out, str(tmp_path / "dl2"))
    os.unlink(os.path.join(out, "link.csv"))

    # out_dir inside (or equal to) export_dir would zip the growing
    # archive into itself — refused up front
    with pytest.raises(ValueError, match="include itself"):
        export_zip(out, os.path.join(out, "zips"))
    with pytest.raises(ValueError, match="include itself"):
        export_zip(out, out)
