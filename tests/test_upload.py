"""HTTP upload source (S4 parity): server-assigned uuid naming, sanitized
client filename, atomic landing into a tail-consumable staging dir,
bounded bodies — reference server/api.py:35-48 semantics as a library."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request
import uuid

import pytest

from opengin_ingestion_spark.sources.upload import UploadServer


def _post(url: str, body: bytes, headers: dict) -> dict:
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read())


def test_upload_raw_body_lands_atomically(tmp_path):
    staging = str(tmp_path / "staging")
    with UploadServer(staging) as srv:
        host, port = srv.address
        body = b"parquet-bytes-here" * 100
        out = _post(
            f"http://{host}:{port}/upload", body,
            {"X-Filename": "batch-00001.parquet"},
        )
        assert out["filename"] == "batch-00001.parquet"
        assert out["nbytes"] == len(body)
        # storage name is the SERVER-assigned uuid + client extension
        base = os.path.basename(out["path"])
        assert base == f"{out['file_id']}.parquet"
        uuid.UUID(out["file_id"])  # well-formed id
        with open(out["path"], "rb") as fh:
            assert fh.read() == body
        # atomic: no temp residue in the staging dir
        assert not any(f.startswith(".up-") for f in os.listdir(staging))


def test_upload_multipart_first_file_part(tmp_path):
    with UploadServer(str(tmp_path / "staging")) as srv:
        host, port = srv.address
        boundary = "deadbeefboundary"
        payload = b"%binary\x00content"
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="doc.pdf"\r\n'
            "Content-Type: application/pdf\r\n\r\n"
        ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
        out = _post(
            f"http://{host}:{port}/upload", body,
            {"Content-Type": f"multipart/form-data; boundary={boundary}"},
        )
        assert out["filename"] == "doc.pdf"
        assert os.path.basename(out["path"]) == f"{out['file_id']}.pdf"
        with open(out["path"], "rb") as fh:
            assert fh.read() == payload


def test_upload_traversal_filename_cannot_escape(tmp_path):
    """A hostile client filename never names the stored file (server
    assigns the id) and never escapes the staging dir."""
    staging = str(tmp_path / "staging")
    with UploadServer(staging) as srv:
        host, port = srv.address
        out = _post(
            f"http://{host}:{port}/upload", b"x",
            {"X-Filename": "../../escape.pdf"},
        )
        assert out["filename"] == "escape.pdf"  # sanitized echo only
        assert os.path.dirname(out["path"]) == os.path.abspath(staging)
    assert not (tmp_path / "escape.pdf").exists()


def test_upload_rejects_oversize_wrong_path_missing_length(tmp_path):
    with UploadServer(str(tmp_path / "staging"), max_bytes=100) as srv:
        host, port = srv.address
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"http://{host}:{port}/upload", b"x" * 200, {})
        assert e.value.code == 413
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"http://{host}:{port}/elsewhere", b"x", {})
        assert e.value.code == 404
        # nothing landed
        assert os.listdir(str(tmp_path / "staging")) == []


def test_uploaded_changelog_batch_is_tail_consumable(spark, tiny_log, tmp_path):
    """End-to-end with the engine: upload a REAL change-log parquet batch
    through the HTTP source; the staging dir then reads as a change log
    (the upload IS the tail's input staging — no copy step)."""
    staging = str(tmp_path / "staging")
    src = next(
        os.path.join(tiny_log["dir"], f)
        for f in sorted(os.listdir(tiny_log["dir"]))
        if f.endswith(".parquet")
    )
    with open(src, "rb") as fh:
        body = fh.read()
    with UploadServer(staging) as srv:
        host, port = srv.address
        out = _post(
            f"http://{host}:{port}/upload", body,
            {"X-Filename": os.path.basename(src)},
        )
    from opengin_ingestion_spark.sources.reader import read_changelog

    df = read_changelog(spark, staging)
    assert df.count() == spark.read.parquet(src).count()
    assert out["path"].endswith(".parquet")
