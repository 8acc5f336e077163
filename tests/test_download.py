"""URL download source (S3 parity): SSRF guard, chunked download with
atomic publish, Content-Disposition/collision/traversal naming, and the
data-parallel fetch stage with dead-letter error rows — all against a
loopback HTTP fixture server (the very address class the guard rejects by
default, so the tests double as the guard's negative case)."""

from __future__ import annotations

import http.server
import os
import socketserver
import threading

import pytest

from opengin_ingestion_spark.sources.download import (
    UnsafeURL,
    download_url,
    fetch_urls,
    validate_url,
)

BODY = b"0123456789abcdef" * 1024  # 16 KiB > several 8 KiB chunks


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path.startswith("/missing"):
            self.send_error(404, "nope")
            return
        if self.path.startswith("/redirect-bad"):
            self.send_response(302)
            self.send_header("Location", "http://no-such-host.invalid/x")
            self.end_headers()
            return
        body = BODY
        self.send_response(200)
        if self.path.startswith("/named"):
            self.send_header(
                "Content-Disposition", 'attachment; filename="batch_7.parquet"'
            )
        elif self.path.startswith("/evil"):
            self.send_header(
                "Content-Disposition", 'attachment; filename="../../escape.bin"'
            )
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def http_base():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def test_ssrf_guard_semantics(http_base):
    """Reference cli.py:18-46: loopback/private addresses are rejected by
    default; schemes outside http(s) and hostless URLs always are."""
    with pytest.raises(UnsafeURL, match="restricted"):
        validate_url(f"{http_base}/log/a.parquet")
    validate_url(f"{http_base}/log/a.parquet", allow_private=True)
    with pytest.raises(UnsafeURL, match="scheme"):
        validate_url("file:///etc/passwd", allow_private=True)
    with pytest.raises(UnsafeURL, match="hostname"):
        validate_url("http:///nohost", allow_private=True)
    with pytest.raises(UnsafeURL):
        download_url(f"{http_base}/log/a.parquet", "/tmp/never")  # guard on


def test_redirect_hops_are_validated(http_base, tmp_path):
    """The SSRF guard holds across redirects: every 302 Location is
    re-validated BEFORE it is followed, so a hop the guard rejects aborts
    the download even when the FIRST url passed validation. (urllib
    itself already refuses non-http(s)/ftp redirect schemes — our handler
    adds the address-class/resolution check on http hops.)"""
    with pytest.raises(UnsafeURL, match="resolve"):
        download_url(
            f"{http_base}/redirect-bad/x", str(tmp_path), allow_private=True
        )
    assert not list(tmp_path.iterdir()), "nothing may be published"


def test_download_naming_and_atomicity(http_base, tmp_path):
    out = str(tmp_path / "log")
    # Content-Disposition wins over the URL path
    r = download_url(f"{http_base}/named/x", out, allow_private=True)
    assert os.path.basename(r["path"]) == "batch_7.parquet"
    assert r["nbytes"] == len(BODY)
    with open(r["path"], "rb") as fh:
        assert fh.read() == BODY
    # URL-path fallback + collision counter (never overwrite)
    r2 = download_url(f"{http_base}/log/events.parquet", out, allow_private=True)
    r3 = download_url(f"{http_base}/log/events.parquet", out, allow_private=True)
    assert os.path.basename(r2["path"]) == "events.parquet"
    assert os.path.basename(r3["path"]) == "events_1.parquet"
    # hostile Content-Disposition cannot traverse out of the landing dir
    r4 = download_url(f"{http_base}/evil/x", out, allow_private=True)
    assert os.path.dirname(os.path.abspath(r4["path"])) == os.path.abspath(out)
    assert ".." not in os.path.basename(r4["path"])
    # atomic publish: no temp residue
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]


def test_fetch_urls_parallel_with_dead_letters(spark, http_base, tmp_path):
    """The mapInPandas fetch stage: every url yields exactly one row,
    failures land as error rows (dead-letter discipline), successes are
    on disk with full content."""
    out = str(tmp_path / "log")
    urls = [f"{http_base}/log/f{i}.parquet" for i in range(6)] + [
        f"{http_base}/missing/g.parquet"
    ]
    res = fetch_urls(spark, urls, out, allow_private=True).collect()
    assert len(res) == len(urls)
    ok = [r for r in res if r["error"] is None]
    bad = [r for r in res if r["error"] is not None]
    assert len(ok) == 6 and len(bad) == 1
    assert "404" in bad[0]["error"]
    assert all(r["nbytes"] == len(BODY) for r in ok)
    for r in ok:
        assert os.path.exists(r["path"])
    # downloaded log files are immediately readable as a source directory
    names = sorted(os.path.basename(r["path"]) for r in ok)
    assert names == sorted(f"f{i}.parquet" for i in range(6))
