"""HTTP upload source — reference S4 parity, landing into the tail's
staging directory.

Reference behavior (/root/reference/python/src/opengin/server/api.py:35-48,
GraphQL variant tracer/schema.py:132-140): a POST handler assigns a fresh
uuid file id, streams the request body to ``{file_id}{ext}`` inside a
fixed upload dir, and returns ``{"file_id", "filename"}``. Re-expressed
here as a LIBRARY source: :class:`UploadServer` is a loopback-bound
stdlib HTTP listener whose landing directory IS (or feeds) the change-log
staging dir the streaming tail watches — an upload becomes a micro-batch
on the next trigger with no extra copy step.

Engine disciplines applied at the edge:

* **server-assigned ids** (reference semantics): the client's filename is
  NEVER the storage name — only its sanitized basename is echoed back and
  its extension reused, so a hostile ``filename=../../x`` cannot place a
  file (the P9 containment rule applied at the source, same as
  download.py's Content-Disposition handling).
* **atomic publish**: body streams to a dot-prefixed temp name in the
  SAME directory, fsync'd, then rename()d — a live tail can never pick up
  a half-written file (the changelog writer's convention).
* **bounded**: Content-Length is required, validated (malformed or
  negative → 400) and capped (``max_bytes``, 413 over). The raw-body path
  is a chunked streaming copy that never holds the whole body in memory;
  the multipart path DOES buffer the body for the boundary scan — bounded
  by ``max_bytes`` (256 MB default), which is the memory bound to size
  for multipart clients.
* **loopback by default**: this is an ingest sidecar for a driver/edge
  node, not a public service — binding beyond 127.0.0.1 is an explicit
  caller decision.

Multipart/form-data is accepted (first file part wins, parsed with the
stdlib email parser); any other content type is treated as a raw body
with the filename taken from the ``X-Filename`` header.
"""

from __future__ import annotations

import json
import os
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _sanitize_name(fname: str) -> str:
    """Flatten to a basename and strip hostile characters — the same rule
    the download source applies to Content-Disposition names."""
    fname = os.path.basename((fname or "").replace("\\", "/"))
    fname = re.sub(r"[^A-Za-z0-9._-]", "_", fname)
    if not fname or fname in (".", ".."):
        fname = "uploaded_file"
    return fname


def _first_multipart_file(body: bytes, content_type: str) -> tuple[str, bytes]:
    """(filename, payload) of the first file part of a multipart body."""
    import email.parser
    import email.policy

    head = f"Content-Type: {content_type}\r\n\r\n".encode()
    msg = email.parser.BytesParser(policy=email.policy.HTTP).parsebytes(
        head + body
    )
    for part in msg.iter_parts():
        fname = part.get_filename()
        if fname:
            return fname, part.get_payload(decode=True) or b""
    raise ValueError("multipart body carries no file part")


class UploadServer:
    """Loopback HTTP listener landing uploads into ``staging_dir``.

    Usage::

        srv = UploadServer(staging_dir)      # port=0 → ephemeral
        host, port = srv.start()
        ... POST http://{host}:{port}/upload ...
        srv.stop()

    Each successful POST answers 200 with
    ``{"file_id", "filename", "path", "nbytes"}`` — ``file_id`` is the
    server-assigned uuid (the storage name), ``filename`` the sanitized
    client name (metadata only, reference parity).
    """

    def __init__(
        self,
        staging_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        max_bytes: int = 256 * 1024 * 1024,
        chunk_size: int = 64 * 1024,
    ) -> None:
        self.staging_dir = os.path.abspath(staging_dir)
        os.makedirs(self.staging_dir, exist_ok=True)
        self._host, self._port = host, port
        self.max_bytes, self.chunk_size = max_bytes, chunk_size
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- handler ------------------------------------------------------------

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # tests/jobs don't want stderr spam
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):  # noqa: N802 (stdlib naming)
                if self.path.split("?")[0] != "/upload":
                    self._json(404, {"error": "unknown path"})
                    return
                length = self.headers.get("Content-Length")
                if length is None:
                    self._json(411, {"error": "Content-Length required"})
                    return
                try:
                    length = int(length)
                except ValueError:  # malformed header → 400, not a dropped
                    self._json(400, {"error": "malformed Content-Length"})
                    return  # connection (ADVICE round 5)
                if length < 0:  # negative passes a plain > max check
                    self._json(400, {"error": "negative Content-Length"})
                    return
                if length > server.max_bytes:
                    self._json(413, {"error": "body exceeds max_bytes"})
                    return

                ctype = self.headers.get("Content-Type", "")
                file_id = str(uuid.uuid4())
                tmp = os.path.join(server.staging_dir, f".up-{file_id}.tmp")
                try:
                    if ctype.startswith("multipart/form-data"):
                        # multipart needs the boundary scan — bounded by
                        # max_bytes, read once
                        body = self.rfile.read(length)
                        client_name, payload = _first_multipart_file(
                            body, ctype
                        )
                        with open(tmp, "wb") as fh:
                            fh.write(payload)
                            fh.flush()
                            os.fsync(fh.fileno())
                        nbytes = len(payload)
                    else:
                        client_name = self.headers.get("X-Filename", "")
                        nbytes = 0
                        with open(tmp, "wb") as fh:
                            while nbytes < length:
                                chunk = self.rfile.read(
                                    min(server.chunk_size, length - nbytes)
                                )
                                if not chunk:
                                    break
                                fh.write(chunk)
                                nbytes += len(chunk)
                            fh.flush()
                            os.fsync(fh.fileno())
                    safe_name = _sanitize_name(client_name)
                    ext = os.path.splitext(safe_name)[1]
                    final = os.path.join(
                        server.staging_dir, f"{file_id}{ext}"
                    )
                    os.rename(tmp, final)  # atomic publish
                except Exception as e:  # error → no partial file left
                    try:
                        os.unlink(tmp)
                    except OSError:
                        pass
                    self._json(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                self._json(
                    200,
                    {
                        "file_id": file_id,
                        "filename": safe_name,
                        "path": final,
                        "nbytes": nbytes,
                    },
                )

        return Handler

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> tuple[str, int]:
        if self._httpd is not None:
            raise RuntimeError("already started")
        self._httpd = ThreadingHTTPServer(
            (self._host, self._port), self._make_handler()
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[0], self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
            self._thread = None

    def __enter__(self) -> "UploadServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def address(self) -> tuple[str, int]:
        if self._httpd is None:
            raise RuntimeError("not started")
        return self._httpd.server_address[:2]
