"""URL download source — reference S3 parity, re-expressed data-parallel.

Reference behavior (/root/reference/python/src/opengin/tracer/cli.py):

* ``validate_url`` (cli.py:18-46): resolve the hostname, reject URLs
  landing on private / loopback / reserved / multicast addresses (SSRF
  guard) — reference semantics, hardened past the reference's
  resolve-once gethostbyname: ALL resolved addresses (IPv4+IPv6) must
  pass, and the actual connection is PINNED to a validated address
  (:func:`_pinned_opener`), closing the DNS-rebinding and dual-stack
  bypasses the check-then-reconnect pattern leaves open. Tests exercise
  a loopback server via ``allow_private=True``, exactly the class the
  default rejects.
* chunked streaming download with timeout, filename from
  Content-Disposition with URL-path fallback (cli.py:233-282) —
  reproduced in :func:`download_url`, hardened with the P9 containment
  discipline: the served filename is flattened to its basename and
  sanitized, so a crafted ``Content-Disposition: filename=../../x``
  cannot escape the target directory.

Spark-first shape: fetching N change-log files is a DATA-PARALLEL stage,
not a driver loop — :func:`fetch_urls` runs the downloads inside
``mapInPandas`` so a 1000-executor cluster fetches 1000-wide, with
per-url error capture (dead-letter rows, never a failed job: the
reference's per-page error file, scanner.py:98-100, applied to the fetch
stage). Files publish with the changelog writer's temp+rename convention
so a live tail never observes a partial download.
"""

from __future__ import annotations

import ipaddress
import os
import re
import socket
import tempfile
import urllib.request
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


class UnsafeURL(ValueError):
    """URL failed the SSRF guard (reference cli.py:18-46 semantics)."""


def validate_url(url: str, allow_private: bool = False) -> str:
    """Raise :class:`UnsafeURL` unless EVERY address the URL's host
    resolves to (both IPv4 and IPv6 — a dual-stack host with a public A
    record and a restricted AAAA record must not pass) is public.
    Returns one validated address; :func:`download_url` PINS its TCP
    connection to it, so a TTL-0 DNS-rebinding answer that flips to
    169.254.169.254 between this check and connect time never reaches the
    socket (the classic check/connect TOCTOU the reference's
    gethostbyname-once guard leaves open). ``allow_private=True``
    disables the address-class check (tests against a loopback fixture
    server; trusted-VPC mirrors) — scheme and hostname are still
    required, and the connection is still pinned."""
    parsed = urlparse(url)
    if parsed.scheme not in ("http", "https"):
        raise UnsafeURL(f"unsupported scheme: {url!r}")
    hostname = parsed.hostname
    if not hostname:
        raise UnsafeURL(f"invalid URL, no hostname: {url!r}")
    try:
        infos = socket.getaddrinfo(hostname, None, type=socket.SOCK_STREAM)
    except socket.gaierror as e:
        raise UnsafeURL(f"could not resolve hostname {hostname}: {e}") from e
    addrs = [info[4][0] for info in infos]
    if not addrs:
        raise UnsafeURL(f"hostname {hostname} resolved to no addresses")
    if not allow_private:
        for ip_str in addrs:
            ip = ipaddress.ip_address(ip_str)
            if ip.is_private or ip.is_loopback or ip.is_reserved or ip.is_multicast:
                raise UnsafeURL(
                    f"URL resolves to a restricted address: {ip_str}"
                )
    return addrs[0]


def _pinned_opener(pinned: dict, allow_private: bool) -> urllib.request.OpenerDirector:
    """An opener whose HTTP(S) connections dial the VALIDATED IP from
    ``pinned`` (hostname → address) instead of re-resolving DNS at connect
    time, while the Host header, SNI, and certificate verification keep
    using the real hostname (``self.host`` is untouched — only the TCP
    connect target changes). Redirect hops re-validate and re-pin."""
    import http.client
    import ssl

    class _PinnedHTTPConnection(http.client.HTTPConnection):
        def connect(self):
            target = pinned.get(self.host, self.host)
            self.sock = socket.create_connection(
                (target, self.port), self.timeout, self.source_address
            )

    class _PinnedHTTPSConnection(http.client.HTTPSConnection):
        def connect(self):
            target = pinned.get(self.host, self.host)
            sock = socket.create_connection(
                (target, self.port), self.timeout, self.source_address
            )
            ctx = self._context or ssl.create_default_context()
            self.sock = ctx.wrap_socket(sock, server_hostname=self.host)

    class _PinnedHTTPHandler(urllib.request.HTTPHandler):
        def http_open(self, req):
            return self.do_open(_PinnedHTTPConnection, req)

    class _PinnedHTTPSHandler(urllib.request.HTTPSHandler):
        def https_open(self, req):
            return self.do_open(_PinnedHTTPSConnection, req)

    # the guard must hold across REDIRECTS too: a public URL answering
    # '302 Location: http://169.254.169.254/...' would otherwise walk
    # urllib straight into the address class validate_url rejects — so
    # every hop re-validates (and re-pins) before it is followed
    class _GuardedRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):
            hop_host = urlparse(newurl).hostname
            hop_ip = validate_url(newurl, allow_private=allow_private)
            if hop_host:
                pinned[hop_host] = hop_ip
            return super().redirect_request(
                req, fp, code, msg, headers, newurl
            )

    return urllib.request.build_opener(
        _PinnedHTTPHandler, _PinnedHTTPSHandler, _GuardedRedirect
    )


def _filename_for(url: str, content_disposition: str | None) -> str:
    """Reference filename resolution (cli.py:247-260): Content-Disposition
    ``filename="name"`` first, URL path basename fallback, a fixed default
    when both are empty — flattened to a basename and sanitized so a
    hostile header cannot traverse out of the landing directory (the P9
    discipline applied at the source edge)."""
    fname = ""
    if content_disposition:
        m = re.findall(r'filename="?([^";]+)"?', content_disposition)
        if m:
            fname = m[0]
    if not fname:
        fname = os.path.basename(urlparse(url).path)
    fname = os.path.basename(fname.replace("\\", "/"))
    fname = re.sub(r"[^A-Za-z0-9._-]", "_", fname)
    if not fname or fname in (".", ".."):
        fname = "downloaded_file"
    return fname


def download_url(
    url: str,
    out_dir: str,
    chunk_size: int = 8192,
    timeout: float = 60.0,
    allow_private: bool = False,
    filename: str | None = None,
) -> dict:
    """Stream one URL into ``out_dir``. Returns
    ``{"url", "path", "nbytes"}``.

    Chunked (never the whole body in memory), bounded by ``timeout``,
    written to a temp name in the SAME directory and renamed into place —
    the changelog writer's atomic-publish convention, so a streaming tail
    over ``out_dir`` can never pick up a half-written file. Name
    collisions get the export sinks' ``_1``/``_2`` counter rather than an
    overwrite."""
    from opengin_ingestion_spark.plans.export import _collision_free

    pinned_ip = validate_url(url, allow_private=allow_private)
    hostname = urlparse(url).hostname
    pinned = {hostname: pinned_ip} if hostname else {}
    os.makedirs(out_dir, exist_ok=True)
    req = urllib.request.Request(url, method="GET")
    opener = _pinned_opener(pinned, allow_private)
    with opener.open(req, timeout=timeout) as resp:
        fname = filename or _filename_for(
            url, resp.headers.get("Content-Disposition")
        )
        base, ext = os.path.splitext(fname)
        fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".dl-", suffix=".tmp")
        nbytes = 0
        try:
            with os.fdopen(fd, "wb") as fh:
                while True:
                    chunk = resp.read(chunk_size)
                    if not chunk:
                        break
                    fh.write(chunk)
                    nbytes += len(chunk)
            # publish with link() (fails if the name exists — the
            # manifest commit's atomic check), bumping the collision
            # counter until it lands: two executors fetching same-named
            # files concurrently can NEVER overwrite each other (a bare
            # rename() would silently clobber). Filesystems without
            # hard-link support (SMB/CIFS, some FUSE object mounts)
            # raise OSError on the FIRST attempt — fall back to rename
            # there (still atomic-publish; only the cross-writer
            # same-name race loses its guarantee, documented).
            n = 0
            while True:
                final = _collision_free(os.path.join(out_dir, base), ext)
                try:
                    os.link(tmp, final)
                    break
                except FileExistsError:
                    n += 1
                    if n > 10_000:  # pathological; bail with context
                        raise
                except OSError:
                    os.rename(tmp, final)
                    break
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
    return {"url": url, "path": final, "nbytes": nbytes}


def fetch_urls(
    spark: SparkSession,
    urls: list[str] | DataFrame,
    out_dir: str,
    chunk_size: int = 8192,
    timeout: float = 60.0,
    allow_private: bool = False,
    n_partitions: int | None = None,
) -> DataFrame:
    """Data-parallel fetch stage: one row per url in, one row per url out
    — ``(url, path, nbytes, error)``, with ``error`` carrying the failure
    message for dead-letter routing instead of failing the job (a crawl
    fetch at scale ALWAYS has some dead urls).

    Runs the downloads inside ``mapInPandas`` so fetch parallelism is
    executor parallelism — on a real cluster ``out_dir`` is shared
    storage and each executor streams its partition's urls concurrently
    with every other executor's. ``n_partitions`` spreads a driver-built
    url list wide (default: one url per partition up to 4× the session's
    shuffle parallelism)."""
    from pyspark.sql import functions as F

    if isinstance(urls, DataFrame):
        df = urls.select(F.col(urls.columns[0]).alias("url"))
        n = n_partitions
    else:
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        cap = int(spark.conf.get("spark.sql.shuffle.partitions", "8")) * 4
        n = n_partitions or max(1, min(len(urls), cap))
    if n:
        df = df.repartition(n)

    def fetch(batches):
        import pandas as pd  # executor-side

        for pdf in batches:
            out = []
            for url in pdf["url"]:
                try:
                    r = download_url(
                        url, out_dir, chunk_size=chunk_size, timeout=timeout,
                        allow_private=allow_private,
                    )
                    out.append((url, r["path"], r["nbytes"], None))
                except Exception as e:  # dead-letter row, job survives
                    out.append((url, None, 0, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                out, columns=["url", "path", "nbytes", "error"]
            )

    return df.mapInPandas(
        fetch, schema="url string, path string, nbytes long, error string"
    )
