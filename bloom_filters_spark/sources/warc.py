"""WARC ingestion: Common-Crawl-style web archives → the pages table.

Real Common-Crawl corpora arrive as WARC files (ISO 28500), usually
per-record-gzipped (`.warc.gz` with one gzip member per record).  This
module provides a dependency-free reader:

* ``parse_warc(payload)`` — parse one WARC file's bytes (plain or
  multi-member gzip; stdlib ``gzip.decompress`` handles concatenated
  members) into response records ``{url, warc_ts, html}``; request /
  metadata / warcinfo records are skipped, as are non-HTTP payloads.
* ``read_warc(spark, path)`` — distributed read: ``binaryFile`` source
  (one task per file — WARC files are the natural parallelism unit,
  ~1GB each in Common Crawl) → ``mapInPandas`` parse → pages-shaped
  DataFrame ``(url, warc_ts, html, lang)`` ready for
  ``pages_near_dup(..., text_col=None)``.
* ``build_warc(records, gzip_members=False)`` — writer used by tests
  and fixtures (round-trip partner of the parser).

At 100TB the shape holds: the scan parallelizes per file, payload bytes
stay in executor memory only for the duration of their batch, and the
output feeds the same dedup pipeline as any other pages table.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_OUT_SCHEMA = "url string, warc_ts timestamp, html binary, lang string"

_CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict[bytes, bytes]:
    headers: dict[bytes, bytes] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def _dechunk(body: bytes) -> bytes | None:
    """Undo Transfer-Encoding: chunked framing (size-in-hex CRLF data
    CRLF ... 0 CRLF); None on malformed framing.  Chunk extensions
    (``;ext=val``) and trailer headers after the 0-chunk are ignored."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            return None
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            return None
        if size == 0:
            return bytes(out)
        start = eol + 2
        chunk = body[start:start + size]
        if len(chunk) < size:
            return None
        out += chunk
        pos = start + size + 2  # skip the chunk-terminating CRLF


def _http_body(payload: bytes) -> bytes | None:
    """HTTP response bytes → decoded body; None if the payload is not an
    HTTP response or its encoding cannot be undone (real Common-Crawl
    response payloads frequently use Transfer-Encoding: chunked and/or
    Content-Encoding: gzip — emitting the raw framed/compressed bytes
    would feed garbage to text extraction, so undecodable records are
    skipped explicitly instead)."""
    if not payload.startswith(b"HTTP/"):
        return None
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return b""
    headers = _parse_headers(payload[:sep])
    body: bytes | None = payload[sep + 4:]

    # Transfer-Encoding is the OUTER layer: de-chunk before decompressing
    te = headers.get(b"transfer-encoding", b"").lower()
    if b"chunked" in te:
        body = _dechunk(body)
        if body is None:
            return None

    ce = headers.get(b"content-encoding", b"identity").lower().strip()
    if ce in (b"", b"identity", b"none"):
        return body
    try:
        if ce in (b"gzip", b"x-gzip"):
            return gzip.decompress(body)
        if ce == b"deflate":
            import zlib

            try:
                return zlib.decompress(body)
            except zlib.error:
                return zlib.decompress(body, -zlib.MAX_WBITS)  # raw-deflate servers
    except Exception:
        return None
    return None  # unknown coding (br, zstd, ...): skip rather than emit garbage


def parse_warc(payload: bytes, strict: bool = True) -> list[dict]:
    """WARC file bytes → list of {url, warc_ts, html} for response
    records.  Accepts plain WARC or (multi-member) gzip.

    ``strict=True`` (default, the test/fixture contract) raises on a
    framing desync (missing version line, non-numeric Content-Length,
    corrupt gzip).  ``strict=False`` — the distributed-read policy —
    returns every record parsed before the desync instead: once
    framing is lost the rest of the FILE is unwalkable (record
    boundaries come from Content-Length), but one bad record should
    not discard a shard's good prefix or fail a 100TB job."""
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except Exception:
            if strict:
                raise
            return []
    out: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        # skip inter-record blank lines
        while payload.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        if not payload.startswith(b"WARC/", pos):
            if strict:
                raise ValueError(
                    f"malformed WARC: no version line at byte {pos}"
                )
            break
        hdr_end = payload.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(payload[pos:hdr_end])
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            if strict:
                raise
            break
        block = payload[hdr_end + 4: hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts_raw = headers.get(b"warc-date", b"").decode("ascii", "replace")
        body = _http_body(block)
        if body is None:
            continue
        out.append({
            "url": url,
            "warc_ts": pd.to_datetime(ts_raw, utc=True, errors="coerce"),
            "html": body,
        })
    return out


def read_warc(spark: SparkSession, path: str, lang: str | None = None) -> DataFrame:
    """Distributed WARC read → pages-shaped DataFrame
    ``(url, warc_ts, html, lang)``.  One task per file (binaryFile
    source); parsing happens executor-side in mapInPandas."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "lang"]
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                # strict=False: one corrupt record loses that file's
                # tail, never the whole job or the good prefix
                for rec in parse_warc(bytes(content), strict=False):
                    rec["lang"] = lang
                    rows.append(rec)
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows else pd.DataFrame(columns=cols)
            )

    return files.mapInPandas(parse, PAGES_OUT_SCHEMA)


def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """records [{url, warc_ts (iso str), html (bytes), type?}] → WARC
    bytes (per-record gzip members when ``gzip_members``, like real
    Common-Crawl .warc.gz files)."""
    out = io.BytesIO()
    for rec in records:
        body = rec.get("html", b"")
        extra = b""
        enc = rec.get("encoding")
        if enc == "gzip":
            body = gzip.compress(body)
            extra += b"Content-Encoding: gzip" + _CRLF
        elif enc == "deflate":
            import zlib

            body = zlib.compress(body)
            extra += b"Content-Encoding: deflate" + _CRLF
        if rec.get("chunked"):
            chunked = bytearray()
            data = body
            step = max(1, len(data) // 3) if data else 1
            for i in range(0, len(data), step):
                chunk = data[i:i + step]
                chunked += format(len(chunk), "x").encode() + _CRLF
                chunked += chunk + _CRLF
            chunked += b"0" + _CRLF + _CRLF
            body = bytes(chunked)
            extra += b"Transfer-Encoding: chunked" + _CRLF
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" + extra
            + b"Content-Length: " + str(len(body)).encode() + _CRLF + _CRLF
            + body
        )
        rtype = rec.get("type", "response").encode()
        block = http if rtype == b"response" else body
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + rtype + _CRLF
            + b"WARC-Target-URI: " + rec["url"].encode() + _CRLF
            + b"WARC-Date: " + rec.get("warc_ts", "2026-01-01T00:00:00Z").encode() + _CRLF
            + b"Content-Length: " + str(len(block)).encode() + _CRLF + _CRLF
        )
        member = hdr + block + _CRLF + _CRLF
        out.write(gzip.compress(member) if gzip_members else member)
    return out.getvalue()
