"""WARC (Web ARChive, ISO 28500) reader/writer — pure stdlib.

THE container of web-scrape corpora: Common Crawl ships WARC files
where every record is its own gzip member (so readers can split
without decompressing the world). This module parses WARC/1.0 and
1.1 records for real — version line, named headers, Content-Length-
delimited payload, the CRLF CRLF record separator — handles both
plain and per-record-gzip streams, and splits HTTP response records
into status/headers/body (the part a curation pipeline keeps).

``write_warc`` emits the per-record-gzip layout (the parser's oracle
and the probe fixture path). At 100 TB these files live in object
storage; the Spark shape is one binary payload per task (mapInPandas)
— records never shuffle, only typed stats leave Python.
"""

from __future__ import annotations

import gzip
import io


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
    return headers


def parse_warc(payload: bytes) -> list[dict]:
    """All records: ``[{"type", "uri", "headers", "content"}]``.
    Accepts per-record-gzip (members concatenated; the Common Crawl
    layout), whole-file gzip, or plain WARC bytes."""
    if payload[:2] == b"\x1f\x8b":
        # multi-member gzip: GzipFile reads ALL members sequentially
        payload = gzip.GzipFile(fileobj=io.BytesIO(payload)).read()
    records = []
    pos = 0
    n = len(payload)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and payload[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not payload[pos : pos + 5] == b"WARC/":
            raise ValueError(f"bad WARC version line at byte {pos}")
        hdr_end = payload.index(b"\r\n\r\n", pos)
        headers = _parse_headers(payload[pos:hdr_end])
        length = int(headers["Content-Length"])
        body_start = hdr_end + 4
        content = payload[body_start : body_start + length]
        records.append(
            {
                "type": headers.get("WARC-Type", ""),
                "uri": headers.get("WARC-Target-URI"),
                "headers": headers,
                "content": content,
            }
        )
        pos = body_start + length
    return records


def split_http_response(content: bytes) -> tuple[int, dict[str, str], bytes]:
    """An HTTP response record's content -> (status, headers, body)."""
    sep = content.index(b"\r\n\r\n")
    head = content[:sep]
    status_line = head.split(b"\r\n", 1)[0]
    status = int(status_line.split(b" ")[1])
    return status, _parse_headers(head), content[sep + 4 :]


def _record(headers: list[tuple[str, str]], content: bytes) -> bytes:
    out = b"WARC/1.0\r\n"
    for k, v in headers:
        out += f"{k}: {v}\r\n".encode("latin-1")
    out += f"Content-Length: {len(content)}\r\n\r\n".encode("latin-1")
    return out + content + b"\r\n\r\n"


def write_warc(
    pages: list[tuple], per_record_gzip: bool = True
) -> bytes:
    """A valid WARC: one warcinfo record then one HTTP ``response``
    record per (uri, status, body[, content_type]) page — the 4-tuple
    form sets the HTTP Content-Type (default text/html), the router
    key of a multi-format crawl. ``per_record_gzip`` emits each
    record as its own gzip member (the Common Crawl layout)."""
    records = [
        _record(
            [("WARC-Type", "warcinfo"), ("WARC-Record-ID", "<urn:uuid:0>")],
            b"software: flytemosaic_spark\r\n",
        )
    ]
    for page in pages:
        uri, status, body = page[:3]
        ctype = page[3] if len(page) > 3 else "text/html"
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("latin-1") + body
        records.append(
            _record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Target-URI", uri),
                    ("WARC-Record-ID", f"<urn:uuid:{len(records)}>"),
                ],
                http,
            )
        )
    if not per_record_gzip:
        return b"".join(records)
    out = io.BytesIO()
    for r in records:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(r)
        out.write(buf.getvalue())
    return out.getvalue()
