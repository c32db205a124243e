"""Crawl-politeness and byte-hygiene stages — pure stdlib.

Two pre-text stages every real web-corpus pipeline runs before the
HTML/extract/dedup chain (operators/html.py):

- robots.txt evaluation (``urllib.robotparser``): which of a host's
  crawled URLs were fetchable, plus the crawl-delay budget. The
  filter every polite crawler applies before a page enters a corpus.
- charset sniff + transcode: crawled bytes are NOT utf-8 — the
  decoder sniffs the BOM (utf-16-le/be, utf-8-sig), else an
  ascii-compatible ``<meta charset=...>`` declaration in the first
  1 KB, else tries utf-8 and falls back to latin-1 (which never
  fails). The CCNet-shaped normalization to unicode before any text
  operator runs.

Spark shape: both are per-row Python (stdlib parsers) behind
mapInPandas; payload bytes never shuffle, only typed stats leave the
worker. The reference is raster-only; these belong to the engine's
LLM-training-data surface.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# robots.txt
# ---------------------------------------------------------------------------


def robots_allowed(robots_txt: str, url_paths: list[str],
                   agent: str = "*") -> list[bool]:
    """Evaluate paths against a robots.txt body with the stdlib
    parser (no network: feed the text directly)."""
    from urllib.robotparser import RobotFileParser

    rp = RobotFileParser()
    rp.parse(robots_txt.splitlines())
    return [rp.can_fetch(agent, p) for p in url_paths]


def crawl_delay(robots_txt: str, agent: str = "*") -> int | None:
    from urllib.robotparser import RobotFileParser

    rp = RobotFileParser()
    rp.parse(robots_txt.splitlines())
    d = rp.crawl_delay(agent)
    return int(d) if d is not None else None


def synthesize_robots(keys: DataFrame, key_col: str = "s_suppkey") -> DataFrame:
    """Key-derived (robots.txt, url list) pairs: host k disallows the
    /d{k % 3}/ prefix and sets Crawl-delay 1 + k % 7; its crawl list
    is 4 + k % 5 urls /d{(k + i) % 4}/p{i} — prefixes are disjoint so
    every robots-parser semantics agrees on the verdicts."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                robots = (
                    "User-agent: *\n"
                    f"Disallow: /d{k % 3}/\n"
                    f"Crawl-delay: {1 + k % 7}\n"
                )
                urls = [
                    f"/d{(k + i) % 4}/p{i}" for i in range(4 + k % 5)
                ]
                out.append((k, robots, urls))
            yield pd.DataFrame(
                out, columns=["media_id", "robots", "urls"]
            )

    return keys.select(key_col).mapInPandas(
        run, "media_id long, robots string, urls array<string>"
    )


def robots_scan(df: DataFrame) -> DataFrame:
    """Per host: url count, fetchable count, crawl delay — the
    politeness gate of a crawl frontier."""
    schema = (
        "media_id long, n_urls long, n_allowed long, delay_s long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, robots, urls in zip(
                pdf["media_id"], pdf["robots"], pdf["urls"]
            ):
                urls = list(urls)
                verdicts = robots_allowed(robots, urls)
                d = crawl_delay(robots)
                out.append(
                    (int(mid), len(urls), sum(verdicts),
                     d if d is not None else 0)
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_urls", "n_allowed", "delay_s"],
            )

    return df.select("media_id", "robots", "urls").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# charset sniff + transcode
# ---------------------------------------------------------------------------

_META_RE = re.compile(
    rb"""<meta[^>]*charset\s*=\s*["']?([A-Za-z0-9_-]+)""", re.I
)


def sniff_and_decode(payload: bytes) -> tuple[str, str]:
    """(detected charset label, decoded unicode text).

    Order: BOM (utf-16-le/be, utf-8-sig) -> <meta charset> in the
    first 1 KB -> utf-8 -> latin-1 fallback (never fails). BOM bytes
    are stripped from the decoded text."""
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le", payload[2:].decode("utf-16-le")
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be", payload[2:].decode("utf-16-be")
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", payload[3:].decode("utf-8")
    m = _META_RE.search(payload[:1024])
    if m:
        label = m.group(1).decode("ascii").lower()
        try:
            return label, payload.decode(label)
        except (UnicodeDecodeError, LookupError):
            pass  # declared charset lies — fall through to sniffing
    try:
        return "utf-8", payload.decode("utf-8")
    except UnicodeDecodeError:
        return "latin-1", payload.decode("latin-1")


def synthesize_charset_docs(
    keys: DataFrame, key_col: str = "s_suppkey"
) -> DataFrame:
    """Key-derived byte payloads cycling four wire encodings by
    key % 4: meta-declared utf-8, meta-declared iso-8859-1 (with a
    latin-1-only char), BOM'd utf-16-le and BOM'd utf-8 (both with a
    non-BMP-adjacent CJK char)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                s = "charset test " + "a" * (5 + k % 9)
                mode = k % 4
                if mode == 0:
                    payload = (
                        '<meta charset="utf-8">' + s + "中"
                    ).encode("utf-8")
                elif mode == 1:
                    payload = (
                        '<meta charset="iso-8859-1">' + s + "\xe9"
                    ).encode("latin-1")
                elif mode == 2:
                    payload = b"\xff\xfe" + (s + "中").encode(
                        "utf-16-le"
                    )
                else:
                    payload = b"\xef\xbb\xbf" + (s + "中").encode(
                        "utf-8"
                    )
                out.append((k, payload))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return keys.select(key_col).mapInPandas(
        run, "media_id long, payload binary"
    )


def charset_decode_stats(df: DataFrame) -> DataFrame:
    """Sniff + transcode each payload; emit the detected label and
    exact unicode stats (length + codepoint sum — one mis-decoded
    byte anywhere shifts the sum)."""
    schema = "media_id long, charset string, n_chars long, cp_sum long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                label, text = sniff_and_decode(bytes(payload))
                out.append(
                    (int(mid), label, len(text),
                     sum(ord(c) for c in text))
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "charset", "n_chars", "cp_sum"],
            )

    return df.select("media_id", "payload").mapInPandas(run, schema)
