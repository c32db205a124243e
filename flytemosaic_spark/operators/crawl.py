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


# zero-widths (ZWSP/ZWNJ/ZWJ/word-joiner/BOM), soft hyphen, and the
# C0/DEL controls EXCEPT \t \n \r (those are whitespace for the
# collapse stage). Spark regexp_replace replaces ALL matches; DuckDB
# needs the 'g' flag — the oracle contract pins both.
_ZW_CTRL_RE = (
    "[\\u200b\\u200c\\u200d\\u2060\\ufeff\\u00ad"
    "\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
)
# explicit class, NOT \s: Java \s includes \x0B, RE2 \s does not —
# after the control strip only these four remain anyway
_WS_RUN_RE = "[ \\t\\n\\r]+"


def nfc_normalize_udf(form: str = "NFC"):
    """Arrow-batched scalar UDF: unicodedata.normalize(form, s).
    Spark has no JVM-side unicode normalizer; this is the one Python
    hop in the hygiene stage (vectorized, no per-row Python UDF)."""
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: None if x is None else unicodedata.normalize(form, x)
        )

    return _norm


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str = "norm_text",
) -> DataFrame:
    """Unicode hygiene between charset decode and the text family
    (CCNet/Dolma normalize BEFORE hashing — un-normalized text
    silently breaks every md5-based dedup equality):

    1. canonical normalization (NFC default; NFKC variant for
       compatibility folding) — composed and decomposed spellings of
       the same text become byte-identical;
    2. strip zero-widths, soft hyphens, BOMs, and C0/DEL controls
       (invisible codepoints that split dedup keys);
    3. collapse [ \\t\\n\\r] runs to one space and trim.

    Stage 1 is the Arrow UDF; stages 2-3 are JVM regexp_replace."""
    stripped = F.regexp_replace(
        nfc_normalize_udf(form)(F.col(text_col)), _ZW_CTRL_RE, ""
    )
    return df.withColumn(
        out_col,
        F.trim(F.regexp_replace(stripped, _WS_RUN_RE, " ")),
    )


# ---------------------------------------------------------------------------
# crawl-frontier scheduling
# ---------------------------------------------------------------------------


def frontier_schedule(
    urls: DataFrame,
    robots: DataFrame,
    batch_size: int = 4,
    agent: str = "*",
) -> DataFrame:
    """Politeness-respecting fetch schedule — the glue between the
    x244 robots gate and the x246 incremental crawl: ``urls`` is the
    frontier (host, url), ``robots`` the per-host robots.txt body
    (host, robots_txt); output is one row per ALLOWED url with

    - ``seq``: its 0-based deterministic per-host fetch position
      (url-sorted — re-runs schedule identically);
    - ``wave``: ``seq div batch_size`` — the fetch batch it joins
      (a host with n allowed urls needs ceil(n / batch) waves);
    - ``eta_s``: ``seq * crawl_delay`` — the earliest polite fetch
      time, so a wave's makespan is its max eta.

    Plan: broadcast the host-scale robots side, ONE vectorized gate
    pass (robotparser parsed once per distinct body per batch, not
    per row), then a host-partitioned row_number — hosts are
    high-cardinality, so no single-partition window. At 100 TB the
    frontier shuffles once on host; per-host state never leaves the
    task."""
    from pyspark.sql import Window

    j = urls.join(F.broadcast(robots), "host").select(
        "host", "url", "robots_txt"
    )
    schema = "host string, url string, delay_s int"

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.robotparser import RobotFileParser

        memo: dict[str, tuple] = {}

        def parser_for(txt: str):
            got = memo.get(txt)
            if got is None:
                rp = RobotFileParser()
                rp.parse(txt.splitlines())
                d = rp.crawl_delay(agent)
                got = (rp, int(d) if d is not None else 0)
                memo[txt] = got
            return got

        for pdf in batches:
            out = []
            for host, url, txt in zip(
                pdf["host"], pdf["url"], pdf["robots_txt"]
            ):
                rp, delay = parser_for(txt)
                if rp.can_fetch(agent, url):
                    out.append((host, url, delay))
            yield pd.DataFrame(out, columns=["host", "url", "delay_s"])

    gated = j.mapInPandas(gate, schema)
    w = Window.partitionBy("host").orderBy("url")
    seq = F.row_number().over(w) - F.lit(1)
    return gated.select(
        "host",
        "url",
        seq.alias("seq"),
        # explicit floor: DuckDB CAST(x AS INT) rounds, Spark truncates
        F.floor(seq / F.lit(batch_size)).cast("int").alias("wave"),
        (seq * F.col("delay_s")).cast("long").alias("eta_s"),
    )
