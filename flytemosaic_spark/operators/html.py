"""HTML main-content extraction (boilerplate removal) — pure stdlib.

The stage between a WARC crawl scan (probes x231/x239) and every
downstream text operator: real web-corpus pipelines (CCNet,
trafilatura, Dolma's web pipeline) go HTML -> clean text before
language ID, quality scoring or dedup ever run. This module
implements that stage with stdlib ``html.parser`` only:

- structural boilerplate removal: ``<script>/<style>/<nav>/<header>/
  <footer>/<aside>/<form>/...`` subtrees and comments are dropped;
- entity decoding (``&amp;`` -> ``&``) via the parser's charref mode;
- block segmentation: text attaches to its innermost open block tag
  (``<p>/<div>/<li>/<h*>...``), whitespace-normalized per block;
- the link-density main-content heuristic: a block whose anchor-text
  share exceeds the threshold is navigation chrome, not content.

Spark shape: pages are strings in a DataFrame column; extraction is
a ``mapInPandas`` pass (stdlib parser is Python-side by necessity),
one partition of pages per task, page bytes never shuffle — only the
extracted text and typed stats leave the worker. At 100 TB the input
is the WARC scan's response bodies; ``warc_html_main_stats`` fuses
parse + extract so raw HTML never crosses an exchange.

Reference parity: the reference (ljstrnadiii/flytemosaic) is
raster-only and has no HTML stage; this belongs to the engine's
LLM-training-data surface next to quality.py/text.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Subtrees that are never content. <head> is NOT listed: <title> is
# captured specially and everything else in head is tag-only/dropped
# by the block rule (text outside any block is discarded).
_DROP_TAGS = frozenset(
    {
        "script", "style", "nav", "header", "footer", "aside",
        "noscript", "template", "iframe", "form", "svg", "button",
        "select", "option", "datalist", "object",
    }
)

# Tags that open a text block. Text binds to the INNERMOST open
# block so nested blocks never double-count a fragment.
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "main", "li", "h1", "h2",
        "h3", "h4", "h5", "h6", "td", "th", "blockquote", "pre",
        "figcaption", "summary", "dd", "dt", "caption",
    }
)

# Void/phrase-break tags rendered as a space inside a block.
_SPACE_TAGS = frozenset({"br", "hr", "wbr"})


class _Block:
    __slots__ = ("order", "parts", "link_parts")

    def __init__(self, order: int):
        self.order = order
        self.parts: list[str] = []
        self.link_parts: list[str] = []


class _MainContentParser(HTMLParser):
    """One pass, no DOM: block stack + drop-depth + anchor-depth."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.blocks: list[tuple[int, str, int]] = []  # (order, text, link)
        self.boilerplate_chars = 0
        self._stack: list[_Block] = []
        self._drop = 0
        self._anchor = 0
        self._in_title = False
        self._order = 0

    # -- tag events --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop += 1
            return
        if self._drop:
            return
        if tag == "title":
            self._in_title = True
        elif tag == "a":
            self._anchor += 1
        elif tag in _BLOCK_TAGS:
            self._stack.append(_Block(self._order))
            self._order += 1
        elif tag in _SPACE_TAGS and self._stack:
            self._stack[-1].parts.append(" ")

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop = max(0, self._drop - 1)
            return
        if self._drop:
            return
        if tag == "title":
            self._in_title = False
        elif tag == "a":
            self._anchor = max(0, self._anchor - 1)
        elif tag in _BLOCK_TAGS and self._stack:
            self._finalize(self._stack.pop())

    def handle_startendtag(self, tag, attrs):
        if not self._drop and tag in _SPACE_TAGS and self._stack:
            self._stack[-1].parts.append(" ")

    # -- text events -------------------------------------------------
    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
            return
        if self._drop:
            self.boilerplate_chars += len(data.strip())
            return
        if self._stack and data:
            blk = self._stack[-1]
            blk.parts.append(data)
            if self._anchor:
                blk.link_parts.append(data)

    def handle_comment(self, data):
        pass  # comments are never content

    # -- assembly ----------------------------------------------------
    def _finalize(self, blk: _Block) -> None:
        text = " ".join("".join(blk.parts).split())
        if text:
            link = len(" ".join("".join(blk.link_parts).split()))
            self.blocks.append((blk.order, text, link))

    def close(self):
        super().close()
        while self._stack:  # unclosed blocks at EOF still count
            self._finalize(self._stack.pop())


def extract_main_content(
    html: str,
    link_density_threshold: float = 1.0 / 3.0,
    min_block_chars: int = 1,
) -> dict:
    """HTML -> main text + extraction stats.

    A block survives when its anchor-text share is at most the
    threshold AND it has at least ``min_block_chars`` characters;
    survivors join with newlines in document order. Returns ``title``,
    ``main_text``, ``n_kept``, ``n_dropped`` (nonempty blocks that
    failed the density/length test), ``link_chars_dropped`` (anchor
    text inside dropped blocks) and ``boilerplate_chars`` (text inside
    structurally-dropped subtrees).
    """
    p = _MainContentParser()
    p.feed(html)
    p.close()
    kept: list[str] = []
    n_dropped = 0
    link_dropped = 0
    for order, text, link in sorted(p.blocks, key=lambda b: b[0]):
        if (
            len(text) >= min_block_chars
            and link <= link_density_threshold * len(text)
        ):
            kept.append(text)
        else:
            n_dropped += 1
            link_dropped += link
    return {
        "title": " ".join("".join(p.title_parts).split()),
        "main_text": "\n".join(kept),
        "n_kept": len(kept),
        "n_dropped": n_dropped,
        "link_chars_dropped": link_dropped,
        "boilerplate_chars": p.boilerplate_chars,
    }


_EXTRACT_SCHEMA = (
    "media_id long, title string, main_text string, n_kept int, "
    "n_dropped int, link_chars_dropped long, boilerplate_chars long"
)


def html_extract(
    pages: DataFrame, id_col: str = "media_id", html_col: str = "html"
) -> DataFrame:
    """Per-page main-content extraction over a string column.

    mapInPandas: page text stays in its task; only extracted text and
    stats come out. Downstream text operators consume ``main_text``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, doc in zip(pdf[id_col], pdf[html_col]):
                r = extract_main_content(doc)
                out.append(
                    (
                        int(mid), r["title"], r["main_text"],
                        r["n_kept"], r["n_dropped"],
                        r["link_chars_dropped"], r["boilerplate_chars"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "title", "main_text", "n_kept",
                    "n_dropped", "link_chars_dropped",
                    "boilerplate_chars",
                ],
            )

    return pages.select(
        F.col(id_col).alias(id_col), F.col(html_col).alias(html_col)
    ).mapInPandas(run, _EXTRACT_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic fixtures (the x231 synthesize pattern): page structure
# is pure key arithmetic so a SQL oracle recomputes every stat.
# ---------------------------------------------------------------------------


def _page_html(k: int) -> str:
    """Key-derived page: P = 3 + k%6 content paragraphs (paragraph i
    is 'w' * (10 + (k*7 + i*13) % 40) + '&amp;'), one link-dense
    block (dropped by density), nav/script/footer boilerplate."""
    paras = "".join(
        f"<p>{'w' * (10 + (k * 7 + i * 13) % 40)}&amp;</p>"
        for i in range(3 + k % 6)
    )
    m = 5 + k % 7
    return (
        f"<html><head><title>doc{k}</title>"
        f"<script>{'j' * (20 + k % 10)}</script>"
        "<style>p{margin:0}</style></head><body>"
        '<nav><a href="/">home</a><a href="/a">about</a></nav>'
        f"{paras}"
        f'<p><a href="/x">l</a> <a href="/y">{"x" * m}</a></p>'
        "<footer>cccccccccccc</footer>"
        "</body></html>"
    )


def synthesize_html(keys: DataFrame, key_col: str = "s_suppkey") -> DataFrame:
    """One key-derived HTML page per key: (media_id, html)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [(int(k), _page_html(int(k))) for k in pdf[key_col]]
            yield pd.DataFrame(out, columns=["media_id", "html"])

    return keys.select(key_col).mapInPandas(run, "media_id long, html string")


def _warc_page_html(k: int, i: int) -> str:
    """Page i of WARC k: 2 + (k+i)%3 paragraphs, paragraph j is
    'w' * (8 + (k*3 + i*5 + j*7) % 30) + '&amp;', plus nav+script
    boilerplate the extractor must drop."""
    paras = "".join(
        f"<p>{'w' * (8 + (k * 3 + i * 5 + j * 7) % 30)}&amp;</p>"
        for j in range(2 + (k + i) % 3)
    )
    return (
        f"<html><head><title>p{k}-{i}</title><script>xx=1</script></head>"
        f'<body><nav><a href="/">home</a></nav>{paras}'
        "<footer>f</footer></body></html>"
    )


def synthesize_warc_html(
    keys: DataFrame, key_col: str = "s_suppkey"
) -> DataFrame:
    """Real WARC files whose response bodies are key-derived HTML
    pages: WARC k holds 3 + k%5 responses, page i has status 200 when
    (k+i)%5 != 0 (else 404); odd keys per-record-gzip, even plain."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.warc import write_warc

        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                pages = [
                    (
                        f"https://s{k % 7}.example/p{i}",
                        200 if (k + i) % 5 else 404,
                        _warc_page_html(k, i).encode(),
                    )
                    for i in range(3 + k % 5)
                ]
                out.append(
                    (k, write_warc(pages, per_record_gzip=bool(k % 2)))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    # EXPLICIT count (the x222 rule): the keys table is typically one
    # small parquet file -> one partition, and everything downstream of
    # this mapInPandas (synthesis AND the per-page extraction kernels,
    # which chain narrow) would serialize on one core. A bare
    # repartition(col) would be coalesced right back by AQE. The count
    # is sized to the WORK, not the core count (r11, VERDICT item 1):
    # blasting ~1 ms/key work across every core pays per-partition
    # Python/Arrow overhead for nothing at low key counts.
    n = _kernel_partitions(keys)
    return keys.select(key_col).repartition(n, key_col).mapInPandas(
        run, "media_id long, payload binary"
    )


def _kernel_partitions(keys: DataFrame, keys_per_task: int = 64) -> int:
    """Explicit partition count for the per-key synthesis kernels:
    ceil(n_keys / keys_per_task), capped at the session parallelism —
    the work decides the fan-out, the core count only bounds it (at
    corpus scale n_keys >> cores so this is defaultParallelism; at
    probe scale it stops 32 Python workers each receiving ~30 tiny
    keys). The count() is one job over the (dimension-scale) keys
    table — the same bounded-action contract as the graph broadcast
    gates."""
    sc = keys.sparkSession.sparkContext
    n_keys = keys.count()
    return max(1, min(sc.defaultParallelism, -(-n_keys // keys_per_task)))


def warc_extract_pages(warcs: DataFrame) -> DataFrame:
    """WARC shards -> one row per 200-status page with its EXTRACTED
    main text (title, main_text, page_idx) — the handoff from crawl
    ingest to the text operators (dedup/langid/quality run on
    main_text downstream). Parse + extract stay fused in the shard's
    task; only clean text leaves Python."""
    schema = (
        "media_id long, page_idx int, title string, main_text string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.warc import (
            parse_warc,
            split_http_response,
        )

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                idx = -1
                for rec in parse_warc(bytes(payload)):
                    if rec["type"] != "response":
                        continue
                    idx += 1
                    status, _, body = split_http_response(rec["content"])
                    if status != 200:
                        continue
                    r = extract_main_content(body.decode("utf-8"))
                    out.append(
                        (int(mid), idx, r["title"], r["main_text"])
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "page_idx", "title", "main_text"],
            )

    return warcs.select("media_id", "payload").mapInPandas(run, schema)


def warc_html_main_stats(
    warcs: DataFrame, quality_min_chars: int = 40
) -> DataFrame:
    """The fused crawl-curation pass: WARC parse -> HTTP split ->
    HTML main-content extraction -> per-file quality stats, all in
    one task per shard (raw HTML never crosses an exchange). Emits
    per file: 200-page count, kept-block count, main-text characters
    (separators excluded) and pages clearing the quality threshold.
    """
    schema = (
        "media_id long, n_pages_ok long, total_blocks long, "
        "total_chars long, n_quality long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.warc import (
            parse_warc,
            split_http_response,
        )

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_ok = blocks = chars = quality = 0
                for rec in parse_warc(bytes(payload)):
                    if rec["type"] != "response":
                        continue
                    status, _, body = split_http_response(rec["content"])
                    if status != 200:
                        continue
                    n_ok += 1
                    r = extract_main_content(body.decode("utf-8"))
                    blocks += r["n_kept"]
                    page_chars = len(r["main_text"]) - max(
                        0, r["n_kept"] - 1
                    )  # newline separators excluded
                    chars += page_chars
                    quality += page_chars >= quality_min_chars
                out.append((int(mid), n_ok, blocks, chars, quality))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_pages_ok", "total_blocks",
                    "total_chars", "n_quality",
                ],
            )

    return warcs.select("media_id", "payload").mapInPandas(run, schema)


def _warc_pdf_lines(k: int, i: int) -> list[str]:
    """PDF record (k, i): 2 + (k + i) % 3 lines, line j a repeated
    letter — SQL-replayable like :func:`_warc_page_html`."""
    return [
        chr(97 + (k + i + j) % 26) * (5 + (k * 2 + i * 3 + j * 5) % 15)
        for j in range(2 + (k + i) % 3)
    ]


def synthesize_warc_mixed(
    keys: DataFrame, key_col: str = "s_suppkey"
) -> DataFrame:
    """WARC shards carrying BOTH modalities — the real crawl shape:
    record i of shard k is an application/pdf document when
    (k + i) % 3 == 0 (Flate-compressed for odd k+i... parity cycles
    the PDF encoder path) and a text/html page otherwise; status 404
    when (k + i) % 5 == 0 (dropped downstream)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.pdf import encode_pdf
        from flytemosaic_spark.sources.warc import write_warc

        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                pages = []
                for i in range(3 + k % 5):
                    status = 200 if (k + i) % 5 else 404
                    if (k + i) % 3 == 0:
                        body = encode_pdf(
                            [_warc_pdf_lines(k, i)],
                            filters=("flate",) if (k + i) % 2 else (),
                        )
                        pages.append(
                            (
                                f"https://s{k % 7}.example/d{i}.pdf",
                                status,
                                body,
                                "application/pdf",
                            )
                        )
                    else:
                        pages.append(
                            (
                                f"https://s{k % 7}.example/p{i}",
                                status,
                                _warc_page_html(k, i).encode(),
                            )
                        )
                out.append(
                    (k, write_warc(pages, per_record_gzip=bool(k % 2)))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    # EXPLICIT work-sized count (the x222 rule) — see
    # synthesize_warc_html / _kernel_partitions
    n = _kernel_partitions(keys)
    return keys.select(key_col).repartition(n, key_col).mapInPandas(
        run, "media_id long, payload binary"
    )


def warc_multiformat_pages(warcs: DataFrame) -> DataFrame:
    """The content-type ROUTER of a multi-format crawl: each 200
    response dispatches on its HTTP Content-Type — text/html through
    the main-content extractor, application/pdf through the PDF text
    extractor (pages joined by newline) — emitting one uniform
    (media_id, rec_idx, fmt, text) row per document. Parse + route +
    extract stay fused in the shard's task; only text leaves
    Python."""
    schema = "media_id long, rec_idx int, fmt string, text string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.pdf import extract_pdf_text
        from flytemosaic_spark.sources.warc import (
            parse_warc,
            split_http_response,
        )

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                idx = -1
                for rec in parse_warc(bytes(payload)):
                    if rec["type"] != "response":
                        continue
                    idx += 1
                    status, headers, body = split_http_response(
                        rec["content"]
                    )
                    if status != 200:
                        continue
                    ctype = (
                        {h.lower(): v for h, v in headers.items()}
                        .get("content-type", "")
                        .split(";")[0]
                        .strip()
                    )
                    if ctype == "application/pdf":
                        text = "\n".join(extract_pdf_text(body))
                        fmt = "pdf"
                    elif ctype == "text/html":
                        r = extract_main_content(body.decode("utf-8"))
                        text = r["main_text"]
                        fmt = "html"
                    else:
                        continue
                    out.append((int(mid), idx, fmt, text))
            yield pd.DataFrame(
                out, columns=["media_id", "rec_idx", "fmt", "text"]
            )

    return warcs.select("media_id", "payload").mapInPandas(run, schema)
