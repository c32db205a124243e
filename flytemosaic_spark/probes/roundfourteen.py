"""Round-14 probes: HTML main-content extraction and the fused
WARC -> extract -> curate crawl pipeline (the stage between the x231
WARC scan and the text operators — CCNet/trafilatura/Dolma shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.probes.registry import T, probe


@probe(
    "x237_html_extract",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id, 3 + s_suppkey % 6 AS p
            FROM supplier
        ),
        paras AS (
            SELECT media_id,
                   unnest(generate_series(0, p - 1)) AS i
            FROM keys
        ),
        texts AS (
            SELECT media_id,
                   string_agg(
                       repeat('w', 10 + (media_id * 7 + i * 13) % 40)
                           || '&',
                       chr(10) ORDER BY i
                   ) AS main_text,
                   count(*) AS n_kept
            FROM paras
            GROUP BY media_id
        )
        SELECT media_id,
               'doc' || CAST(media_id AS VARCHAR) AS title,
               n_kept,
               1 AS n_dropped,
               length(main_text) AS main_len,
               6 + media_id % 7 AS link_chars_dropped,
               52 + media_id % 10 AS boilerplate_chars,
               md5(main_text) AS md5_main
        FROM texts
    """,
    note="HTML main-content extraction (operators/html.py) — the "
    "boilerplate-removal stage every web-corpus pipeline runs before "
    "text analysis: executors synthesize key-derived pages (content "
    "paragraphs with an HTML entity each, a link-dense block, "
    "nav/script/style/footer chrome) and extract_main_content drops "
    "the chrome structurally, drops the link-dense block by the "
    "anchor-density heuristic, decodes entities and keeps the "
    "paragraphs; the oracle recomputes kept/dropped counts, dropped "
    "link chars, boilerplate volume AND the md5 of the full extracted "
    "text from the generating arithmetic — one wrong byte anywhere "
    "in the extraction fails the hash. Pages never shuffle.",
)
def x237_html_extract(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.html import html_extract, synthesize_html

    keys = T(spark, sf, "supplier").select("s_suppkey")
    ex = html_extract(synthesize_html(keys))
    return ex.select(
        "media_id",
        "title",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("n_dropped").cast("int").alias("n_dropped"),
        F.length("main_text").cast("long").alias("main_len"),
        "link_chars_dropped",
        "boilerplate_chars",
        F.md5(F.col("main_text")).alias("md5_main"),
    )


@probe(
    "x239_warc_extract",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id, 3 + s_suppkey % 5 AS np
            FROM supplier
        ),
        pages AS (
            SELECT media_id,
                   unnest(generate_series(0, np - 1)) AS i
            FROM keys
        ),
        ok AS (
            SELECT media_id, i, 2 + (media_id + i) % 3 AS nj
            FROM pages
            WHERE (media_id + i) % 5 <> 0
        ),
        paras AS (
            SELECT media_id, i,
                   unnest(generate_series(0, nj - 1)) AS j
            FROM ok
        ),
        page_stats AS (
            SELECT media_id, i,
                   count(*) AS kept,
                   sum(9 + (media_id * 3 + i * 5 + j * 7) % 30) AS chars
            FROM paras
            GROUP BY media_id, i
        )
        SELECT media_id,
               count(*) AS n_pages_ok,
               sum(kept) AS total_blocks,
               sum(chars) AS total_chars,
               sum(CASE WHEN chars >= 40 THEN 1 ELSE 0 END) AS n_quality
        FROM page_stats
        GROUP BY media_id
    """,
    note="Fused WARC -> HTML-extract -> curate pipeline "
    "(operators/html.py:warc_html_main_stats): executors write real "
    "WARC shards (per-record-gzip on odd keys) whose 200-status "
    "response bodies are key-derived HTML pages with nav/script "
    "chrome; one task per shard parses records, splits HTTP, extracts "
    "main content and scores page quality — raw HTML never crosses "
    "an exchange, only per-file typed stats do (the 100 TB crawl "
    "shape). The oracle recomputes page counts, kept blocks, total "
    "extracted characters and the quality-pass count from the "
    "generating arithmetic via nested series expansion.",
)
def x239_warc_extract(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.html import (
        synthesize_warc_html,
        warc_html_main_stats,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return warc_html_main_stats(synthesize_warc_html(keys))
