"""Round-15 probes: PDF text extraction, duplicate-span REMOVAL
(winnowing apply), unicode normalization, txlog data skipping, and
crawl-frontier scheduling — the round-9 additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.probes.registry import T, probe


@probe(
    "x248_pdf_extract",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id, 1 + s_suppkey % 3 AS np
            FROM supplier
        ),
        pg AS (
            SELECT media_id,
                   unnest(generate_series(0, np - 1)) AS i
            FROM keys
        ),
        ln AS (
            SELECT media_id, i, 2 + (media_id + i) % 4 AS nl
            FROM pg
        ),
        ls AS (
            SELECT media_id, i,
                   unnest(generate_series(0, nl - 1)) AS j
            FROM ln
        ),
        lines AS (
            SELECT media_id, i, j,
                   repeat(chr(CAST(97 + (media_id + i * 2 + j * 3) % 26
                                   AS INT)),
                          4 + (media_id * 3 + i * 5 + j * 7) % 17) AS line
            FROM ls
        ),
        pages AS (
            SELECT media_id, i,
                   string_agg(line, chr(10) ORDER BY j) AS pt
            FROM lines
            GROUP BY media_id, i
        )
        SELECT media_id,
               CAST(count(*) AS INT) AS n_pages,
               sum(length(pt)) AS n_chars,
               md5(string_agg(pt, chr(12) ORDER BY i)) AS text_md5
        FROM pages
        GROUP BY media_id
    """,
    note="PDF text extraction in the gate (sources/pdf.py — "
    "dependency-free: classic xref tables AND cross-reference "
    "streams with PNG predictors, object streams, Flate/LZW/A85/AHx/"
    "RunLength filter chains, page-tree walk with inherited "
    "resources, BT/Tf/Td/TD/T*/Tm/Tj/'/\\\"/TJ content tokenizer, "
    "WinAnsi/Differences + ToUnicode CMap byte->unicode): executors "
    "write key-derived pages cycling ALL EIGHT encoder paths by "
    "key % 8 and extract back; the oracle reconstructs every page's "
    "exact text from the generating arithmetic and md5-hashes it — "
    "one wrong byte in any xref, filter, tokenizer, or encoding "
    "stage shifts text_md5. The reference's open-any-media seam "
    "(flytemosaic/datasets/utils.py:123-126) for the document "
    "modality. Payloads never shuffle; explicit repartition spreads "
    "the per-row codec work (the x222 AQE rule).",
)
def x248_pdf_extract(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        pdf_text_stats,
        synthesize_pdf,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return pdf_text_stats(synthesize_pdf(keys))
