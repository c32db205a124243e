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


@probe(
    "x238_langid",
    sql="""
        WITH d AS (
            SELECT doc_id, lang, lower(text) AS t
            FROM documents WHERE length(lower(text)) >= 2
        ),
        grams AS (
            SELECT doc_id, lang,
                   unnest(list_transform(generate_series(1, length(t) - 1),
                                         i -> substr(t, i, 2))) AS g
            FROM d
        ),
        counts AS (SELECT lang, g, count(*) AS c FROM grams GROUP BY lang, g),
        tot AS (SELECT lang, sum(c) AS t FROM counts GROUP BY lang),
        vocab AS (SELECT DISTINCT g FROM grams),
        vsize AS (SELECT count(*) AS v FROM vocab),
        langs AS (SELECT DISTINCT lang FROM d),
        grid AS (
            SELECT l.lang, vo.g,
                   CAST(floor(ln((coalesce(c.c, 0) + 1.0) / (tt.t + vs.v))
                              * 1000000 + 0.5) AS BIGINT) AS lp_u
            FROM langs l
            CROSS JOIN vocab vo
            CROSS JOIN vsize vs
            JOIN tot tt ON tt.lang = l.lang
            LEFT JOIN counts c ON c.lang = l.lang AND c.g = vo.g
        ),
        priors AS (
            SELECT lang,
                   CAST(floor(ln(CAST(nd AS DOUBLE) / total) * 1000000 + 0.5)
                        AS BIGINT) AS prior_u
            FROM (SELECT lang, count(*) AS nd FROM d GROUP BY lang)
            CROSS JOIN (SELECT count(*) AS total FROM d)
        ),
        scores AS (
            SELECT g2.doc_id, gr.lang,
                   sum(gr.lp_u) + any_value(p.prior_u) AS score_u
            FROM grams g2
            JOIN grid gr ON gr.g = g2.g
            JOIN priors p ON p.lang = gr.lang
            GROUP BY g2.doc_id, gr.lang
        ),
        best AS (
            SELECT doc_id, max(score_u) AS score_u FROM scores GROUP BY doc_id
        )
        SELECT s.doc_id,
               max(s.lang) AS lang_pred,
               b.score_u AS score_u,
               CAST(max(s.lang) = any_value(dd.lang) AS INT) AS is_match
        FROM scores s
        JOIN best b ON s.doc_id = b.doc_id AND s.score_u = b.score_u
        JOIN d dd ON dd.doc_id = s.doc_id
        GROUP BY s.doc_id, b.score_u
    """,
    note="Trained language identification (operators/langid.py) — the "
    "fastText/CLD stage real pipelines run to DERIVE documents.lang: "
    "char-bigram Naive Bayes trained in ONE corpus pass (Laplace-"
    "smoothed per-language bigram log-probs quantized to integer "
    "micro-nats BEFORE summation, the x154 recipe, so SQL replays "
    "exactly), scored via a broadcast model grid (bounded charset^2 x "
    "langs at ANY corpus scale) + one (doc, lang) aggregation, argmax "
    "with a deterministic join-back tie-break — no windows, no Python. "
    "Real accuracy proven on planted multilingual docs in "
    "test_langid.py; the probe proves the distributed train+apply "
    "plan replays bit-exactly.",
)
def x238_langid(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.langid import langid_pipeline

    return langid_pipeline(T(spark, sf, "documents"))


@probe(
    "f33_ntv2_shift",
    sql="""
        WITH pts AS (
            SELECT c_custkey AS point_id,
                   -8.5 + (c_custkey % 64) * 0.03125 AS lon,
                   50.0 + ((c_custkey * 7) % 64) * 0.03125 AS lat
            FROM customer
        ),
        nodes AS (
            SELECT (v // 9) AS i, (v % 9) AS j,
                   (((v // 9) * 3 + (v % 9) * 5) % 7) * 0.0625
                       AS s_lat_sec,
                   (((v // 9) * 2 + (v % 9) * 3) % 5) * 0.125 - 0.25
                       AS s_lon_sec
            FROM (SELECT unnest(generate_series(0, 80)) AS v)
        ),
        idx AS (
            SELECT point_id, lon, lat,
                   CAST(floor((lat - 50.0) / 0.25) AS BIGINT) AS i,
                   CAST(floor((lon + 8.5) / 0.25) AS BIGINT) AS j,
                   (lat - 50.0) / 0.25
                       - floor((lat - 50.0) / 0.25) AS fy,
                   (lon + 8.5) / 0.25
                       - floor((lon + 8.5) / 0.25) AS fx
            FROM pts
        ),
        interp AS (
            SELECT point_id, lon, lat,
                   (1 - fx) * (1 - fy) * n00.s_lat_sec
                       + (1 - fx) * fy * n10.s_lat_sec
                       + fx * (1 - fy) * n01.s_lat_sec
                       + fx * fy * n11.s_lat_sec AS s_lat_sec,
                   (1 - fx) * (1 - fy) * n00.s_lon_sec
                       + (1 - fx) * fy * n10.s_lon_sec
                       + fx * (1 - fy) * n01.s_lon_sec
                       + fx * fy * n11.s_lon_sec AS s_lon_sec
            FROM idx x
            JOIN nodes n00 ON n00.i = x.i AND n00.j = x.j
            JOIN nodes n10 ON n10.i = x.i + 1 AND n10.j = x.j
            JOIN nodes n01 ON n01.i = x.i AND n01.j = x.j + 1
            JOIN nodes n11 ON n11.i = x.i + 1 AND n11.j = x.j + 1
        )
        SELECT point_id, lon, lat,
               1 AS in_grid,
               s_lat_sec, s_lon_sec,
               lon + s_lon_sec / 3600.0 AS lon_out,
               lat + s_lat_sec / 3600.0 AS lat_out
        FROM interp
    """,
    note="NTv2 grid-shift datum stage (functions/crs.py, EPSG method "
    "9615) — the survey-grade follow-on to the f31/f32 Helmert tier: "
    "a model-scale node grid (national .gsb files are MBs at ANY data "
    "scale; parse/write round-trip in test_crs.py) folds into a "
    "per-cell corner table once, points take ONE broadcast join then "
    "bilinear interpolation in seconds of arc, staged as "
    "materializing selects per the CollapseProject discipline. The "
    "synthetic grid uses dyadic node values and 2^-5-degree point "
    "offsets so every product/sum is exact in IEEE double — both "
    "engines agree bit-for-bit with no quantization grain.",
)
def f33_ntv2_shift(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.functions.crs import ntv2_cells, ntv2_shift_df

    idiv = F.expr("id DIV 9")
    imod = F.col("id") % 9
    nodes = spark.range(81).select(
        idiv.alias("i"),
        imod.alias("j"),
        (((idiv * 3 + imod * 5) % 7).cast("double") * F.lit(0.0625)).alias(
            "s_lat_sec"
        ),
        (
            ((idiv * 2 + imod * 3) % 5).cast("double") * F.lit(0.125)
            - F.lit(0.25)
        ).alias("s_lon_sec"),
    )
    cells = ntv2_cells(nodes)
    pts = T(spark, sf, "customer").select(
        F.col("c_custkey").alias("point_id"),
        (
            F.lit(-8.5)
            + (F.col("c_custkey") % 64).cast("double") * F.lit(0.03125)
        ).alias("lon"),
        (
            F.lit(50.0)
            + ((F.col("c_custkey") * 7) % 64).cast("double")
            * F.lit(0.03125)
        ).alias("lat"),
    )
    gm = dict(lat0=50.0, lon0=-8.5, dlat=0.25, dlon=0.25, nlat=9, nlon=9)
    return ntv2_shift_df(pts, "lon", "lat", cells, gm)


@probe(
    "x240_time_travel",
    sql="""
        WITH v0 AS (
            SELECT p_partkey, p_retailprice FROM part
            WHERE p_partkey % 3 = 0
        ),
        v1 AS (
            SELECT * FROM v0
            UNION ALL
            SELECT p_partkey, p_retailprice FROM part
            WHERE p_partkey % 3 = 1
        ),
        v2 AS (
            SELECT p_partkey,
                   CASE WHEN p_partkey % 6 = 0
                        THEN p_retailprice + 128.0
                        ELSE p_retailprice END AS p_retailprice
            FROM v1
            UNION ALL
            SELECT p_partkey, p_retailprice FROM part
            WHERE p_partkey % 3 = 2
        ),
        v3 AS (SELECT * FROM v2 WHERE p_partkey % 5 <> 0)
        SELECT 0 AS version, count(*) AS n_rows,
               sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
                   AS sum_cents
        FROM v0
        UNION ALL
        SELECT 1, count(*),
               sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
        FROM v1
        UNION ALL
        SELECT 2, count(*),
               sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
        FROM v2
        UNION ALL
        SELECT 3, count(*),
               sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
        FROM v3
    """,
    note="Transaction-log table format (sources/txlog.py, Delta-lite): "
    "the probe CREATEs a table from part, APPENDs, runs a "
    "copy-on-write MERGE (update+insert via the u4 operator) and a "
    "tombstone MERGE (delete), then reads ALL FOUR versions back via "
    "VERSION-AS-OF snapshot replay of the NDJSON commit log — the "
    "oracle recomputes every version's row count and exact integer-"
    "cent sum by replaying the same logical operations in SQL. "
    "Commits publish via atomic link-if-absent (concurrent writer "
    "loses cleanly — test_txlog.py); the log is metadata-scale, data "
    "files are ordinary parquet written once and never mutated.",
)
def x240_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from flytemosaic_spark.sources import txlog

    part = T(spark, sf, "part").select("p_partkey", "p_retailprice")
    path = os.path.join(tempfile.mkdtemp(prefix="txlog_x240_"), "t")
    txlog.create_table(
        spark, path, part.where(F.col("p_partkey") % 3 == 0)
    )
    txlog.append(spark, path, part.where(F.col("p_partkey") % 3 == 1))
    upd = part.where(F.col("p_partkey") % 6 == 0).select(
        "p_partkey",
        (F.col("p_retailprice") + F.lit(128.0)).alias("p_retailprice"),
    )
    ins = part.where(F.col("p_partkey") % 3 == 2)
    txlog.merge_into(spark, path, upd.unionByName(ins), ["p_partkey"])
    snap2 = txlog.read_snapshot(spark, path, 2)
    tomb = snap2.where(F.col("p_partkey") % 5 == 0).withColumn(
        "dead", F.lit(True)
    )
    txlog.merge_into(spark, path, tomb, ["p_partkey"], delete_col="dead")

    parts = []
    for v in range(4):
        parts.append(
            txlog.read_snapshot(spark, path, v).agg(
                F.lit(v).alias("version"),
                F.count("*").alias("n_rows"),
                F.sum(
                    F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
                    .cast("bigint")
                ).alias("sum_cents"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # Collect the 4 metadata-scale version stats eagerly so the temp
    # table can be removed NOW — otherwise every invocation (bench
    # warm run + best-of-N) orphans multi-version parquet on disk.
    schema = out.schema
    rows = out.collect()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@probe(
    "x241_winnow_dedup",
    sql="""
        WITH d AS (
            SELECT doc_id, text AS t FROM documents
            WHERE length(text) >= 31
        ),
        hl AS (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, length(t) - 23),
                       i -> md5(substr(t, i, 24)) || ':'
                            || lpad(CAST(i AS VARCHAR), 7, '0')
                   ) AS hs
            FROM d
        ),
        wl AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(hs) - 7),
                       i -> list_min(list_slice(hs, i, i + 7))
                   )) AS keys
            FROM hl
        ),
        fp AS (SELECT doc_id, unnest(keys) AS key FROM wl),
        keyed AS (
            SELECT doc_id,
                   substr(key, 1, 32) AS h,
                   lpad(CAST(doc_id AS VARCHAR), 12, '0') || ':'
                       || substr(key, 34, 7) AS gk
            FROM fp
        ),
        first AS (SELECT h, min(gk) AS gk0 FROM keyed GROUP BY h)
        SELECT keyed.doc_id,
               count(*) AS n_fp,
               sum(CASE WHEN gk = gk0 THEN 1 ELSE 0 END) AS n_kept,
               floor((1.0 - sum(CASE WHEN gk = gk0 THEN 1 ELSE 0 END)
                            / count(*)) * 1000000.0 + 0.5) / 1000000.0
                   AS dup_frac
        FROM keyed JOIN first USING (h)
        GROUP BY keyed.doc_id
    """,
    note="EXACT-substring dedup via winnowing (operators/dedup.py:"
    "winnow_dedup_stats; Schleimer/Wilkerson/Aiken SIGMOD'03, the "
    "distributed-friendly form of Lee et al. 2022's suffix-array "
    "method): every 24-char window hashes (md5, engine-portable), "
    "each run of 8 consecutive positions selects its minimum hash — "
    "so ANY exact copied passage >= 31 chars provably shares a "
    "selected fingerprint in both copies (property-tested on planted "
    "plagiarism in test_dedup.py), unlike x38's fixed-stride windows "
    "which miss unlucky alignments. Index is ~2n/p fingerprints; "
    "first-occurrence attribution is x153's encoded-key arg-min; "
    "plan is explode -> one hash agg -> join back -> per-doc rollup, "
    "linear in corpus chars, no pair blowup.",
)
def x241_winnow_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.dedup import winnow_dedup_stats

    return winnow_dedup_stats(T(spark, sf, "documents"))


@probe(
    "x242_webp_decode",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id,
                   8 + s_suppkey % 5 AS h,
                   8 + (s_suppkey * 3) % 7 AS w
            FROM supplier
        ),
        ys AS (
            SELECT media_id, h, w,
                   unnest(generate_series(0, h - 1)) AS y
            FROM keys
        ),
        xs AS (
            SELECT media_id, h, w, y,
                   unnest(generate_series(0, w - 1)) AS x
            FROM ys
        ),
        cs AS (
            SELECT media_id, h, w, y, x,
                   unnest(generate_series(0, 3)) AS c
            FROM xs
        )
        SELECT media_id,
               any_value(w) AS width,
               any_value(h) AS height,
               count(*) AS n_px,
               sum(CASE WHEN media_id % 4 = 3
                        THEN (((media_id + y + x) % (2 + media_id % 10))
                              * 37 + c * 11 + media_id) % 256
                        ELSE (media_id * 7 + y * 5 + x * 3 + c * 11) % 256
                   END) AS sum_px
        FROM cs
        GROUP BY media_id
    """,
    note="WebP VP8L decode in the gate (sources/webp.py — real "
    "lossless WebP: canonical prefix codes incl. the code-length-"
    "coded form, LZ77 with the spec's 2-D distance map, color cache, "
    "predictor/color/subtract-green transforms, palette with sub-byte "
    "packing): executors encode key-derived pixels cycling ALL FOUR "
    "encoder paths by key % 4 and decode through the image codec "
    "seam; the oracle recomputes exact integer pixel sums from the "
    "generating arithmetic — one wrong byte in any entropy or "
    "transform stage shifts sum_px. VP8 lossy stays the documented "
    "mp3-style seam (unverifiable-from-memory probability tables). "
    "Payloads never shuffle; explicit repartition spreads the "
    "per-row codec work (the x222 AQE rule).",
)
def x242_webp_decode(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        synthesize_webp,
        webp_pixel_stats,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return webp_pixel_stats(synthesize_webp(keys))


@probe(
    "x243_web_dedup",
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
        texts AS (
            SELECT media_id, i,
                   string_agg(
                       repeat('w', 8 + (media_id * 3 + i * 5 + j * 7)
                                       % 30) || '&',
                       chr(10) ORDER BY j
                   ) AS mt
            FROM paras
            GROUP BY media_id, i
        ),
        keyed AS (
            SELECT media_id, i, md5(mt) AS h, length(mt) AS chars,
                   media_id * 8 + i AS k2
            FROM texts
        ),
        first AS (SELECT h, min(k2) AS k0 FROM keyed GROUP BY h)
        SELECT keyed.media_id,
               count(*) AS n_pages_ok,
               sum(CASE WHEN k2 = k0 THEN 1 ELSE 0 END) AS n_kept,
               sum(CASE WHEN k2 = k0 THEN chars ELSE 0 END) AS kept_chars
        FROM keyed JOIN first USING (h)
        GROUP BY keyed.media_id
    """,
    note="END-TO-END web curation: WARC bytes -> HTTP split -> HTML "
    "main-content extraction -> GLOBAL exact dedup on the extracted "
    "text (md5 content key, first-occurrence (file, page) arg-min via "
    "the x153 bigint encoding) -> per-file keep stats. The oracle "
    "replays the ENTIRE pipeline in SQL — it reconstructs each page's "
    "exact extracted string (entity decoded, boilerplate dropped, "
    "blocks newline-joined) and hashes it, so one wrong byte in WARC "
    "parsing, HTML extraction, or dedup attribution fails the gate. "
    "Duplicate pages exist BY CONSTRUCTION across shards (page text "
    "depends on key arithmetic mod 30, so distinct (file, page) pairs "
    "collide). Shape: shard-parallel extract, one hash agg on the "
    "content key, join back, per-file rollup — the Common Crawl "
    "curation pipeline end to end with no quadratic stage.",
)
def x243_web_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.html import (
        synthesize_warc_html,
        warc_extract_pages,
    )

    pages = warc_extract_pages(
        synthesize_warc_html(T(spark, sf, "supplier").select("s_suppkey"))
    )
    from pyspark.sql import Window

    keyed = pages.select(
        "media_id",
        F.md5("main_text").alias("h"),
        F.length("main_text").cast("bigint").alias("chars"),
        (F.col("media_id") * 8 + F.col("page_idx")).alias("k2"),
    )
    # first occurrence via h-partitioned window (ONE pass) — an
    # agg + join-back would re-execute the WARC parse + extraction
    # once per consumer (the x191/x241 rule)
    kept = F.col("k2") == F.min("k2").over(Window.partitionBy("h"))
    return (
        keyed.select("media_id", "chars", kept.alias("kept"))
        .groupBy("media_id")
        .agg(
            F.count("*").alias("n_pages_ok"),
            F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("chars")).otherwise(0))
            .alias("kept_chars"),
        )
    )


@probe(
    "x244_robots_scan",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id, 4 + s_suppkey % 5 AS n
            FROM supplier
        ),
        urls AS (
            SELECT media_id, n,
                   unnest(generate_series(0, n - 1)) AS i
            FROM keys
        )
        SELECT media_id,
               any_value(n) AS n_urls,
               sum(CASE WHEN (media_id + i) % 4 <> media_id % 3
                        THEN 1 ELSE 0 END) AS n_allowed,
               1 + media_id % 7 AS delay_s
        FROM urls
        GROUP BY media_id
    """,
    note="robots.txt politeness gate (operators/crawl.py, stdlib "
    "urllib.robotparser fed the body directly — no network): host k "
    "disallows the /d{k%3}/ prefix with a crawl delay, its frontier "
    "is key-derived paths, and the scan emits fetchable counts + the "
    "delay budget; rule prefixes are DISJOINT so every robots "
    "semantics (first-match, longest-match) agrees and the oracle's "
    "arithmetic verdict is implementation-independent. The filter "
    "every polite crawler applies before a page can enter a corpus.",
)
def x244_robots_scan(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.crawl import (
        robots_scan,
        synthesize_robots,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return robots_scan(synthesize_robots(keys))


@probe(
    "x245_charset_decode",
    sql="""
        WITH base AS (
            SELECT s_suppkey AS media_id, s_suppkey % 4 AS mode,
                   'charset test ' || repeat('a', 5 + s_suppkey % 9)
                       AS s
            FROM supplier
        ),
        dec AS (
            SELECT media_id,
                   CASE mode
                        WHEN 0 THEN 'utf-8'
                        WHEN 1 THEN 'iso-8859-1'
                        WHEN 2 THEN 'utf-16-le'
                        ELSE 'utf-8-sig' END AS charset,
                   CASE mode
                        WHEN 0 THEN '<meta charset="utf-8">' || s
                                    || chr(20013)
                        WHEN 1 THEN '<meta charset="iso-8859-1">' || s
                                    || chr(233)
                        WHEN 2 THEN s || chr(20013)
                        ELSE s || chr(20013) END AS t
            FROM base
        )
        SELECT media_id, charset,
               length(t) AS n_chars,
               list_aggregate(
                   list_transform(generate_series(1, length(t)),
                                  i -> unicode(substr(t, i, 1))),
                   'sum'
               ) AS cp_sum
        FROM dec
    """,
    note="charset sniff + transcode (operators/crawl.py): crawled "
    "bytes are NOT utf-8 — executors write key-derived payloads in "
    "four wire encodings (meta-declared utf-8 / iso-8859-1 with a "
    "latin-1-only char, BOM'd utf-16-le, BOM'd utf-8, CJK content) "
    "and sniff_and_decode runs BOM -> meta-declaration -> utf-8 -> "
    "latin-1 fallback, stripping BOMs; the oracle reconstructs the "
    "exact decoded unicode string per key and checks length AND the "
    "codepoint sum — one mis-decoded byte anywhere shifts it. The "
    "CCNet-shaped normalization every text operator depends on.",
)
def x245_charset_decode(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.crawl import (
        charset_decode_stats,
        synthesize_charset_docs,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return charset_decode_stats(synthesize_charset_docs(keys))


@probe(
    "x246_incremental_crawl",
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
        texts AS (
            SELECT media_id, i,
                   md5(string_agg(
                       repeat('w', 8 + (media_id * 3 + i * 5 + j * 7)
                                       % 30) || '&',
                       chr(10) ORDER BY j
                   )) AS h
            FROM paras
            GROUP BY media_id, i
        ),
        b1 AS (
            SELECT DISTINCT h FROM texts WHERE media_id % 2 = 0
        ),
        b2_new AS (
            SELECT DISTINCT t.h
            FROM texts t
            WHERE media_id % 2 = 1
              AND NOT EXISTS (SELECT 1 FROM b1 WHERE b1.h = t.h)
        )
        SELECT 0 AS version, count(*) AS n_rows FROM b1
        UNION ALL
        SELECT 1, (SELECT count(*) FROM b1) + count(*) FROM b2_new
    """,
    note="INCREMENTAL crawl curation — the composition that makes the "
    "engine a system, not a bag of operators: batch 1 (even shards) "
    "runs WARC -> extract -> distinct content keys and CREATEs a "
    "Delta-lite table (sources/txlog.py); batch 2 (odd shards) "
    "extracts, ANTI-JOINS against the pinned table snapshot (only "
    "globally-new page content may enter the corpus) and APPENDs as a "
    "new log version. The probe reads BOTH versions back via time "
    "travel; the oracle replays extract + dedup + incremental set "
    "logic entirely in SQL from the generating arithmetic. The 100 TB "
    "shape: each re-crawl scans only its own shards, dedups against "
    "the table by one hash anti-join, and commits atomically "
    "(concurrent crawlers lose cleanly and retry).",
)
def x246_incremental_crawl(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from flytemosaic_spark.operators.html import (
        synthesize_warc_html,
        warc_extract_pages,
    )
    from flytemosaic_spark.sources import txlog

    keys = T(spark, sf, "supplier").select("s_suppkey")
    path = os.path.join(tempfile.mkdtemp(prefix="txlog_x246_"), "t")

    b1_pages = warc_extract_pages(
        synthesize_warc_html(keys.where(F.col("s_suppkey") % 2 == 0))
    )
    b1 = b1_pages.select(F.md5("main_text").alias("h")).distinct()
    txlog.create_table(spark, path, b1)

    b2_pages = warc_extract_pages(
        synthesize_warc_html(keys.where(F.col("s_suppkey") % 2 == 1))
    )
    seen = txlog.read_snapshot(spark, path)  # pinned snapshot
    b2_new = (
        b2_pages.select(F.md5("main_text").alias("h"))
        .distinct()
        .join(seen, "h", "left_anti")
    )
    txlog.append(spark, path, b2_new)

    parts = []
    for v in range(2):
        parts.append(
            txlog.read_snapshot(spark, path, v).agg(
                F.lit(v).alias("version"),
                F.count("*").alias("n_rows"),
            )
        )
    out = parts[0].unionByName(parts[1])
    # Eager collect + rmtree: don't orphan the temp table per run.
    schema = out.schema
    rows = out.collect()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return spark.createDataFrame(rows, schema)


_QC_FEATS = r"""
        toks AS (
            SELECT doc_id, n_chars,
                   unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents WHERE trim(text) <> ''
        ),
        bk AS (
            SELECT doc_id, n_chars,
                   CASE WHEN substr(md5(w), 1, 1) < '4' THEN 0
                        WHEN substr(md5(w), 1, 1) < '8' THEN 1
                        WHEN substr(md5(w), 1, 1) < 'c' THEN 2
                        ELSE 3 END AS b
            FROM toks
        ),
        d AS (
            SELECT CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*) AS f0,
                   CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*) AS f1,
                   CAST(sum(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*) AS f2,
                   count(*) / 100.0 AS flen,
                   1.0 AS _bias,
                   CAST(CAST(any_value(n_chars) >= 250 AS INT) AS DOUBLE)
                       AS y
            FROM bk GROUP BY doc_id
        )"""

_QC_COLS = ["f0", "f1", "f2", "flen", "_bias"]


def _qc_step(k: int, p: int) -> str:
    z = " + ".join(f"wp.w{j + 1} * {c}" for j, c in enumerate(_QC_COLS))
    gs = ",\n                   ".join(
        f"sum(CAST(floor(r * {c} * 1e9 + 0.5) AS BIGINT)) AS g{j + 1}"
        for j, c in enumerate(_QC_COLS)
    )
    ws = ",\n                   ".join(
        f"floor((wp.w{j + 1} - 0.05 * ((CAST(g{j + 1} AS DOUBLE) / 1e9)"
        f" / gg.n)) * 1e9 + 0.5) / 1e9 AS w{j + 1}"
        for j in range(len(_QC_COLS))
    )
    cols = ", ".join(_QC_COLS)
    return f"""
        g{k} AS (
            SELECT count(*) AS n,
                   {gs}
            FROM (
                SELECT {cols}, y,
                       (0.5 + z / (2.0 * (1.0 + abs(z)))) - y AS r
                FROM (SELECT d.*, {z} AS z
                      FROM d CROSS JOIN w{p} wp)
            )
        ),
        w{k} AS (
            SELECT {ws},
                   gg.n AS n
            FROM g{k} gg CROSS JOIN w{p} wp
        )"""


@probe(
    "x247_quality_classifier",
    sql="WITH"
    + _QC_FEATS
    + """,
        w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4,
                      0.0 AS w5),"""
    + _qc_step(1, 0)
    + ","
    + _qc_step(2, 1)
    + ","
    + _qc_step(3, 2)
    + """
        SELECT n, w1 AS w_f0, w2 AS w_f1, w3 AS w_f2, w4 AS w_flen,
               w5 AS w_bias
        FROM w3
    """,
    note="SUPERVISED document-quality classifier trained in-engine "
    "(the fastText/CCNet quality-filter stage, completing the quality "
    "family: x9 heuristic -> x154 LM score -> trained classifier): "
    "hashed-bucket token-share features (md5 first-hex ranges — "
    "portable, no hex->int) + a length feature, labels derived from "
    "the data (n_chars >= 250), then 3 full-batch GD steps of the "
    "x136 logistic trainer (fast-sigmoid link, per-row gradient "
    "contributions quantized to integer nano-units BEFORE the sum, "
    "weights rounded 1e-9 per step) — the whole training trajectory "
    "replays bit-identically in SQL. Each step is one scan + one "
    "1-row aggregate; the corpus never moves; at 100 TB the feature "
    "table is one map-side agg and training cost is steps x scans.",
)
def x247_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.linear import logreg_train_gd

    toks = (
        T(spark, sf, "documents")
        .where(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            "n_chars",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
        )
    )
    b = F.substring(F.md5("w"), 1, 1)
    bucket = (
        F.when(b < "4", 0).when(b < "8", 1).when(b < "c", 2).otherwise(3)
    )
    feat = toks.groupBy("doc_id").agg(
        (
            F.sum((bucket == 0).cast("double")) / F.count("*")
        ).alias("f0"),
        (
            F.sum((bucket == 1).cast("double")) / F.count("*")
        ).alias("f1"),
        (
            F.sum((bucket == 2).cast("double")) / F.count("*")
        ).alias("f2"),
        (F.count("*") / F.lit(100.0)).alias("flen"),
        (F.any_value("n_chars") >= 250).cast("int").cast("double").alias(
            "y"
        ),
    )
    return logreg_train_gd(
        feat, ["f0", "f1", "f2", "flen"], label_col="y", lr=0.05,
        iterations=3,
    ).select(
        "n",
        F.col("w_f0"),
        F.col("w_f1"),
        F.col("w_f2"),
        F.col("w_flen"),
        F.col("w_bias"),
    )
