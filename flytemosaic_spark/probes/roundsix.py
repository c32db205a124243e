"""Round-6 probes: CRS reprojection and mosaic resampling parity.

Closes the two reference-parity gaps called out by the round-2 review:
the caller-chosen CRS (`/root/reference/flytemosaic/mosaics.py:73`
``to_crs`` / `/root/reference/flyte/build.py:183` ``crs`` param) and
the target-resolution assembly (build.py:184 ``resolution``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import portable_round
from flytemosaic_spark.probes.registry import T, probe

# ---------------------------------------------------------------------------
# f22 — EPSG:4326 -> EPSG:3857 bbox reprojection as column math
# ---------------------------------------------------------------------------

from flytemosaic_spark.functions.crs import R as _R  # noqa: E402


@probe(
    "f22_crs_reproject",
    sql=f"""
        WITH deg AS (
            SELECT s_suppkey AS tile_id,
                   CAST((s_suppkey * 37) % 340 - 170 AS DOUBLE) AS minx,
                   CAST((s_suppkey * 53) % 160 - 80 AS DOUBLE) AS miny,
                   CAST((s_suppkey * 37) % 340 - 170 + 1 + s_suppkey % 5
                        AS DOUBLE) AS maxx,
                   CAST((s_suppkey * 53) % 160 - 80 + 1 + s_suppkey % 3
                        AS DOUBLE) AS maxy
            FROM supplier
        ),
        m AS (
            SELECT tile_id,
                   minx * ({_R} * pi() / 180) AS mx0,
                   {_R} * ln(tan(pi() / 4 + miny * (pi() / 360))) AS my0,
                   maxx * ({_R} * pi() / 180) AS mx1,
                   {_R} * ln(tan(pi() / 4 + maxy * (pi() / 360))) AS my1
            FROM deg
        )
        SELECT tile_id,
               floor(mx0 * 1000 + 0.5) / 1000 AS merc_minx,
               floor(my0 * 1000 + 0.5) / 1000 AS merc_miny,
               floor(mx1 * 1000 + 0.5) / 1000 AS merc_maxx,
               floor(my1 * 1000 + 0.5) / 1000 AS merc_maxy
        FROM m
        WHERE mx1 >= -5000000.0 AND mx0 <= 8000000.0
          AND my1 >= -4000000.0 AND my0 <= 6000000.0
    """,
    note="CRS reprojection as pure column math (functions/crs.py — the "
    "reference's to_crs, mosaics.py:73 / build.py:183): synthetic "
    "integer-degree tile boxes from supplier keys map EPSG:4326 -> "
    "EPSG:3857 with the closed-form spherical Web-Mercator transform "
    "(per-axis monotonic, so corner transform IS the bbox transform), "
    "then a mercator-space query window prunes — all JVM-side codegen "
    "expressions, no UDF, and the identical IEEE association replays "
    "in the oracle; mm quantization absorbs cross-libm tan/ln ulps "
    "(query-window edges sit ~9.5 km from any tile edge, so the "
    "filter can never flip on an ulp)",
)
def f22_crs_reproject(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.functions.crs import reproject_bbox_cols

    k = F.col("s_suppkey")
    deg = T(spark, sf, "supplier").select(
        k.alias("tile_id"),
        ((k * 37) % 340 - 170).cast("double").alias("minx"),
        ((k * 53) % 160 - 80).cast("double").alias("miny"),
        ((k * 37) % 340 - 170 + 1 + k % 5).cast("double").alias("maxx"),
        ((k * 53) % 160 - 80 + 1 + k % 3).cast("double").alias("maxy"),
    )
    m = reproject_bbox_cols(deg, "EPSG:4326", "EPSG:3857")
    return (
        m.where(
            (F.col("maxx") >= -5000000.0)
            & (F.col("minx") <= 8000000.0)
            & (F.col("maxy") >= -4000000.0)
            & (F.col("miny") <= 6000000.0)
        )
        .select(
            "tile_id",
            portable_round(F.col("minx"), 3).alias("merc_minx"),
            portable_round(F.col("miny"), 3).alias("merc_miny"),
            portable_round(F.col("maxx"), 3).alias("merc_maxx"),
            portable_round(F.col("maxy"), 3).alias("merc_maxy"),
        )
    )


# ---------------------------------------------------------------------------
# f23 — XYZ (slippy-map) tile assignment at a zoom level
# ---------------------------------------------------------------------------


@probe(
    "f23_xyz_tiles",
    sql="""
        WITH pts AS (
            SELECT s_suppkey,
                   CAST((s_suppkey * 37) % 360 - 180 AS DOUBLE) + 0.5 AS lon,
                   CAST((s_suppkey * 53) % 170 - 85 AS DOUBLE) + 0.5 AS lat
            FROM supplier
        )
        SELECT least(CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT),
                     63) AS tile_x,
               least(CAST(floor((1.0 - ln(tan(lat * (pi() / 180.0))
                                    + sqrt(tan(lat * (pi() / 180.0))
                                           * tan(lat * (pi() / 180.0)) + 1.0))
                                / pi())
                          / 2.0 * 64.0) AS BIGINT),
                     63) AS tile_y,
               count(*) AS n_points,
               min(s_suppkey) AS min_key
        FROM pts
        GROUP BY 1, 2
    """,
    note="slippy-map / XYZ tile addressing at zoom 6 (the Web-Mercator "
    "tiling grid every web tile sink shards by — the partition key a "
    "GTI-style mosaic store would use at planet scale): "
    "functions/crs.py:lonlat_to_xyz, pure column math (floor of one "
    "exact-IEEE x expression and one tan/ln/sqrt y expression — asinh "
    "spelled out as ln(t+sqrt(t²+1)) since DuckDB has no asinh — "
    "identical association in the oracle; half-degree synthetic points "
    "sit far from every irrational y-tile boundary). Aggregation by "
    "tile is the partition-sizing readout",
)
def f23_xyz_tiles(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.functions.crs import lonlat_to_xyz

    k = F.col("s_suppkey")
    pts = T(spark, sf, "supplier").select(
        k.alias("s_suppkey"),
        (((k * 37) % 360 - 180).cast("double") + 0.5).alias("lon"),
        (((k * 53) % 170 - 85).cast("double") + 0.5).alias("lat"),
    )
    tx, ty = lonlat_to_xyz(F.col("lon"), F.col("lat"), zoom=6)
    return (
        pts.select("s_suppkey", tx.alias("tile_x"), ty.alias("tile_y"))
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n_points"), F.min("s_suppkey").alias("min_key"))
    )


# ---------------------------------------------------------------------------
# x15b — mosaic pipeline at a caller-chosen target resolution
# ---------------------------------------------------------------------------


@probe(
    "x15b_mosaic_resampled",
    sql=None,
    note="the flagship mosaic workflow at a caller-chosen target "
    "resolution (reference build.py:184 resolution / GTI "
    "RESAMPLING=average): resample_factor=2 block-averages inside the "
    "fused composite kernel — zero extra shuffle, written bytes shrink "
    "4x before leaving the task. Golden-tested vs numpy at factors 2 "
    "and 4 in tests/test_pipeline.py; the driver smoke-checks the "
    "halved layout here.",
)
def x15b_mosaic_resampled(spark: SparkSession, sf: str) -> DataFrame:
    import datetime as dt
    import tempfile

    from flytemosaic_spark.fixtures import tile_grid
    from flytemosaic_spark.pipeline import build_mosaic

    tiles = tile_grid(spark, n=4)
    with tempfile.TemporaryDirectory() as d:
        layout = build_mosaic(
            spark,
            tiles,
            (0.0, 0.0, 3.0, 2.0),
            [dt.datetime(2020, 6, 1), dt.datetime(2021, 2, 1)],
            d + "/mosaic",
            n_bands=4,
            tile_px=16,
            resample_factor=2,
        )
    rows = [
        (
            tid,
            int(y0),
            int(x0),
            int(layout["shape"][2]),
            int(layout["shape"][3]),
            layout["n_chunks_written"],
        )
        for tid, (y0, x0) in sorted(layout["origins"].items())
    ]
    return spark.createDataFrame(
        rows,
        "tile_id string, y0 int, x0 int, out_h int, out_w int, total_chunks int",
    )


# ---------------------------------------------------------------------------
# x152 — canonical-URL dedup (web-corpus URL normalization)
# ---------------------------------------------------------------------------


@probe(
    "x152_url_canonical_dedup",
    sql=r"""
        WITH raw AS (
            SELECT doc_id,
                   (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
                   || '://'
                   || (CASE WHEN doc_id % 4 < 2 THEN 'WWW.' ELSE '' END)
                   || 'Site' || CAST(doc_id % 25 AS VARCHAR) || '.Com'
                   || (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END)
                   || '/p/' || CAST(doc_id % 100 AS VARCHAR)
                   || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
                   || (CASE WHEN doc_id % 2 = 0
                            THEN '?utm_source=news&id=7' ELSE '?id=7' END)
                   || (CASE WHEN doc_id % 4 = 0 THEN '#top' ELSE '' END)
                       AS url
            FROM documents
        ),
        stripped AS (
            SELECT doc_id, url,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(url, '#.*$', ''),
                           'utm_[a-z]+=[^&#]*&?', ''),
                       '[?&]$', '') AS u
            FROM raw
        ),
        parts AS (
            SELECT doc_id, url,
                   lower(split_part(u, '://', 1)) AS scheme,
                   split_part(split_part(u, '://', 2), '/', 1) AS hostport,
                   substr(split_part(u, '://', 2),
                          length(split_part(split_part(u, '://', 2), '/', 1))
                          + 1) AS pathq
            FROM stripped
        ),
        canon AS (
            SELECT doc_id, url,
                   scheme || '://'
                   || regexp_replace(
                          regexp_replace(lower(hostport), ':80$', ''),
                          '^www\.', '')
                   || regexp_replace(pathq, '/\?', '?') AS canonical_url
            FROM parts
        )
        SELECT canonical_url,
               count(*) AS n_variants,
               count(DISTINCT url) AS n_raw_forms,
               min(doc_id) AS keeper_doc
        FROM canon
        GROUP BY canonical_url
    """,
    note="canonical-URL dedup — the first pass of every web-corpus "
    "pipeline: scheme/host case folding, www. and default-:80 "
    "stripping, utm_* tracking-param removal, trailing-slash and "
    "fragment normalization, all single-pass regexp/string column "
    "expressions (each pattern matches at most once, so Spark's "
    "replace-all and DuckDB's replace-first agree); exact dedup on "
    "the canonical form with keep-lowest-id. Synthetic URL variants "
    "derive deterministically from doc_id so both engines build the "
    "identical corpus",
)
def x152_url_canonical_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(d % 4 < 2, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Site"), (d % 25).cast("string"), F.lit(".Com"),
        F.when(d % 3 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p/"), (d % 100).cast("string"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("?utm_source=news&id=7")).otherwise(
            F.lit("?id=7")
        ),
        F.when(d % 4 == 0, F.lit("#top")).otherwise(F.lit("")),
    )
    raw = T(spark, sf, "documents").select("doc_id", url.alias("url"))
    u = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("url"), "#.*$", ""),
            "utm_[a-z]+=[^&#]*&?",
            "",
        ),
        "[?&]$",
        "",
    )
    stripped = raw.select("doc_id", "url", u.alias("u"))
    rest = F.try_element_at(F.split(F.col("u"), "://"), F.lit(2))
    hostport = F.try_element_at(F.split(rest, "/"), F.lit(1))
    parts = stripped.select(
        "doc_id",
        "url",
        F.lower(F.try_element_at(F.split(F.col("u"), "://"), F.lit(1))).alias("scheme"),
        hostport.alias("hostport"),
        F.expr(
            "substr(try_element_at(split(u, '://'), 2),"
            " length(try_element_at(split(try_element_at(split(u, '://'), 2), '/'), 1))"
            " + 1)"
        ).alias("pathq"),
    )
    canonical = F.concat(
        F.col("scheme"),
        F.lit("://"),
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("hostport")), ":80$", ""),
            r"^www\.",
            "",
        ),
        F.regexp_replace(F.col("pathq"), r"/\?", "?"),
    )
    return (
        parts.select("doc_id", "url", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_variants"),
            F.countDistinct("url").alias("n_raw_forms"),
            F.min("doc_id").alias("keeper_doc"),
        )
    )


# ---------------------------------------------------------------------------
# x153 — span-level (paragraph) dedup with global first-occurrence wins
# ---------------------------------------------------------------------------

_SPAN = 10  # tokens per span


@probe(
    "x153_span_dedup",
    sql=rf"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''
        ),
        docs AS (
            SELECT doc_id, w, len(w) // {_SPAN} AS nseg
            FROM toks WHERE len(w) >= {_SPAN}
        ),
        lists AS (
            SELECT doc_id,
                   list_transform(range(1, nseg + 1),
                       s -> {{'pos': s,
                              'span': array_to_string(
                                  list_slice(w, (s - 1) * {_SPAN} + 1,
                                             s * {_SPAN}), ' ')}}) AS us
            FROM docs
        ),
        spans AS (
            SELECT doc_id, u.pos, md5(u.span) AS h
            FROM lists, unnest(us) AS t(u)
        ),
        keyed AS (
            SELECT doc_id, pos, h,
                   doc_id * 1000000 + pos AS k
            FROM spans
        ),
        first AS (SELECT h, min(k) AS k0 FROM keyed GROUP BY h)
        SELECT keyed.doc_id,
               count(*) AS n_spans,
               sum(CASE WHEN k = k0 THEN 1 ELSE 0 END) AS n_kept,
               floor(sum(CASE WHEN k = k0 THEN 1 ELSE 0 END)
                     / count(*) * 1000000 + 0.5) / 1000000 AS kept_frac
        FROM keyed JOIN first USING (h)
        GROUP BY keyed.doc_id
    """,
    note="span-level dedup (the paragraph/passage dedup of Dolma/CCNet "
    "pipelines, on fixed 10-token spans since the synthetic corpus has "
    "no paragraph breaks): spans hash via md5, the globally FIRST "
    "occurrence (lowest (doc_id, position), encoded as one bigint key "
    "so min() is the lexicographic arg-min on both engines) survives, "
    "every later copy drops. Plan shape: map-side span explode -> one "
    "hash aggregation on the span hash -> equi-join back -> per-doc "
    "rollup; cost is linear in corpus tokens and the join meets only "
    "real hash collisions — the same inverted-index shape as x38 "
    "substring dedup with first-wins attribution added",
)
def x153_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    toks = (
        T(spark, sf, "documents")
        .where(F.trim(F.col("text")) != "")
        .select("doc_id", tokens(F.col("text")).alias("w"))
        .where(F.size("w") >= _SPAN)
        .withColumn("nseg", (F.size("w") / _SPAN).cast("int"))
    )
    span_structs = F.transform(
        F.sequence(F.lit(1), F.col("nseg")),
        lambda s: F.struct(
            s.alias("pos"),
            F.concat_ws(
                " ", F.slice(F.col("w"), (s - 1) * _SPAN + 1, _SPAN)
            ).alias("span"),
        ),
    )
    keyed = (
        toks.select("doc_id", F.explode(span_structs).alias("u"))
        .select(
            "doc_id",
            F.col("u.pos").alias("pos"),
            F.md5(F.col("u.span")).alias("h"),
            (F.col("doc_id") * 1000000 + F.col("u.pos")).alias("k"),
        )
    )
    first = keyed.groupBy("h").agg(F.min("k").alias("k0"))
    kept = F.sum((F.col("k") == F.col("k0")).cast("bigint"))
    return (
        keyed.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            kept.alias("n_kept"),
            portable_round(kept / F.count("*"), 6).alias("kept_frac"),
        )
    )


# ---------------------------------------------------------------------------
# x154 — unigram LM document scoring (perplexity-style quality filter)
# ---------------------------------------------------------------------------


@probe(
    "x154_doc_lm_score",
    sql=r"""
        WITH occ AS (
            SELECT doc_id, u.w AS w
            FROM (SELECT doc_id,
                         list_transform(string_split_regex(trim(text), '\s+'),
                                        x -> {'w': x}) AS us
                  FROM documents WHERE trim(text) <> ''),
                 unnest(us) AS t(u)
        ),
        freq AS (SELECT w, count(*) AS n FROM occ GROUP BY w),
        tot AS (SELECT sum(n) AS total FROM freq),
        lp AS (
            SELECT w,
                   CAST(floor(ln(CAST(n AS DOUBLE) / total) * 1000000 + 0.5)
                        AS BIGINT) AS lp_u
            FROM freq CROSS JOIN tot
        )
        SELECT doc_id,
               count(*) AS n_tokens,
               floor(CAST(sum(lp_u) AS DOUBLE) / count(*) / 1000.0 + 0.5)
                   / 1000.0 AS avg_logprob
        FROM occ JOIN lp USING (w)
        GROUP BY doc_id
    """,
    note="unigram-LM document scoring — the perplexity-style quality "
    "filter (CCNet/Gopher gate a doc on its LM score before training): "
    "corpus unigram probabilities p(w) = n_w/N, per-token ln p "
    "quantized to integer micro-nats BEFORE summation so the per-doc "
    "mean is association-free and replays exactly; one token explode, "
    "one vocab aggregation, one equi-join on the word (vocabulary "
    "side is heavy-hitter skewed at corpus scale — broadcast it while "
    "it fits, salt the join when it does not), one per-doc rollup",
)
def x154_doc_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    occ = (
        T(spark, sf, "documents")
        .where(F.trim(F.col("text")) != "")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    )
    freq = occ.groupBy("w").agg(F.count("*").alias("n"))
    tot = freq.agg(F.sum("n").alias("total"))
    lp = freq.crossJoin(F.broadcast(tot)).select(
        "w",
        F.floor(
            F.log(F.col("n").cast("double") / F.col("total")) * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("lp_u"),
    )
    return (
        occ.join(F.broadcast(lp), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.floor(
                    F.sum("lp_u").cast("double") / F.count("*") / F.lit(1000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000.0)
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# x155 — overlapping-window chunking (RAG / embedding prep)
# ---------------------------------------------------------------------------

_CHUNK = 32  # tokens per chunk
_STRIDE = 24  # chunk stride (8-token overlap)


@probe(
    "x155_chunk_for_embedding",
    sql=rf"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w,
                   len(string_split_regex(trim(text), '\s+')) AS n
            FROM documents WHERE trim(text) <> ''
        ),
        sized AS (
            SELECT doc_id, w, n,
                   CASE WHEN n <= {_CHUNK} THEN 1
                        ELSE (n - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE} + 1
                   END AS nchunks
            FROM toks
        ),
        lists AS (
            SELECT doc_id, n,
                   list_transform(range(1, nchunks + 1),
                       c -> {{'idx': c,
                              'start': (c - 1) * {_STRIDE} + 1,
                              'h': md5(array_to_string(
                                  list_slice(w, (c - 1) * {_STRIDE} + 1,
                                             (c - 1) * {_STRIDE} + {_CHUNK}),
                                  ' '))}}) AS cs
            FROM sized
        )
        SELECT doc_id,
               CAST(u.idx AS BIGINT) AS chunk_idx,
               CAST(u.start AS BIGINT) AS start_tok,
               CAST(least({_CHUNK}, n - u.start + 1) AS BIGINT) AS n_tok,
               u.h AS chunk_md5
        FROM lists, unnest(cs) AS t(u)
    """,
    note="overlapping-window chunking — the RAG/embedding prep step "
    "(32-token chunks, stride 24): chunk boundaries are pure integer "
    "math from the token count, chunk content hashes via md5, one "
    "map-side explode and ZERO shuffles (the chunker is "
    "embarrassingly parallel — the chunk table partitions however "
    "the doc scan did); the chunk_md5 doubles as the dedup/cache key "
    "the downstream embedding pass batches on",
)
def x155_chunk_for_embedding(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    toks = (
        T(spark, sf, "documents")
        .where(F.trim(F.col("text")) != "")
        .select("doc_id", tokens(F.col("text")).alias("w"))
        .withColumn("n", F.size("w"))
    )
    nchunks = F.when(F.col("n") <= _CHUNK, F.lit(1)).otherwise(
        ((F.col("n") - _CHUNK + _STRIDE - 1) / _STRIDE).cast("int") + 1
    )
    chunk_structs = F.transform(
        F.sequence(F.lit(1), nchunks),
        lambda c: F.struct(
            c.alias("idx"),
            ((c - 1) * _STRIDE + 1).alias("start"),
            F.md5(
                F.concat_ws(
                    " ", F.slice(F.col("w"), (c - 1) * _STRIDE + 1, _CHUNK)
                )
            ).alias("h"),
        ),
    )
    return toks.select(
        "doc_id", "n", F.explode(chunk_structs).alias("u")
    ).select(
        "doc_id",
        F.col("u.idx").cast("bigint").alias("chunk_idx"),
        F.col("u.start").cast("bigint").alias("start_tok"),
        F.least(F.lit(_CHUNK), F.col("n") - F.col("u.start") + 1)
        .cast("bigint")
        .alias("n_tok"),
        F.col("u.h").alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# x156 — preference-pair construction (DPO/RLHF data prep)
# ---------------------------------------------------------------------------


@probe(
    "x156_preference_pairs",
    sql="""
        WITH scored AS (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id) AS r_best,
                   row_number() OVER (PARTITION BY source
                       ORDER BY n_chars ASC, doc_id) AS r_worst,
                   count(*) OVER (PARTITION BY source) AS n_docs
            FROM documents
        ),
        best AS (SELECT source, doc_id AS chosen_doc,
                        n_chars AS chosen_chars, n_docs
                 FROM scored WHERE r_best = 1 AND n_docs >= 2),
        worst AS (SELECT source, doc_id AS rejected_doc,
                         n_chars AS rejected_chars
                  FROM scored WHERE r_worst = 1)
        SELECT best.source, n_docs, chosen_doc, rejected_doc,
               chosen_chars - rejected_chars AS margin
        FROM best JOIN worst USING (source)
    """,
    note="preference-pair construction — the DPO/RLHF data-prep shape: "
    "per prompt group (source stands in for the prompt key) pick the "
    "best- and worst-scoring completion (n_chars as the deterministic "
    "stand-in for a reward score; ties break on doc_id) and emit "
    "(chosen, rejected, margin). Windows partition by the group key — "
    "partition size = completions per prompt, never corpus scale; "
    "groups with one completion drop (no self-pairs)",
)
def x156_preference_pairs(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", "source", "n_chars")
    w_best = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    w_worst = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id")
    )
    w_cnt = Window.partitionBy("source")
    scored = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w_best).alias("r_best"),
        F.row_number().over(w_worst).alias("r_worst"),
        F.count("*").over(w_cnt).alias("n_docs"),
    )
    best = scored.where((F.col("r_best") == 1) & (F.col("n_docs") >= 2)).select(
        "source",
        F.col("doc_id").alias("chosen_doc"),
        F.col("n_chars").alias("chosen_chars"),
        "n_docs",
    )
    worst = scored.where(F.col("r_worst") == 1).select(
        "source",
        F.col("doc_id").alias("rejected_doc"),
        F.col("n_chars").alias("rejected_chars"),
    )
    return best.join(worst, "source").select(
        "source",
        "n_docs",
        "chosen_doc",
        "rejected_doc",
        (F.col("chosen_chars") - F.col("rejected_chars")).alias("margin"),
    )


# ---------------------------------------------------------------------------
# x157 — ANALYZE-style per-column table statistics
# ---------------------------------------------------------------------------


@probe(
    "x157_table_stats",
    sql="""
        SELECT 'o_custkey' AS column_name,
               count(*) AS n_rows,
               count(*) - count(o_custkey) AS n_null,
               count(DISTINCT o_custkey) AS ndv,
               CAST(min(o_custkey) AS VARCHAR) AS min_s,
               CAST(max(o_custkey) AS VARCHAR) AS max_s
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus),
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
    """,
    note="ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS as a query: "
    "row count, null count, exact NDV, min/max per column — the stats "
    "the optimizer's join-reorder and broadcast decisions feed on. "
    "ONE scan: all per-column aggregates run in a single aggregation "
    "and unpivot to the long stats schema via an inline array-explode "
    "(the oracle's UNION ALL is the readable equivalent; Spark-side a "
    "triple scan would read the table three times — at 100 TB the "
    "single-pass shape is the difference between ANALYZE being free "
    "at ingest and being its own job); int/string min-max only, so "
    "the stringified values are engine-portable (no double formatting)",
)
def x157_table_stats(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    agg = o.agg(
        F.count("*").alias("n"),
        *[
            e
            for c in ("o_custkey", "o_orderstatus", "o_orderpriority")
            for e in (
                F.count(c).alias(f"nn_{c}"),
                F.countDistinct(c).alias(f"ndv_{c}"),
                F.min(c).cast("string").alias(f"mn_{c}"),
                F.max(c).cast("string").alias(f"mx_{c}"),
            )
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n").alias("n_rows"),
                (F.col("n") - F.col(f"nn_{c}")).alias("n_null"),
                F.col(f"ndv_{c}").alias("ndv"),
                F.col(f"mn_{c}").alias("min_s"),
                F.col(f"mx_{c}").alias("max_s"),
            )
            for c in ("o_custkey", "o_orderstatus", "o_orderpriority")
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


# ---------------------------------------------------------------------------
# x158 — blocklist phrase filtering
# ---------------------------------------------------------------------------

_BLOCKLIST = ["table scan", "slow filter", "big vector"]


@probe(
    "x158_blocklist_filter",
    sql=f"""
        SELECT doc_id,
               CAST(len(list_filter({_BLOCKLIST},
                                    t -> contains(text, t))) AS INT) AS n_hits,
               len(list_filter({_BLOCKLIST}, t -> contains(text, t))) = 0
                   AS kept
        FROM documents
    """,
    note="blocklist phrase filtering — the NSFW/spam/boilerplate drop "
    "gate of a web-corpus pipeline: N literal phrases tested with "
    "plain substring contains inside a higher-order filter, entirely "
    "map-side (zero shuffles, the blocklist is a literal array in the "
    "plan, scale it to a broadcast join against a phrase table when "
    "it outgrows an expression); per-doc hit count + keep verdict",
)
def x158_blocklist_filter(spark: SparkSession, sf: str) -> DataFrame:
    terms = F.array(*[F.lit(t) for t in _BLOCKLIST])
    hits = F.size(F.filter(terms, lambda t: F.contains(F.col("text"), t)))
    return T(spark, sf, "documents").select(
        "doc_id",
        hits.cast("int").alias("n_hits"),
        (hits == 0).alias("kept"),
    )


# ---------------------------------------------------------------------------
# x113b — co-occurrence top-k, basket-list scale path (x113's twin)
# ---------------------------------------------------------------------------


@probe(
    "x113b_cooccur_topk_basket",
    sql="""
        WITH pw AS (
            SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS w
            FROM lineitem a
            JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ),
        sym AS (SELECT u, v, w FROM pw UNION ALL SELECT v, u, w FROM pw),
        f AS (SELECT l_partkey AS item, count(DISTINCT l_orderkey) AS nf
              FROM lineitem GROUP BY 1),
        sc AS (
            SELECT sym.u, sym.v,
                   floor((sym.w / sqrt(CAST(fu.nf * fv.nf AS DOUBLE)))
                         * 1000000 + 0.5) / 1000000 AS cos_sim
            FROM sym
            JOIN f fu ON sym.u = fu.item
            JOIN f fv ON sym.v = fv.item
        ),
        rk AS (
            SELECT u, v, cos_sim,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY cos_sim DESC, v) AS rnk
            FROM sc
        )
        SELECT u AS l_partkey, CAST(rnk AS BIGINT) AS rnk,
               v AS co_partkey, cos_sim
        FROM rk WHERE rnk <= 3
    """,
    note="x113's SCALE-PATH twin (same oracle, different plan): pair "
    "generation via collect_list per basket + a map-side sorted-array "
    "pair expansion instead of the lineitem self-join — one shuffle "
    "(the basket groupBy) replaces two join-side shuffles, and the "
    "10x sweep measures it FLAT (4.2s -> 4.5s, 1.1x) where the "
    "self-join form grows 2.8x (2.9s -> 8.1s); the self-join form "
    "stays faster at sf0.1 absolute (2.8s); x113 now picks between "
    "the two plans cost-based (operators/recsys.cooccur_topk), and "
    "this probe pins plan=basket so the scale path stays "
    "independently oracle-checked and sweepable",
)
def x113b_cooccur_topk_basket(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.recsys import cooccur_topk

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    return cooccur_topk(li, "l_orderkey", "l_partkey", k=3, plan="basket").select(
        F.col("item").alias("l_partkey"),
        "rnk",
        F.col("co_item").alias("co_partkey"),
        "cos_sim",
    )


# ---------------------------------------------------------------------------
# x159 — seasonal decomposition (trend + weekday seasonality)
# ---------------------------------------------------------------------------


@probe(
    "x159_seasonal_decompose",
    sql="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events GROUP BY 1
        ),
        tr AS (
            SELECT d, cents,
                   CAST(sum(cents) OVER w AS DOUBLE)
                       / count(*) OVER w AS trend
            FROM daily
            WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        det AS (
            SELECT date_diff('day', DATE '1970-01-01', d) % 7 AS weekday_idx,
                   CAST(floor((cents - trend) * 1000000 + 0.5) AS BIGINT)
                       AS det_u
            FROM tr
        )
        SELECT CAST(weekday_idx AS BIGINT) AS weekday_idx,
               count(*) AS n_days,
               floor(CAST(sum(det_u) AS DOUBLE) / count(*) / 1000000.0
                     * 100 + 0.5) / 100 AS seasonal_cents
        FROM det GROUP BY 1
    """,
    note="seasonal decomposition (STL-lite): daily integer-cent "
    "revenue, centered 7-day moving-average trend (the day axis is "
    "calendar-bounded — bounded_window declares the single partition "
    "in-plan), detrended residuals quantized to integer micro-units "
    "BEFORE the per-weekday mean so the seasonal index replays "
    "exactly; weekday from epoch-day mod 7 (portable across engines' "
    "dayofweek conventions). The weekday seasonal table is what a "
    "forecast or anomaly gate subtracts at serving time",
)
def x159_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.plans.prefix import bounded_window

    daily = (
        T(spark, sf, "events")
        .select(
            F.col("ts").cast("date").alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    w = bounded_window("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "cents",
        (F.sum("cents").over(w).cast("double") / F.count("*").over(w)).alias(
            "trend"
        ),
    )
    det = tr.select(
        (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7).alias(
            "weekday_idx"
        ),
        F.floor((F.col("cents") - F.col("trend")) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("det_u"),
    )
    return det.groupBy(F.col("weekday_idx").cast("bigint").alias("weekday_idx")).agg(
        F.count("*").alias("n_days"),
        (
            F.floor(
                F.sum("det_u").cast("double") / F.count("*") / F.lit(1e6)
                * 100
                + F.lit(0.5)
            )
            / F.lit(100.0)
        ).alias("seasonal_cents"),
    )


# ---------------------------------------------------------------------------
# x160 — per-segment rate with Wilson confidence interval
# ---------------------------------------------------------------------------

_WILSON_Z = 1.96


@probe(
    "x160_wilson_ci",
    sql=f"""
        WITH g AS (
            SELECT event_type,
                   count(*) AS n,
                   sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS k
            FROM events GROUP BY 1
        ),
        w AS (
            SELECT event_type, n, k,
                   CAST(k AS DOUBLE) / n AS p,
                   {_WILSON_Z} * {_WILSON_Z} AS z2
            FROM g
        )
        SELECT event_type, n, k,
               floor(p * 1000000 + 0.5) / 1000000 AS rate,
               floor((p + z2 / (2 * n)
                      - {_WILSON_Z} * sqrt(p * (1 - p) / n
                                           + z2 / (4.0 * n * n)))
                     / (1 + z2 / n) * 1000000 + 0.5) / 1000000 AS ci_lo,
               floor((p + z2 / (2 * n)
                      + {_WILSON_Z} * sqrt(p * (1 - p) / n
                                           + z2 / (4.0 * n * n)))
                     / (1 + z2 / n) * 1000000 + 0.5) / 1000000 AS ci_hi
        FROM w
    """,
    note="per-segment success rate with the Wilson score interval "
    "(z=1.96) — the eval readout that makes small-n segment metrics "
    "honest (a 3-of-4 segment shows its real uncertainty instead of "
    "'75%'): integer (k, n) per group, the interval is pure IEEE "
    "arithmetic + one correctly-rounded sqrt written with the "
    "identical association on both engines, rounded at 1e-6. One "
    "aggregation, segment-cardinality output",
)
def x160_wilson_ci(spark: SparkSession, sf: str) -> DataFrame:
    g = (
        T(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value") > 50.0).cast("bigint")).alias("k"),
        )
    )
    p = F.col("k").cast("double") / F.col("n")
    z = F.lit(_WILSON_Z)
    z2 = z * z
    denom = F.lit(1) + z2 / F.col("n")
    center = p + z2 / (F.lit(2) * F.col("n"))
    margin = z * F.sqrt(
        p * (F.lit(1) - p) / F.col("n")
        + z2 / (F.lit(4.0) * F.col("n") * F.col("n"))
    )
    return g.select(
        "event_type",
        "n",
        "k",
        portable_round(p, 6).alias("rate"),
        portable_round((center - margin) / denom, 6).alias("ci_lo"),
        portable_round((center + margin) / denom, 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# x161 — join cardinality estimation from count-min sketches
# ---------------------------------------------------------------------------


@probe(
    "x161_join_cardinality_sketch",
    sql="""
        WITH dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
        a AS (
            SELECT d,
                   substr(md5(concat(d, ':', CAST(l_orderkey AS VARCHAR))),
                          1, 2) AS slot,
                   count(*) AS cnt
            FROM lineitem CROSS JOIN dd GROUP BY 1, 2
        ),
        filt AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0),
        b AS (
            SELECT d,
                   substr(md5(concat(d, ':', CAST(o_orderkey AS VARCHAR))),
                          1, 2) AS slot,
                   count(*) AS cnt
            FROM filt CROSS JOIN dd GROUP BY 1, 2
        ),
        dot AS (
            SELECT a.d, sum(a.cnt * b.cnt) AS s
            FROM a JOIN b ON a.d = b.d AND a.slot = b.slot
            GROUP BY a.d
        ),
        est AS (SELECT min(s) AS est_rows FROM dot),
        ex AS (
            SELECT count(*) AS exact_rows
            FROM lineitem JOIN filt ON l_orderkey = o_orderkey
        )
        SELECT CAST(est_rows AS BIGINT) AS est_rows,
               CAST(exact_rows AS BIGINT) AS exact_rows,
               floor(CAST(est_rows - exact_rows AS DOUBLE) / exact_rows
                     * 1000000 + 0.5) / 1000000 AS rel_overestimate
        FROM est CROSS JOIN ex
    """,
    note="join-cardinality estimation from count-min sketches — the "
    "optimizer-statistics trick (|A join B| <= min_d sum_slot "
    "cmsA[d][s]*cmsB[d][s], an upper bound that is tight when slot "
    "collisions are rare): both sides sketch into depth x 256 integer "
    "counters via the portable md5 slot family (operators/cms.py), the "
    "dot product is a (d, slot) equi-join over sketch-sized tables — "
    "the decision 'is this join explodable / broadcastable' costs two "
    "map-side sketch passes instead of executing the join; the exact "
    "join count rides alongside as the error readout. All-integer "
    "state, EXACT oracle replay",
)
def x161_join_cardinality_sketch(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.cms import cms_build

    li = T(spark, sf, "lineitem").select("l_orderkey")
    filt = (
        T(spark, sf, "orders")
        .where(F.col("o_totalprice") > 150000.0)
        .select("o_orderkey")
    )
    a = cms_build(li, "l_orderkey")
    b = (
        cms_build(filt, "o_orderkey")
        .withColumnRenamed("cnt", "cnt_b")
    )
    dot = (
        a.join(b, ["d", "slot"])
        .groupBy("d")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("s"))
    )
    est = dot.agg(F.min("s").cast("bigint").alias("est_rows"))
    ex = (
        li.join(filt, li["l_orderkey"] == filt["o_orderkey"])
        .agg(F.count("*").cast("bigint").alias("exact_rows"))
    )
    return est.crossJoin(ex).select(
        "est_rows",
        "exact_rows",
        portable_round(
            (F.col("est_rows") - F.col("exact_rows")).cast("double")
            / F.col("exact_rows"),
            6,
        ).alias("rel_overestimate"),
    )


# ---------------------------------------------------------------------------
# x162 — cohort retention matrix
# ---------------------------------------------------------------------------


@probe(
    "x162_cohort_retention",
    sql="""
        WITH act AS (
            SELECT user_id,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS w
            FROM events GROUP BY 1, 2
        ),
        coh AS (SELECT user_id, min(w) AS w0 FROM act GROUP BY 1),
        mat AS (
            SELECT coh.w0, act.w - coh.w0 AS age,
                   count(DISTINCT act.user_id) AS n_users
            FROM act JOIN coh ON act.user_id = coh.user_id
            GROUP BY 1, 2
        ),
        base AS (SELECT w0, n_users AS n_cohort FROM mat WHERE age = 0)
        SELECT CAST(mat.w0 AS BIGINT) AS cohort_day,
               CAST(mat.age AS BIGINT) AS age_days,
               mat.n_users,
               floor(CAST(mat.n_users AS DOUBLE) / base.n_cohort
                     * 1000000 + 0.5) / 1000000 AS retention
        FROM mat JOIN base ON mat.w0 = base.w0
    """,
    note="cohort retention matrix — the activation/retention readout "
    "every product-analytics deployment runs (D1/D7 retention): "
    "cohort = each user's first active day (epoch-day integer "
    "arithmetic, no engine calendar semantics), age = days since "
    "cohort, cell = distinct active users, normalized by the age-0 "
    "cohort size. "
    "Per-user distinct weeks first (one hash agg), then the matrix "
    "agg — both partial-aggregable; the age-0 base joins back "
    "broadcast (cohort-cardinality). All-integer until one final "
    "division",
)
def x162_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    act = (
        ev.select("user_id", day.alias("w"))
        .groupBy("user_id", "w")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    coh = act.groupBy("user_id").agg(F.min("w").alias("w0"))
    mat = (
        act.join(coh, "user_id")
        .groupBy("w0", (F.col("w") - F.col("w0")).alias("age"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    base = mat.where(F.col("age") == 0).select(
        "w0", F.col("n_users").alias("n_cohort")
    )
    return mat.join(F.broadcast(base), "w0").select(
        F.col("w0").cast("bigint").alias("cohort_day"),
        F.col("age").cast("bigint").alias("age_days"),
        "n_users",
        portable_round(
            F.col("n_users").cast("double") / F.col("n_cohort"), 6
        ).alias("retention"),
    )


# ---------------------------------------------------------------------------
# x163 — event-type transition matrix (first-order Markov chain)
# ---------------------------------------------------------------------------


@probe(
    "x163_event_transitions",
    sql="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS next_type
            FROM events
        ),
        tr AS (
            SELECT event_type AS from_type, next_type AS to_type,
                   count(*) AS n_trans
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        ),
        tot AS (SELECT from_type, sum(n_trans) AS n_out FROM tr GROUP BY 1)
        SELECT tr.from_type, tr.to_type, tr.n_trans,
               floor(CAST(tr.n_trans AS DOUBLE) / tot.n_out * 1000000 + 0.5)
                   / 1000000 AS p
        FROM tr JOIN tot ON tr.from_type = tot.from_type
    """,
    note="first-order Markov transition matrix over user event "
    "journeys — the user-flow model behind next-action prediction and "
    "journey anomaly detection: lead() per user ordered by "
    "(ts, event_id) (deterministic tie-break), transition counts, "
    "row-normalized per source type. The window partitions per USER "
    "(session-scale state, never corpus-scale); the matrix is "
    "type²-cardinality and the row-total join broadcasts",
)
def x163_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = T(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    tr = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n_trans"))
    )
    tot = tr.groupBy("from_type").agg(F.sum("n_trans").alias("n_out"))
    return tr.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        portable_round(
            F.col("n_trans").cast("double") / F.col("n_out"), 6
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# x164 — Kaplan-Meier survival over user activity lifetimes
# ---------------------------------------------------------------------------


@probe(
    "x164_kaplan_meier",
    sql="""
        WITH life AS (
            SELECT user_id,
                   max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
                       AS last_d
            FROM events GROUP BY 1
        ),
        horizon AS (SELECT max(last_d) AS maxd FROM life),
        ev AS (
            SELECT last_d AS d,
                   count(*) AS n_end,
                   sum(CASE WHEN last_d < maxd THEN 1 ELSE 0 END) AS n_churn
            FROM life CROSS JOIN horizon GROUP BY last_d, maxd
        ),
        risk AS (
            SELECT d, n_churn,
                   sum(n_end) OVER (ORDER BY d DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS n_risk
            FROM ev
        ),
        lf AS (
            SELECT d, n_churn, n_risk,
                   CAST(floor(ln(CAST(n_risk - n_churn AS DOUBLE) / n_risk)
                              * 1000000000 + 0.5) AS BIGINT) AS lnf_u
            FROM risk
        )
        SELECT CAST(d AS BIGINT) AS day,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(n_churn AS BIGINT) AS n_churn,
               floor(exp(CAST(sum(lnf_u) OVER (ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE) / 1000000000.0) * 1000000 + 0.5) / 1000000
                   AS survival
        FROM lf
    """,
    note="Kaplan-Meier product-limit survival over user activity "
    "lifetimes (churn proxy: a user 'dies' on their last active day; "
    "users still active at the horizon are censored, so the last-day "
    "factor is 1): per-user lifetime agg, per-day death counts, risk "
    "set via reverse cumsum on the calendar-bounded day axis "
    "(bounded_window — declared single partition), and the product "
    "limit as exp(cumsum(ln factor)) with factors quantized to "
    "integer nano-nats BEFORE the cumsum so the survival curve "
    "replays exactly; ln/exp cross-libm ulps are absorbed by the "
    "1e-9-then-1e-6 grain",
)
def x164_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.plans.prefix import bounded_window

    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    life = (
        T(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.max(day).alias("last_d"))
    )
    horizon = life.agg(F.max("last_d").alias("maxd"))
    ev = (
        life.crossJoin(F.broadcast(horizon))
        .groupBy(F.col("last_d").alias("d"))
        .agg(
            F.count("*").alias("n_end"),
            F.sum((F.col("last_d") < F.col("maxd")).cast("bigint")).alias(
                "n_churn"
            ),
        )
    )
    w_risk = bounded_window("d", F.col("d").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = ev.select(
        "d", "n_churn", F.sum("n_end").over(w_risk).alias("n_risk")
    )
    lnf = F.floor(
        F.log(
            (F.col("n_risk") - F.col("n_churn")).cast("double") / F.col("n_risk")
        )
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("bigint")
    lf = risk.select("d", "n_churn", "n_risk", lnf.alias("lnf_u"))
    w_surv = bounded_window("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return lf.select(
        F.col("d").cast("bigint").alias("day"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("n_churn").cast("bigint").alias("n_churn"),
        (
            F.floor(
                F.exp(
                    F.sum("lnf_u").over(w_surv).cast("double") / F.lit(1e9)
                )
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("survival"),
    )


# ---------------------------------------------------------------------------
# x165 — haversine nearest-facility join
# ---------------------------------------------------------------------------


@probe(
    "x165_haversine_nn",
    sql="""
        WITH c AS (
            SELECT c_custkey,
                   CAST((c_custkey * 31) % 320 - 160 AS DOUBLE) + 0.25 AS lon,
                   CAST((c_custkey * 17) % 140 - 70 AS DOUBLE) + 0.25 AS lat
            FROM customer
        ),
        s AS (
            SELECT s_suppkey,
                   CAST((s_suppkey * 37) % 320 - 160 AS DOUBLE) + 0.5 AS lon,
                   CAST((s_suppkey * 53) % 140 - 70 AS DOUBLE) + 0.5 AS lat
            FROM supplier
        ),
        d AS (
            SELECT c_custkey, s_suppkey,
                   floor(2.0 * 6371000.0 * asin(sqrt(
                       pow(sin((s.lat - c.lat) * (pi() / 360.0)), 2)
                       + cos(c.lat * (pi() / 180.0))
                         * cos(s.lat * (pi() / 180.0))
                         * pow(sin((s.lon - c.lon) * (pi() / 360.0)), 2)
                   )) + 0.5) AS dist_m
            FROM c CROSS JOIN s
        ),
        rk AS (
            SELECT c_custkey, s_suppkey, dist_m,
                   row_number() OVER (PARTITION BY c_custkey
                       ORDER BY dist_m, s_suppkey) AS rnk
            FROM d
        )
        SELECT c_custkey, s_suppkey AS nearest_supp,
               CAST(dist_m AS BIGINT) AS dist_m
        FROM rk WHERE rnk = 1
    """,
    note="nearest-facility assignment by great-circle distance: "
    "haversine as pure column math (sin/cos/asin with the identical "
    "IEEE association on both engines; metre rounding absorbs "
    "cross-libm ulps, and the quarter/half-degree offset grids keep "
    "every pairwise distance far from a whole-metre tie). The probe "
    "is the exact broadcast form — customers stream against the "
    "supplier table (facility side is node-scale, x3's shape); at "
    "planetary candidate scale the same distance refines inside "
    "f23's XYZ tile blocking (neighbor-tile candidates only), the "
    "j10 grid-join pattern on the sphere",
)
def x165_haversine_nn(spark: SparkSession, sf: str) -> DataFrame:
    ck = F.col("c_custkey")
    sk = F.col("s_suppkey")
    c = T(spark, sf, "customer").select(
        "c_custkey",
        (((ck * 31) % 320 - 160).cast("double") + 0.25).alias("c_lon"),
        (((ck * 17) % 140 - 70).cast("double") + 0.25).alias("c_lat"),
    )
    s = T(spark, sf, "supplier").select(
        "s_suppkey",
        (((sk * 37) % 320 - 160).cast("double") + 0.5).alias("s_lon"),
        (((sk * 53) % 140 - 70).cast("double") + 0.5).alias("s_lat"),
    )
    import math as _m

    half_rad = F.lit(_m.pi / 360.0)
    deg_rad = F.lit(_m.pi / 180.0)
    hav = (
        F.pow(F.sin((F.col("s_lat") - F.col("c_lat")) * half_rad), 2)
        + F.cos(F.col("c_lat") * deg_rad)
        * F.cos(F.col("s_lat") * deg_rad)
        * F.pow(F.sin((F.col("s_lon") - F.col("c_lon")) * half_rad), 2)
    )
    dist = F.floor(
        F.lit(2.0) * F.lit(6371000.0) * F.asin(F.sqrt(hav)) + F.lit(0.5)
    )
    d = c.crossJoin(F.broadcast(s)).select(
        "c_custkey", "s_suppkey", dist.alias("dist_m")
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_m", "s_suppkey")
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_supp"),
            F.col("dist_m").cast("bigint").alias("dist_m"),
        )
    )


# ---------------------------------------------------------------------------
# x166 — RFM segmentation via distributed exact terciles
# ---------------------------------------------------------------------------


@probe(
    "x166_rfm_segments",
    sql="""
        WITH u AS (
            SELECT user_id,
                   max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
                       AS last_d,
                   count(*) AS freq,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
            FROM events GROUP BY 1
        ),
        t AS (
            SELECT user_id,
                   ntile(3) OVER (ORDER BY last_d, user_id) AS r_t,
                   ntile(3) OVER (ORDER BY freq, user_id) AS f_t,
                   ntile(3) OVER (ORDER BY cents, user_id) AS m_t
            FROM u
        )
        SELECT CAST(r_t AS INT) AS r_t, CAST(f_t AS INT) AS f_t,
               CAST(m_t AS INT) AS m_t,
               count(*) AS n_users
        FROM t GROUP BY 1, 2, 3
    """,
    note="RFM segmentation (recency / frequency / monetary terciles — "
    "the classic customer-value grid): per-user aggregates, then "
    "THREE exact global terciles each computed with the "
    "plans/prefix.py distributed row_number + the closed-form "
    "SQL-standard ntile allocation — no single-partition window for "
    "any of the three rankings (the oracle replays them as plain "
    "ntile windows); integer cents, deterministic user_id tie-breaks",
)
def x166_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.plans.prefix import (
        distributed_row_number,
        ntile_from_rn,
    )

    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    u = (
        T(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.max(day).cast("bigint").alias("last_d"),
            F.count("*").alias("freq"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents"),
        )
    )
    n_df = u.agg(F.count("*").alias("_N"))
    # each tercile ranks the BASE user table (not an accumulating join
    # chain — that nests the rank plans and multiplies exchanges);
    # the three user-scale tercile tables then equi-join once each
    out = u.select("user_id")
    for metric, tcol in (("last_d", "r_t"), ("freq", "f_t"), ("cents", "m_t")):
        rn = distributed_row_number(
            u.select("user_id", metric), (metric, "user_id"), out_col="_rn"
        )
        t = (
            rn.crossJoin(F.broadcast(n_df))
            .select(
                "user_id",
                ntile_from_rn(F.col("_rn"), F.col("_N"), 3)
                .cast("int")
                .alias(tcol),
            )
        )
        out = out.join(t, "user_id")
    return out.groupBy("r_t", "f_t", "m_t").agg(F.count("*").alias("n_users"))


# ---------------------------------------------------------------------------
# x167 — Benford's-law digit test (data-quality / fraud screen)
# ---------------------------------------------------------------------------


@probe(
    "x167_benford_test",
    sql="""
        WITH d AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                                          AS BIGINT) AS VARCHAR), 1, 1)
                        AS BIGINT) AS digit
            FROM orders WHERE o_totalprice > 0
        ),
        obs AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        tot AS (SELECT sum(n) AS total FROM obs)
        SELECT digit, n,
               floor(CAST(n AS DOUBLE) / total * 1000000 + 0.5) / 1000000
                   AS obs_freq,
               floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000 + 0.5)
                   / 1000000 AS benford_p,
               floor(pow(CAST(n AS DOUBLE) / total
                         - ln(1.0 + 1.0 / digit) / ln(10.0), 2)
                     / (ln(1.0 + 1.0 / digit) / ln(10.0))
                     * total * 1000000 + 0.5) / 1000000 AS chi2_term
        FROM obs CROSS JOIN tot
    """,
    note="Benford's-law first-digit test — the data-quality / fraud "
    "screen a pipeline runs before trusting an amounts column: first "
    "significant digit extracted from the INTEGER cents string (no "
    "cross-engine double formatting, no log10 of the value), observed "
    "frequency vs ln(1+1/d)/ln(10), per-digit chi-square contribution "
    "(sum over the 9 rows = the test statistic). One aggregation + a "
    "1-row total broadcast; constant 9-row output",
)
def x167_benford_test(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        T(spark, sf, "orders")
        .where(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("bigint")
                .cast("string"),
                1,
                1,
            )
            .cast("bigint")
            .alias("digit")
        )
    )
    obs = d.groupBy("digit").agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    freq = F.col("n").cast("double") / F.col("total")
    bp = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        portable_round(freq, 6).alias("obs_freq"),
        portable_round(bp, 6).alias("benford_p"),
        (
            F.floor(
                F.pow(freq - bp, F.lit(2.0)) / bp * F.col("total") * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# x168 — Gini coefficient per segment
# ---------------------------------------------------------------------------


@probe(
    "x168_gini_by_group",
    sql="""
        WITH v AS (
            SELECT o_orderpriority AS grp,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                   row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT), o_orderkey) AS i
            FROM orders
        )
        SELECT grp,
               count(*) AS n,
               sum(cents) AS total_cents,
               floor((2.0 * CAST(sum(CAST(i AS DECIMAL(38,0)) * cents)
                                 AS DOUBLE)
                      - (count(*) + 1.0) * sum(cents))
                     / (count(*) * CAST(sum(cents) AS DOUBLE))
                     * 1000000 + 0.5) / 1000000 AS gini
        FROM v GROUP BY grp
    """,
    note="Gini coefficient per segment — the inequality readout behind "
    "mixture-balancing decisions (is one source/priority dominated by "
    "a few huge rows?): rank-weighted formulation G = (2·Σi·x − "
    "(n+1)·Σx)/(n·Σx) with integer-cent values, so both Σ terms are "
    "exact bigints and the only float op is the final division. The "
    "ranking window partitions per GROUP (segment-scale, never "
    "corpus-scale); the same identity runs on a distributed "
    "row_number when a single segment outgrows a partition",
)
def x168_gini_by_group(spark: SparkSession, sf: str) -> DataFrame:
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    v = (
        T(spark, sf, "orders")
        .select(
            F.col("o_orderpriority").alias("grp"),
            cents.alias("cents"),
            "o_orderkey",
        )
        .withColumnRenamed("grp", "o_orderpriority")
        .withColumn("i", F.row_number().over(w).cast("bigint"))
    )
    n = F.count("*")
    sx = F.sum("cents")
    six = F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents"))
    return v.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        n.alias("n"),
        sx.alias("total_cents"),
        (
            F.floor(
                (F.lit(2.0) * six.cast("double") - (n + F.lit(1.0)) * sx)
                / (n * sx.cast("double"))
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# x169 — Pareto concentration report (80/20 analysis)
# ---------------------------------------------------------------------------


@probe(
    "x169_pareto_report",
    sql="""
        WITH cust AS (
            SELECT o_custkey,
                   sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS cents
            FROM orders GROUP BY 1
        ),
        tot AS (SELECT sum(cents) AS total, count(*) AS n_cust FROM cust),
        r AS (
            SELECT o_custkey, cents,
                   sum(cents) OVER (ORDER BY cents DESC, o_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                   row_number() OVER (ORDER BY cents DESC, o_custkey) AS i
            FROM cust
        ),
        flag AS (
            SELECT i, cum, total, n_cust,
                   CASE WHEN cum * 5 <= total * 4 THEN 1 ELSE 0 END
                       AS in_top80
            FROM r CROSS JOIN tot
        )
        SELECT CAST(sum(in_top80) + 1 AS BIGINT) AS n_top80,
               min(n_cust) AS n_cust,
               floor(CAST(sum(in_top80) + 1 AS DOUBLE) / min(n_cust)
                     * 1000000 + 0.5) / 1000000 AS frac_top80
        FROM flag
    """,
    note="Pareto 80/20 concentration: how many customers carry 80% of "
    "revenue — the skew readout that decides salting and mixture caps "
    "before a key becomes a hot partition. Integer cents; the 80% "
    "boundary test is the cross-multiplied integer comparison "
    "cum·5 <= total·4 (no float threshold), +1 counts the boundary "
    "customer that crosses 80%. The running sum is the "
    "plans/prefix.py distributed cumsum (range-bucketed on the "
    "negated value with the custkey tie-break) — no single-partition "
    "window even though the input is customer-cardinality, so the "
    "same plan survives billion-key amounts columns",
)
def x169_pareto_report(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.plans.prefix import distributed_cumsum

    cust = (
        T(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents")
        )
    )
    tot = cust.agg(
        F.sum("cents").alias("total"), F.count("*").alias("n_cust")
    )
    r = distributed_cumsum(
        cust.withColumn("_neg", -F.col("cents")),
        "_neg",
        "cents",
        out_col="cum",
        tie_cols=("o_custkey",),
    ).drop("_neg")
    flag = r.crossJoin(F.broadcast(tot)).select(
        (
            (F.col("cum") * 5 <= F.col("total") * 4).cast("bigint")
        ).alias("in_top80"),
        "n_cust",
    )
    return flag.agg(
        (F.sum("in_top80") + 1).cast("bigint").alias("n_top80"),
        F.min("n_cust").alias("n_cust"),
        portable_round(
            (F.sum("in_top80") + F.lit(1)).cast("double") / F.min("n_cust"), 6
        ).alias("frac_top80"),
    )


# ---------------------------------------------------------------------------
# x170 — dedup clusters via large-star/small-star components (x21's twin)
# ---------------------------------------------------------------------------

from flytemosaic_spark.probes.extensions import _SHINGLE_SQL  # noqa: E402


@probe(
    "x170_dedup_clusters_star",
    sql=_SHINGLE_SQL.replace("WITH", "WITH RECURSIVE", 1)
    + """,
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_inter
        FROM ex a JOIN ex b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ),
    good AS (
        SELECT id_a, id_b FROM pairs
        WHERE round(n_inter / (n_a + n_b - n_inter), 4) >= 0.5
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM good
        UNION ALL SELECT id_b, id_a FROM good
    ),
    reach(node, lbl) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node)
    SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
    note="x21's dedup clustering through the O(log n)-round "
    "large-star/small-star rewriting (operators/dedup.py:"
    "connected_components_star, Kiveris et al.) instead of min-label "
    "propagation — identical oracle, identical clusters; the star "
    "alternation shortcuts arbitrary component diameters where "
    "min-label needs O(diameter) rounds (and now fails loudly past "
    "its budget). Union-find equivalence on chains/cycles/random "
    "graphs in tests/test_dedup.py",
)
def x170_dedup_clusters_star(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators import dedup as _dedup
    from flytemosaic_spark.operators.dedup import connected_components_star

    docs = T(spark, sf, "documents")
    pairs = _dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components_star(pairs, src="id_a", dst="id_b")
    return docs.select("doc_id").join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select("doc_id", F.coalesce("lbl", "doc_id").alias("cluster"))


# ---------------------------------------------------------------------------
# x171 — point-in-time join against SCD2 validity intervals
# ---------------------------------------------------------------------------


@probe(
    "x171_pit_join",
    sql="""
        WITH m AS (
            SELECT user_id, CAST(ts AS DATE) AS d, min(ts) AS ts0
            FROM events GROUP BY 1, 2
        ),
        st AS (
            SELECT e.user_id, CAST(e.ts AS DATE) AS d,
                   min_by(e.event_type, e.event_id) AS status
            FROM events e JOIN m
              ON e.user_id = m.user_id AND CAST(e.ts AS DATE) = m.d
             AND e.ts = m.ts0
            GROUP BY 1, 2
        ),
        dim AS (
            SELECT user_id, d AS valid_from, status,
                   coalesce(lead(d) OVER (PARTITION BY user_id ORDER BY d),
                            DATE '9999-12-31') AS valid_to
            FROM st
        ),
        facts AS (
            SELECT event_id, user_id, CAST(ts AS DATE) AS d, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT f.event_id, f.user_id,
               dim.status AS status_at_purchase,
               dim.valid_from AS status_since
        FROM facts f JOIN dim
          ON f.user_id = dim.user_id
         AND f.d >= dim.valid_from AND f.d < dim.valid_to
    """,
    note="point-in-time join against SCD2 validity intervals — the "
    "warehouse-correctness staple (no future leakage: each fact sees "
    "the dimension version in effect ON ITS OWN date): the dimension "
    "is each user's daily status (first event of the day: min(ts) per "
    "(user, day) then min event_id among exact-ts ties — a two-stage "
    "arg-min that replays on engines without struct-keyed min_by), "
    "intervals close via lead() "
    "per user (x30's SCD2 shape), and the PIT predicate is an "
    "equi-join on the user plus the [valid_from, valid_to) range "
    "check — Spark plans the equi-key join and filters the interval "
    "residual, so the shuffle is keyed, never a range cross join; "
    "all windows partition per user",
)
def x171_pit_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    base = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        "event_type",
        "ts",
        "event_id",
    )
    m = base.groupBy("user_id", "d").agg(F.min("ts").alias("ts0"))
    st = (
        base.join(m, ["user_id", "d"])
        .where(F.col("ts") == F.col("ts0"))
        .groupBy("user_id", "d")
        .agg(F.min_by("event_type", "event_id").alias("status"))
    )
    w = Window.partitionBy("user_id").orderBy("d")
    dim = st.select(
        "user_id",
        F.col("d").alias("valid_from"),
        "status",
        F.coalesce(
            F.lead("d").over(w), F.lit("9999-12-31").cast("date")
        ).alias("valid_to"),
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").cast("date").alias("d")
    )
    return (
        facts.join(dim, "user_id")
        .where(
            (F.col("d") >= F.col("valid_from")) & (F.col("d") < F.col("valid_to"))
        )
        .select(
            "event_id",
            "user_id",
            F.col("status").alias("status_at_purchase"),
            F.col("valid_from").alias("status_since"),
        )
    )
