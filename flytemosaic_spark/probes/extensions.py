"""Extension probes (SURVEY §2.11 X1-X5 + training-data-pipeline ops):
dedup families, similarity search, text analysis, event windowing,
multimodal binary columns.

Oracle SQL mirrors the Spark expression tree exactly (same operation
order, same rounding) so double-precision results hash-match. Probes
whose hash family DuckDB lacks (xxhash64 minhash/simhash) or whose
inputs are generated driver-side (numpy LSH hyperplanes) carry no
oracle and are instead property-tested in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.operators import dedup, similarity, text
from flytemosaic_spark.probes.registry import T, probe

_SHINGLE_SQL = """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(w) - 4, 1) + 1),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])
               )) AS shingles
        FROM toks
    )
"""


@probe(
    "x1_exact_dedup",
    sql="""
        SELECT md5(text) AS content_hash, min(doc_id) AS keeper, count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    note="exact dedup via content-hash groupBy (X1)",
)
def x1_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.exact_dedup(T(spark, sf, "documents"))


@probe(
    "x2_ngram_jaccard",
    sql=_SHINGLE_SQL
    + """,
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_inter
        FROM ex a JOIN ex b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, round(n_inter / (n_a + n_b - n_inter), 4) AS jaccard
    FROM pairs
    WHERE round(n_inter / (n_a + n_b - n_inter), 4) >= 0.5
    """,
    note="exact 5-gram Jaccard near-dup pairs via shingle inverted index (X2)",
)
def x2_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(T(spark, sf, "documents"), threshold=0.5)


@probe(
    "x2b_minhash_lsh",
    sql=None,
    note="MinHash+LSH near-dup candidates (X2, scale path); xxhash64 has no "
    "DuckDB equivalent — recall/precision property-tested vs exact Jaccard in tests/",
)
def x2b_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(T(spark, sf, "documents"))


@probe(
    "x2c_simhash",
    sql=None,
    note="64-bit SimHash sketch per doc (X2 family); property-tested in tests/",
)
def x2c_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.simhash(T(spark, sf, "documents"))


@probe(
    "x3_cosine_topk",
    sql="""
        WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings),
        scored AS (
            SELECT q_id, neighbor_id,
                   round(list_cosine_similarity(qv, cv), 4) AS sim
            FROM q CROSS JOIN c WHERE q_id <> neighbor_id
        ),
        ranked AS (
            SELECT q_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY q_id
                       ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT q_id, rank, neighbor_id, sim FROM ranked WHERE rank <= 5
    """,
    note="brute-force cosine top-k similarity search (X3 baseline)",
)
def x3_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = T(spark, sf, "embeddings")
    return similarity.brute_force_topk(
        corpus=emb, queries=emb.where(F.col("vec_id") < 10), k=5
    )


@probe(
    "x3b_lsh_topk",
    sql=None,
    note="random-hyperplane LSH ANN (X3 scale path); recall vs brute force "
    "property-tested in tests/",
)
def x3b_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = T(spark, sf, "embeddings")
    return similarity.lsh_topk(corpus=emb, queries=emb.where(F.col("vec_id") < 10), k=5)


@probe(
    "x3c_ivf_topk",
    sql=None,
    note="IVF-bucketed ANN (X3 scale path); recall property-tested in tests/",
)
def x3c_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = T(spark, sf, "embeddings")
    return similarity.ivf_topk(corpus=emb, queries=emb.where(F.col("vec_id") < 10), k=5)


@probe(
    "x3d_pq_topk",
    sql=None,
    note="product-quantization ANN (X3 compressed-scan path): corpus "
    "compressed 32x to codebook indices, ADC scan, exact re-rank; "
    "recall property-tested in tests/test_similarity.py",
)
def x3d_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = T(spark, sf, "embeddings")
    return similarity.pq_topk(corpus=emb, queries=emb.where(F.col("vec_id") < 10), k=5)


@probe(
    "x3e_ivf_pq_topk",
    sql=None,
    note="IVF-PQ composed ANN (coarse-quantizer list pruning + "
    "PQ-compressed ADC scan within lists + exact re-rank); recall "
    "property-tested in tests/test_similarity.py",
)
def x3e_ivf_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = T(spark, sf, "embeddings")
    return similarity.ivf_pq_topk(
        corpus=emb, queries=emb.where(F.col("vec_id") < 10), k=5
    )


@probe(
    "x4_text_stats",
    sql="""
        SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars
        FROM documents GROUP BY lang
    """,
    note="text corpus stats rollup (X4)",
)
def x4_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@probe(
    "x5_tumbling_window",
    sql="""
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket,
               count(*) AS n, round(sum(value), 2) AS total
        FROM events GROUP BY bucket
    """,
    note="tumbling-window event aggregation (X5); same plan as the streaming "
    "variant in flytemosaic_spark.streaming",
)
def x5_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("bucket"), "n", "total")
    )


@probe(
    "x6_sessionize",
    sql="""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM marked
        )
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM sess GROUP BY user_id, sess_id
    """,
    note="session windows with 30-minute gap (X5 family); Spark session_window "
    "vs gaps-and-islands oracle",
)
def x6_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )


@probe(
    "x7_token_count",
    sql="""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
        FROM documents
    """,
    note="whitespace token counting (text analysis)",
)
def x7_token_count(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "documents").select(
        "doc_id", text.token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )


@probe(
    "x8_lang_id",
    sql="""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
        ),
        hits AS (
            SELECT doc_id,
                   len(list_filter(w, t -> t IN ('the','and','of','a','to','in','is'))) AS h_en,
                   len(list_filter(w, t -> t IN ('le','la','les','et','de','un','est'))) AS h_fr,
                   len(list_filter(w, t -> t IN ('der','die','das','und','ist','ein'))) AS h_de,
                   len(list_filter(w, t -> t IN ('el','la','los','y','de','es','un'))) AS h_es
            FROM toks
        )
        SELECT doc_id,
               CASE WHEN greatest(h_en, h_fr, h_de, h_es) = 0 THEN 'und'
                    WHEN h_en = greatest(h_en, h_fr, h_de, h_es) THEN 'en'
                    WHEN h_fr = greatest(h_en, h_fr, h_de, h_es) THEN 'fr'
                    WHEN h_de = greatest(h_en, h_fr, h_de, h_es) THEN 'de'
                    ELSE 'es' END AS lang_pred
        FROM hits
    """,
    note="heuristic stopword-marker language ID (text analysis)",
)
def x8_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "documents").select(
        "doc_id", text.lang_id(F.col("text")).alias("lang_pred")
    )


@probe(
    "x9_quality_score",
    sql="""
        WITH base AS (
            SELECT doc_id, text,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n,
                   CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
                        ELSE len(list_filter(string_split_regex(trim(text), '\\s+'),
                                 t -> t IN ('the','and','of','a','to','in','is'))) END AS stops
            FROM documents
        )
        SELECT doc_id,
               floor((
                   least(CAST(n AS DOUBLE) / 100.0, 1.0) * 0.5
                   + least((stops / CAST(greatest(n, 1) AS DOUBLE)) * 5.0, 1.0) * 0.3
                   + (1.0 - least(((length(text)
                        - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                        / CAST(greatest(length(text), 1) AS DOUBLE)) * 10.0, 1.0)) * 0.2
               ) * 10000 + 0.5) / 10000.0 AS quality
        FROM base
    """,
    note="composite document quality score (text analysis); floor-based rounding "
    "because Spark's round() uses decimal-string HALF_UP while DuckDB rounds the "
    "binary double — they disagree on exact .5 boundaries",
)
def x9_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    q = text.quality_score(F.col("text"))
    portable_round = F.floor(q * 10000 + F.lit(0.5)).cast("double") / F.lit(10000.0)
    return T(spark, sf, "documents").select("doc_id", portable_round.alias("quality"))


@probe(
    "x10_fingerprint",
    sql=_SHINGLE_SQL
    + """
    SELECT doc_id, list_min(list_transform(shingles, s -> md5(s))) AS fp FROM sh
    """,
    note="document fingerprint: min-md5 over 5-gram shingles (simplified winnowing)",
)
def x10_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "documents")
        .select("doc_id", text.tokens(F.col("text")).alias("toks"))
        .select("doc_id", text.fingerprint_from_tokens(F.col("toks")).alias("fp"))
    )


_X11_CORPUS_SQL = """
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
            FROM embeddings
        ),
        variants AS (
            SELECT vec_id + 1000000000000 AS vec_id,
                   list_transform(range(1, len(embedding) + 1),
                       i -> embedding[i]
                            * (1 + ((i * 37) % 11 - 5) / 100.0))
                       AS embedding
            FROM base WHERE vec_id % 4 = 0
        ),
        corpus AS (
            SELECT * FROM base UNION ALL SELECT * FROM variants
        )
"""

_X11_PAIR_SQL = _X11_CORPUS_SQL + """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.embedding, b.embedding), 4)
                   AS cosine
        FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding, b.embedding), 4)
              >= 0.95
    """


def _x11_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """Planted-near-dup corpus: every 4th vector gets a variant whose
    coordinates are scaled by the rational pattern 1 + ((37i mod 11) −
    5)/100 — cosine(v, v′) ≈ 0.9995, far above the 0.95 cut, with no
    cross-pair anywhere near the boundary (corpus cross-sims top out
    ~0.55). Pure integer/rational arithmetic so Spark and DuckDB build
    bit-identical doubles (no libm trig in the construction)."""
    base = T(spark, sf, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    variants = base.where(F.col("vec_id") % 4 == 0).select(
        (F.col("vec_id") + F.lit(1_000_000_000_000)).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.size("embedding")),
            lambda i: F.try_element_at(F.col("embedding"), i.cast("int"))
            * (F.lit(1.0) + ((i * 37 % 11) - 5) / F.lit(100.0)),
        ).alias("embedding"),
    )
    return base.unionByName(variants)


@probe(
    "x11_embedding_neardup",
    sql=_X11_PAIR_SQL,
    note="embedding-cosine near-dup pairs at t=0.95 over a "
    "planted-variant corpus, DEFAULT ROUTE = sign-LSH candidates -> "
    "exact refine (operators/dedup.py embedding_neardup dispatches on "
    "threshold >= 0.7): 16-plane/12-table signatures admit ~1.5e-5 of "
    "random pairs per table while missing a 0.9995 pair with "
    "p ~ 1e-12, so candidate volume is linear-ish and the 10x sweep "
    "line is near-flat where the exact grid is Omega(N^2) by problem "
    "statement; the oracle is the EXACT all-pairs join, so the gate "
    "itself proves recall 1.0 on testdata (x11b pins the exact plan "
    "on the same oracle)",
)
def x11_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.embedding_neardup(
        _x11_corpus(spark, sf), threshold=0.95, n_planes=16, n_tables=12
    )


@probe(
    "x11b_embedding_neardup_exact",
    sql=_X11_PAIR_SQL,
    note="x11's ORACLE TWIN: the exact block-pair grid on the same "
    "planted-variant corpus and threshold — both probes share one "
    "oracle, so every gate run re-proves the LSH route's pair set is "
    "IDENTICAL to the exact one on testdata; this plan is the "
    "documented fallback for thresholds < 0.7 where sign-LSH cannot "
    "prune soundly",
)
def x11b_embedding_neardup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.embedding_neardup_pairs(_x11_corpus(spark, sf), threshold=0.95)


@probe(
    "x11c_embedding_neardup_lowt",
    sql="""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
    """,
    note="LOW-threshold (t=0.4) embedding near-dup, EXACT via "
    "block-pair decomposition — ids hash into B blocks, the B(B+1)/2 "
    "block-pair grid is the only broadcast (metadata scale), each "
    "cell equi-joins its two blocks, so the N^2/2 sims distribute "
    "with bounded task memory and no full-corpus broadcast; at t=0.4 "
    "sign-agreement is 0.63 vs 0.5 random, NO band config prunes "
    "soundly, so quadratic compute is the problem statement and this "
    "plan makes it distributable (the dispatcher routes here below "
    "t=0.7)",
)
def x11c_embedding_neardup_lowt(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.embedding_neardup(T(spark, sf, "embeddings"), threshold=0.4)


@probe(
    "x13_binary_column",
    sql="SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents",
    note="multimodal binary column plumbing: opaque payload + byte length "
    "(decode itself is a stubbed pandas UDF, see operators/multimodal.py)",
)
def x13_binary_column(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "documents").select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("n_bytes"),
    )


@probe(
    "x12_user_totals",
    sql="""
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 4) AS total,
               max(ts) AS last_ts
        FROM events GROUP BY user_id
    """,
    note="per-entity running rollup — the batch twin of the stateful "
    "streaming operator (streaming/events.py:stateful_user_totals, "
    "applyInPandasWithState); identical results checked in "
    "tests/test_streaming.py",
)
def x12_user_totals(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total"),
            F.max("ts").alias("last_ts"),
        )
    )


@probe(
    "x14_media_decode",
    sql=None,
    note="multimodal decode/feature-extract over mapInPandas (binary in, "
    "typed stats out); deterministic FAKE codec — real codecs are a "
    "clearly-marked seam (operators/multimodal.py). Not SQL-expressible "
    "(binary payload decode); unit-tested vs numpy in tests/.",
)
def x14_media_decode(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import decode_stats, synthesize_media

    media = synthesize_media(spark, n=64)
    return decode_stats(media).orderBy("media_id")


@probe(
    "x15_mosaic_pipeline",
    sql=None,
    note="the reference's flagship workflow end-to-end (SURVEY §3.1): "
    "catalog planning -> fused load+composite+write per (tile, time) -> "
    "chunk-store stats. Golden-tested vs a numpy oracle in tests/; here "
    "the driver smoke-checks it runs and is schema-stable.",
)
def x15_mosaic_pipeline(spark: SparkSession, sf: str) -> DataFrame:
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
        )
    rows = [
        (tid, int(y0), int(x0), len(layout["times"]), layout["n_chunks_written"])
        for tid, (y0, x0) in sorted(layout["origins"].items())
    ]
    return spark.createDataFrame(
        rows, "tile_id string, y0 int, x0 int, n_times int, total_chunks int"
    )


@probe(
    "x16_repetition_stats",
    sql=r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
        ),
        bg AS (
            SELECT doc_id,
                   list_transform(range(1, greatest(len(w) - 1, 1) + 1),
                                  i -> concat_ws(' ', w[i], w[i+1])) AS b
            FROM toks
        ),
        rowstats AS (
            SELECT doc_id,
                   (len(b) - len(list_distinct(b))) / len(b) AS dup_bg
            FROM bg
        ),
        wcc AS (
            SELECT doc_id, unnest(w) AS word FROM toks
        ),
        wc AS (
            SELECT doc_id, word, count(*) AS c FROM wcc GROUP BY 1, 2
        ),
        ws AS (
            SELECT doc_id,
                   max(c) / sum(c) AS top_w,
                   (sum(c) - count(*)) / sum(c) AS dup_w
            FROM wc GROUP BY 1
        )
        SELECT doc_id,
               floor(top_w * 10000.0 + 0.5) / 10000.0 AS top_word_frac,
               floor(dup_w * 10000.0 + 0.5) / 10000.0 AS dup_word_frac,
               floor(dup_bg * 10000.0 + 0.5) / 10000.0 AS dup_bigram_frac,
               (floor(top_w * 10000.0 + 0.5) / 10000.0 <= 0.3
                AND floor(dup_bg * 10000.0 + 0.5) / 10000.0 <= 0.2) AS keep
        FROM ws JOIN rowstats USING (doc_id)
    """,
    note="Gopher-style repetition quality filters: top-word mass, "
    "duplicate-word and duplicate-bigram fractions + keep gate",
)
def x16_repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    return text.repetition_stats(T(spark, sf, "documents"))


@probe(
    "x17_contamination",
    sql=r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(w) - 2, 1) + 1),
                       i -> concat_ws(' ', w[i], w[i+1], w[i+2])
                   )) AS shingles
            FROM toks
        ),
        hold AS (
            SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE doc_id % 97 = 0
        ),
        ex AS (
            SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
            FROM sh WHERE doc_id % 97 <> 0
        )
        SELECT ex.doc_id AS doc_id,
               CAST(ex.n_sh AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN hold.shingle IS NULL THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_contaminated,
               floor((CAST(sum(CASE WHEN hold.shingle IS NULL THEN 0 ELSE 1 END) AS BIGINT)
                      / ex.n_sh) * 10000.0 + 0.5) / 10000.0 AS contaminated_frac
        FROM ex LEFT JOIN hold USING (shingle)
        GROUP BY ex.doc_id, ex.n_sh
    """,
    note="benchmark-contamination scan: 3-gram overlap of each corpus doc "
    "against the holdout set (doc_id % 97 = 0) via broadcast semi-scan",
)
def x17_contamination(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.dedup import contamination_check

    docs = T(spark, sf, "documents")
    return contamination_check(
        corpus=docs.where(F.col("doc_id") % 97 != 0),
        holdout=docs.where(F.col("doc_id") % 97 == 0),
        n=3,
    )


@probe(
    "x18_stratified_sample",
    sql="""
        SELECT doc_id, lang FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
              CASE WHEN lang = 'de' THEN '4000'
                   WHEN lang = 'en' THEN '0ccc'
                   WHEN lang = 'es' THEN '4000'
                   WHEN lang = 'fr' THEN '4000'
                   WHEN lang = 'zh' THEN '4000'
                   ELSE '0000' END
    """,
    note="deterministic stratified downsample (en at 5%, others at 25%) "
    "via md5 bucket thresholds — reproducible, shuffle-free, rand()-free",
)
def x18_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sampling import stratified_sample

    rates = {"en": 0.05, "de": 0.25, "es": 0.25, "fr": 0.25, "zh": 0.25}
    return stratified_sample(
        T(spark, sf, "documents"), rates, strata_col="lang", key_col="doc_id"
    ).select("doc_id", "lang")


@probe(
    "x19_split_assign",
    sql="""
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999' THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '3333' THEN 'valid'
                    ELSE 'train' END AS split
        FROM documents
    """,
    note="stable train/valid/test split tags (10/10/80) from md5 bucket "
    "ranges — survives re-partitioning and engine swaps",
)
def x19_split_assign(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sampling import split_assign

    return split_assign(T(spark, sf, "documents"), key_col="doc_id").select(
        "doc_id", "split"
    )


@probe(
    "x20_tfidf_topk",
    sql=r"""
        WITH ex AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
            FROM documents
        ),
        tf AS (SELECT doc_id, word, count(*) AS tf FROM ex GROUP BY 1, 2),
        df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT doc_id, word,
                   floor(tf * ln((n_docs + 1.0) / (df + 1.0)) * 10000.0 + 0.5)
                       / 10000.0 AS tfidf
            FROM tf JOIN df USING (word) CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, word, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, word) AS rank
            FROM scored
        )
        SELECT doc_id, rank, word, tfidf FROM ranked WHERE rank <= 3
    """,
    note="top-3 TF-IDF terms per document (smoothed idf); ranked on the "
    "rounded score so ordering reproduces across engines",
)
def x20_tfidf_topk(spark: SparkSession, sf: str) -> DataFrame:
    return text.tfidf_topk(T(spark, sf, "documents"), k=3)


@probe(
    "x21_dedup_clusters",
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
    note="near-dup pairs → dedup clusters via iterative min-label "
    "connected components (oracle: recursive-CTE reachability closure)",
)
def x21_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.dedup import connected_components

    docs = T(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    return docs.select("doc_id").join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select("doc_id", F.coalesce("lbl", "doc_id").alias("cluster"))


@probe(
    "x22_asof_attribution",
    sql="""
        SELECT p.event_id, p.user_id, p.ts,
               c.event_id AS click_id, c.ts AS click_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    note="backward as-of join (purchase → latest prior click per user) "
    "via union + running last(ignorenulls): ONE shuffle, no range join",
)
def x22_asof_attribution(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.asof import asof_join

    ev = T(spark, sf, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    res = asof_join(purchases, clicks, keys=["user_id"], ts_col="ts")
    return res.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof.event_id").alias("click_id"),
        F.col("asof.ts").alias("click_ts"),
    )


@probe(
    "x23_kmeans_clusters",
    sql=None,
    note="Lloyd's k-means over embeddings (iterative; centroids are "
    "driver-side literals, vectors never shuffle — see operators/"
    "similarity.py). Iterative float means have no portable SQL oracle; "
    "convergence/nearest-centroid properties tested in tests/",
)
def x23_kmeans_clusters(spark: SparkSession, sf: str) -> DataFrame:
    assigned, _ = similarity.kmeans(T(spark, sf, "embeddings"), k=8, max_iter=4)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg("dist"), 2).alias("avg_dist"),
        )
        .orderBy("cluster")
    )


@probe(
    "x24_curation_pipeline",
    sql=r"""
        WITH RECURSIVE
        toks0 AS (
            SELECT doc_id, text, lang, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        bg AS (
            SELECT doc_id, list_transform(range(1, greatest(len(w) - 1, 1) + 1),
                       i -> concat_ws(' ', w[i], w[i+1])) AS b
            FROM toks0
        ),
        rowstats AS (
            SELECT doc_id, (len(b) - len(list_distinct(b))) / len(b) AS dup_bg FROM bg
        ),
        wcc AS (SELECT doc_id, unnest(w) AS word FROM toks0),
        wc AS (SELECT doc_id, word, count(*) AS c FROM wcc GROUP BY 1, 2),
        ws AS (SELECT doc_id, max(c) / sum(c) AS top_w FROM wc GROUP BY 1),
        qual AS (
            SELECT t.doc_id, t.text, t.lang, t.w
            FROM toks0 t JOIN ws USING (doc_id) JOIN rowstats USING (doc_id)
            WHERE floor(top_w * 10000.0 + 0.5) / 10000.0 <= 0.3
              AND floor(dup_bg * 10000.0 + 0.5) / 10000.0 <= 0.2
        ),
        ex_keep AS (SELECT min(doc_id) AS doc_id FROM qual GROUP BY md5(text)),
        q2 AS (SELECT q.* FROM qual q JOIN ex_keep k USING (doc_id)),
        sh AS (
            SELECT doc_id, list_distinct(list_transform(
                       range(1, greatest(len(w) - 4, 1) + 1),
                       i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])
                   )) AS shingles
            FROM q2
        ),
        exx AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_inter
            FROM exx a JOIN exx b USING (shingle)
            WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4
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
        comp AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node),
        surv AS (
            SELECT q2.doc_id, q2.lang
            FROM q2 LEFT JOIN comp c ON c.node = q2.doc_id
            WHERE coalesce(c.cluster, q2.doc_id) = q2.doc_id
        )
        SELECT doc_id, lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999' THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '3333' THEN 'valid'
                    ELSE 'train' END AS split
        FROM surv
    """,
    note="end-to-end curation: repetition quality gate → exact-dedup "
    "keeper → near-dup component keeper → split tags, one composed "
    "operator vs one composed oracle",
)
def x24_curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.curation import curate

    return curate(T(spark, sf, "documents")).select("doc_id", "lang", "split")


@probe(
    "x7b_subword_tokens",
    sql=r"""
        SELECT doc_id,
               length(regexp_extract_all(text,
                 '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
               )) AS n_subword
        FROM documents
    """,
    note="BPE-ish pre-tokenizer token count (GPT-2 pattern, no lookahead "
    "so Java regex and RE2 agree) — the cheap LLM-token-count proxy",
)
def x7b_subword_tokens(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import subword_token_count

    return T(spark, sf, "documents").select(
        "doc_id", subword_token_count(F.col("text")).cast("bigint").alias("n_subword")
    )


# ---------------------------------------------------------------------------
# Portable hash-family dedup variants (EXACT-oracle twins of x2b/x2c)
# ---------------------------------------------------------------------------

@probe(
    "x2d_minhash_lsh_md5",
    sql=_SHINGLE_SQL
    + """,
    ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    m AS (
        SELECT doc_id, seed, min(md5(concat(seed, ':', shingle))) AS mh
        FROM ex CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) seeds
        GROUP BY doc_id, seed
    ),
    sig AS (SELECT doc_id, list(mh ORDER BY seed) AS s FROM m GROUP BY doc_id),
    banded AS (
        SELECT doc_id, s, b AS band,
               md5(array_to_string(list_slice(s, b * 4 + 1, b * 4 + 4), '|')) AS bucket
        FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bands
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b, a.s AS sa, c.s AS sb
        FROM banded a JOIN banded c USING (band, bucket)
        WHERE a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           round(len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0, 4)
               AS est_jaccard
    FROM cand
    """,
    note="banded MinHash LSH over the md5 hash family — same plan shape "
    "as x2b but every stage (signatures, buckets, candidate pairs, "
    "estimate) is replayed bit-for-bit by the oracle; x2b's xxhash64 "
    "family stays the single-engine fast path",
)
def x2d_minhash_lsh_md5(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.minhash_lsh_pairs_md5(T(spark, sf, "documents"))


def _simhash_md5_oracle() -> str:
    digits = ", ".join(
        f"instr('0123456789abcdef', substr(h, {j + 1}, 1)) - 1 AS d{j}"
        for j in range(16)
    )
    sums = ", ".join(
        f"sum(CASE WHEN (d{i // 4} >> {i % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS c{i}"
        for i in range(64)
    )
    nibbles = ", ".join(
        "("
        + " + ".join(f"CASE WHEN c{4 * j + b} > 0 THEN {1 << b} ELSE 0 END" for b in range(4))
        + f") AS n{j}"
        for j in range(16)
    )
    sketch = " || ".join(f"substr('0123456789abcdef', n{j} + 1, 1)" for j in range(16))
    return f"""
        WITH toks AS (
            SELECT doc_id AS id,
                   unnest(string_split_regex(trim(text), '\\s+')) AS tok
            FROM documents
        ),
        hashed AS (SELECT id, md5(tok) AS h FROM toks),
        digits AS (SELECT id, {digits} FROM hashed),
        sums AS (SELECT id, {sums} FROM digits GROUP BY id),
        nibbles AS (SELECT id, {nibbles} FROM sums)
        SELECT id, {sketch} AS simhash_hex FROM nibbles
    """


@probe(
    "x2e_simhash_md5",
    sql=_simhash_md5_oracle(),
    note="64-bit SimHash over the md5 hash family, emitted as hex so the "
    "bit-63 signedness never leaves the engine — oracle replays token "
    "bits, ±1 counters, and nibble assembly exactly; x2c's xxhash64 "
    "family stays the single-engine fast path",
)
def x2e_simhash_md5(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.simhash_md5(T(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# Training-dataloader surface: packing, corpus stats, scrubbing, sketches
# ---------------------------------------------------------------------------

@probe(
    "x25_sequence_pack",
    sql=r"""
        WITH toks AS (
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 8
                       AS bucket,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, bucket, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id)
                       AS cum_incl
            FROM toks
        )
        SELECT doc_id, bucket, n_tokens,
               CAST(floor((cum_incl - n_tokens) / 256.0) AS BIGINT) AS start_pack,
               CAST(floor((cum_incl - 1) / 256.0) AS BIGINT) AS end_pack,
               (cum_incl - n_tokens) % 256 AS pack_offset
        FROM cum
    """,
    note="concat-then-chunk sequence packing into 256-token windows over "
    "8 md5 buckets — integer window math, one shuffle on the bucket key; "
    "the no-straddle first-fit variant is property-tested in "
    "tests/test_packing.py",
)
def x25_sequence_pack(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.packing import pack_sequences

    out = pack_sequences(T(spark, sf, "documents"), budget=256, n_buckets=8)
    return out.withColumn("bucket", F.col("bucket").cast("bigint"))


@probe(
    "x26_ngram_freq",
    sql=r"""
        WITH toks AS (
            SELECT string_split_regex(trim(text), '\s+') AS w FROM documents
        ),
        g AS (
            SELECT unnest(list_transform(
                       range(1, greatest(len(w) - 1, 1) + 1),
                       i -> concat_ws(' ', w[i], w[i+1])
                   )) AS gram
            FROM toks
        )
        SELECT gram, count(*) AS n_occurrences
        FROM g GROUP BY gram
        ORDER BY n_occurrences DESC, gram
        LIMIT 100
    """,
    note="corpus-level top-100 bigram heavy hitters — map-side partial "
    "counts, global top-k via TakeOrderedAndProject (no global sort)",
)
def x26_ngram_freq(spark: SparkSession, sf: str) -> DataFrame:
    return text.ngram_freq(T(spark, sf, "documents"), n=2, k=100)


@probe(
    "x27_pattern_scrub",
    sql=r"""
        SELECT event_id,
               len(regexp_extract_all(props, '[0-9]+')) AS n_redacted,
               regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed
        FROM events
    """,
    note="regex scrubbing pass (numbers -> <NUM>) with per-row redaction "
    "counts — per-row JVM regex, RE2-compatible pattern so any engine "
    "reproduces the scrub",
)
def x27_pattern_scrub(spark: SparkSession, sf: str) -> DataFrame:
    out = text.pattern_scrub(T(spark, sf, "events"), "props")
    return out.select(
        "event_id", F.col("n_redacted").cast("bigint").alias("n_redacted"), "scrubbed"
    )


@probe(
    "x28_kmv_distinct",
    sql=r"""
        WITH d AS (
            SELECT DISTINCT l_suppkey,
                   ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM lineitem
        ),
        mins AS (
            SELECT l_suppkey, list_slice(list_sort(list(h)), 1, 64) AS ms,
                   count(*) AS nd
            FROM d GROUP BY l_suppkey
        )
        SELECT l_suppkey,
               CAST(least(nd, 64) AS BIGINT) AS n_exact_capped,
               floor((CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
                           ELSE (63.0 * power(16.0, 15)) / (ms[64] + 1) END)
                     * 10000.0 + 0.5) / 10000.0 AS kmv_estimate
        FROM mins
    """,
    note="engine-portable KMV distinct sketch (k=64): estimate "
    "(k-1)/h_(k), exact below k — unlike HLL++ the estimate itself "
    "reproduces across engines, so sketches can be audited and merged "
    "outside Spark; error-vs-exact bound tested in tests/test_sketch.py",
)
def x28_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sketch import kmv_distinct

    return kmv_distinct(T(spark, sf, "lineitem"), "l_partkey", ["l_suppkey"], k=64)


@probe(
    "x29_click_attribution",
    sql="""
        WITH c AS (
            SELECT user_id, ts AS click_ts, event_id AS click_id
            FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
                   value AS purchase_value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.user_id, purchase_id, purchase_ts, click_id, click_ts,
               purchase_value
        FROM p JOIN c ON p.user_id = c.user_id
            AND c.click_ts <= p.purchase_ts
            AND c.click_ts >= p.purchase_ts - INTERVAL 12 HOURS
    """,
    note="purchase-to-click attribution interval join — the batch twin "
    "of streaming/events.py attribute_purchases (stream-stream join "
    "with watermark-bounded state); stream-vs-batch equality in "
    "test_streaming.py",
)
def x29_click_attribution(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.streaming.events import attribute_purchases

    return attribute_purchases(T(spark, sf, "events"))
