"""Round-2 continuation probes: cross-split leakage, weighted
sampling, PageRank, feature scaling, winsorization, BM25 retrieval.

Each pairs a Spark DataFrame builder with a bit-exact DuckDB oracle
(see probes/__init__ docstring for the comparison contract). Float
literals that DuckDB would otherwise parse as DECIMAL are CAST to
DOUBLE in the oracles so both engines do the same IEEE arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.probes.extensions import _SHINGLE_SQL
from flytemosaic_spark.probes.registry import T, probe

# split_label()'s default thresholds as DuckDB CASE text (test 10% /
# valid 10% / train rest; hex thresholds from sampling.rate_threshold)
_SPLIT_CASE = """CASE WHEN substr(md5(CAST({c} AS VARCHAR)), 1, 4) < '1999'
                     THEN 'test'
                WHEN substr(md5(CAST({c} AS VARCHAR)), 1, 4) < '3333'
                     THEN 'valid'
                ELSE 'train' END"""


@probe(
    "x72_split_leakage",
    sql=_SHINGLE_SQL
    + """,
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_inter
        FROM ex a JOIN ex b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ),
    lk AS (
        SELECT id_a, id_b,
               round(n_inter / (n_a + n_b - n_inter), 4) AS jaccard,
               """
    + _SPLIT_CASE.format(c="id_a")
    + """ AS split_a,
               """
    + _SPLIT_CASE.format(c="id_b")
    + """ AS split_b
        FROM pairs
        WHERE round(n_inter / (n_a + n_b - n_inter), 4) >= 0.5
    )
    SELECT id_a, id_b, jaccard, split_a, split_b
    FROM lk WHERE split_a <> split_b
    """,
    note="cross-split leakage audit: near-dup pairs (x2's exact "
    "5-gram Jaccard) whose members landed in DIFFERENT train/valid/"
    "test splits — the eval-contamination x19's doc-level hashing "
    "cannot see; the split label is a pure hash expression applied to "
    "both pair sides, so no join against an assignment table",
)
def x72_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators import dedup
    from flytemosaic_spark.operators.sampling import split_label

    pairs = dedup.ngram_jaccard_pairs(T(spark, sf, "documents"), threshold=0.5)
    return pairs.select(
        "id_a",
        "id_b",
        "jaccard",
        split_label(F.col("id_a")).alias("split_a"),
        split_label(F.col("id_b")).alias("split_b"),
    ).where(F.col("split_a") != F.col("split_b"))


@probe(
    "x73_weighted_sample",
    sql="""
        SELECT doc_id, n_chars,
               floor(least(n_chars / CAST(2000.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
                     * 10000.0 + 0.5) / 10000.0 AS keep_p
        FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                  / CAST(65536.0 AS DOUBLE)
              < least(n_chars / CAST(2000.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
    """,
    note="deterministic weighted Bernoulli sampling (keep probability "
    "proportional to document length, capped at 1): the md5-uniform "
    "draw depends only on the key, so the sample reproduces under "
    "retry / re-partition / engine swap, unlike rand() < w; a pure "
    "filter Catalyst pushes toward the scan — no shuffle at any scale",
)
def x73_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sampling import weighted_sample
    from flytemosaic_spark.operators.text import portable_round

    w = F.col("n_chars") / F.lit(2000.0)
    kept = weighted_sample(T(spark, sf, "documents"), "doc_id", w)
    return kept.select(
        "doc_id",
        "n_chars",
        portable_round(F.least(w, F.lit(1.0))).alias("keep_p"),
    )


# one PageRank iteration as SQL text (used 3x, unrolled, in the oracle)
_PR_ITER = """
    SELECT e.dst AS node,
           floor(((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n.n_nodes
                  + CAST(0.85 AS DOUBLE) * sum({prev}.pr / e.out_deg))
                 * 1e10 + 0.5) / 1e10 AS pr
    FROM e JOIN {prev} ON e.src = {prev}.node CROSS JOIN n
    GROUP BY e.dst, n.n_nodes
"""


@probe(
    "x74_pagerank",
    sql="""
        WITH e0 AS (
            SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_suppkey <> b.l_suppkey
        ),
        deg AS (SELECT src, count(*) AS out_deg FROM e0 GROUP BY src),
        e AS (SELECT e0.src, e0.dst, deg.out_deg FROM e0 JOIN deg USING (src)),
        n AS (SELECT count(*) AS n_nodes FROM deg),
        r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / n.n_nodes AS pr
               FROM deg CROSS JOIN n),
        r1 AS ("""
    + _PR_ITER.format(prev="r0")
    + """),
        r2 AS ("""
    + _PR_ITER.format(prev="r1")
    + """),
        r3 AS ("""
    + _PR_ITER.format(prev="r2")
    + """)
        SELECT node AS suppkey, pr AS pagerank FROM r3
    """,
    note="PageRank (damping 0.85, 3 iterations) over the supplier "
    "co-occurrence graph (suppliers sharing an order, symmetric so no "
    "dangling mass): iterative weighted propagation — each round one "
    "shuffle join on src + one hash-agg on dst, rank state node-scale; "
    "per-iteration 1e-10 half-up rounding makes the fixpoint "
    "reproducible across engines (oracle unrolls the same 3 rounds)",
)
def x74_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.graph import grouped_pairs, pagerank

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    # pagerank DISTINCTs its edges, so the set-per-order symmetric
    # emission (each unordered co-occurrence once per order, both
    # directions from one evaluation) yields the identical edge set
    # the != self-join fed it — after ONE exchange instead of two
    # (r10, the x104 pair-generation recipe)
    edges = grouped_pairs(
        li, "l_orderkey", "l_suppkey", distinct=True, symmetric=True
    ).select(F.col("u").alias("src"), F.col("v").alias("dst"))
    ranks = pagerank(edges, iterations=3, damping=0.85)
    return ranks.select(F.col("node").alias("suppkey"), "pagerank")


@probe(
    "x75_feature_scale",
    sql="""
        WITH ex AS (
            SELECT vec_id, u.i AS dim, u.v AS val FROM (
                SELECT vec_id,
                       unnest(list_transform(range(1, len(embedding) + 1),
                           i -> {'i': i, 'v': CAST(embedding[i] AS DOUBLE)}))
                           AS u
                FROM embeddings)
        ),
        m AS (
            SELECT dim,
                   floor(avg(val) * 1e6 + 0.5) / 1e6 AS mu,
                   floor(stddev_pop(val) * 1e6 + 0.5) / 1e6 AS sigma
            FROM ex GROUP BY dim
        )
        SELECT ex.vec_id, ex.dim,
               floor((val - mu) / sigma * 10000.0 + 0.5) / 10000.0 AS zval
        FROM ex JOIN m USING (dim)
    """,
    note="per-dimension standard scaling of the embedding column "
    "(z = (x-mu_d)/sigma_d, long form): the moment table is "
    "dimension-cardinality regardless of corpus size and broadcasts "
    "back — never a window partitioned by dim, which would funnel the "
    "corpus through |dims| partitions; moments rounded at 1e-6 for "
    "cross-engine reproducibility",
)
def x75_feature_scale(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.similarity import standard_scale_long

    out = standard_scale_long(T(spark, sf, "embeddings"))
    return out.select("vec_id", F.col("dim").cast("bigint").alias("dim"), "zval")


@probe(
    "x76_winsorize",
    sql="""
        WITH q AS (
            SELECT event_type,
                   quantile_cont(value, 0.05) AS q_lo,
                   quantile_cont(value, 0.95) AS q_hi
            FROM events GROUP BY event_type
        )
        SELECT event_id, e.event_type,
               floor(least(greatest(e.value, q.q_lo), q.q_hi) * 10000.0 + 0.5)
                   / 10000.0 AS clipped
        FROM events e JOIN q USING (event_type)
    """,
    note="winsorization (clip to per-group p05/p95): the exact "
    "interpolated-percentile table is group-cardinality and broadcast "
    "back onto the fact rows — no re-shuffle of the fact table, no "
    "per-group window straggler; swap percentile_approx in at extreme "
    "group cardinality, plan unchanged",
)
def x76_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.quality import winsorize
    from flytemosaic_spark.operators.text import portable_round

    out = winsorize(T(spark, sf, "events"), "value", ["event_type"])
    return out.select(
        "event_id",
        "event_type",
        portable_round(F.col("_clipped")).alias("clipped"),
    )


@probe(
    "x77_bm25",
    sql=r"""
        WITH ex AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
            FROM documents
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM ex GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs,
                         floor(avg(dl) * 1e6 + 0.5) / 1e6 AS avgdl FROM dl),
        tf AS (SELECT doc_id, word, count(*) AS tf FROM ex
               WHERE word IN ('hash', 'merge', 'scan') GROUP BY doc_id, word),
        dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word)
        SELECT tf.doc_id,
               count(*) AS n_terms_hit,
               floor(sum(
                   ln(CAST(1.0 AS DOUBLE)
                      + (n_docs - df + CAST(0.5 AS DOUBLE))
                        / (df + CAST(0.5 AS DOUBLE)))
                   * tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
                     / (tf + CAST(1.2 AS DOUBLE)
                        * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                           + CAST(0.75 AS DOUBLE) * dl / avgdl))
               ) * 10000.0 + 0.5) / 10000.0 AS bm25
        FROM tf JOIN dfreq USING (word) JOIN dl USING (doc_id)
             CROSS JOIN stats
        GROUP BY tf.doc_id
    """,
    note="Okapi BM25 relevance against a query-term bag (tf "
    "saturation + length normalization, the retrieval scorer x20's "
    "raw TF-IDF lacks): one exploded-token pass feeds dl/tf/df; df "
    "and the (N, avgdl) scalar row are broadcast; the IN filter "
    "prunes the tf aggregate to query terms before its shuffle",
)
def x77_bm25(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import bm25_scores

    return bm25_scores(
        T(spark, sf, "documents"), terms=["hash", "merge", "scan"]
    )


@probe(
    "x78_source_overlap",
    sql=r"""
        WITH toks AS (
            SELECT source, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        sh AS (
            SELECT source,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(w) - 4, 1) + 1),
                       i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])
                   ))) AS shingle
            FROM toks
        ),
        ex AS (SELECT DISTINCT source, shingle FROM sh),
        sizes AS (SELECT source, count(*) AS n_sh FROM ex GROUP BY source),
        inter AS (
            SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
            FROM ex a JOIN ex b USING (shingle)
            WHERE a.source < b.source
            GROUP BY 1, 2
        )
        SELECT src_a, src_b, n_inter,
               floor(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)
                     * 10000.0 + 0.5) / 10000.0 AS jaccard
        FROM inter
        JOIN sizes sa ON sa.source = src_a
        JOIN sizes sb ON sb.source = src_b
    """,
    note="corpus-level overlap between sources (Jaccard of distinct "
    "5-gram shingle sets per source pair): the which-feeds-duplicate "
    "signal that decides whether two crawl snapshots should even be "
    "co-ingested; same inverted-index shape as x2 but aggregated to "
    "source pairs, so the output is |sources|^2 no matter the corpus",
)
def x78_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round, shingles_from_tokens, tokens

    docs = T(spark, sf, "documents")
    ex = (
        docs.select(
            "source", tokens(F.col("text")).alias("toks")
        )
        .select("source", F.explode(shingles_from_tokens(F.col("toks"), 5)).alias("shingle"))
        .distinct()
    )
    sizes = ex.groupBy("source").agg(F.count("*").alias("n_sh"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n_sh").alias("_na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n_sh").alias("_nb"))
    jac = F.col("n_inter") / (F.col("_na") + F.col("_nb") - F.col("n_inter")).cast(
        "double"
    )
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", "n_inter", portable_round(jac).alias("jaccard")
        )
    )


@probe(
    "x79_dup_rate_by_source",
    sql="""
        SELECT source, count(*) AS n_docs,
               count(DISTINCT md5(text)) AS n_unique,
               floor((CAST(1.0 AS DOUBLE)
                      - count(DISTINCT md5(text)) / CAST(count(*) AS DOUBLE))
                     * 10000.0 + 0.5) / 10000.0 AS dup_rate
        FROM documents GROUP BY source
    """,
    note="per-source duplication-rate report (x1's exact dedup rolled "
    "up to the feed level): one hash-distinct aggregate per source — "
    "the ingest-quality dashboard number that decides which feed gets "
    "dedup budget first",
)
def x79_dup_rate_by_source(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    agg = (
        T(spark, sf, "documents")
        .select("source", F.md5("text").alias("_h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("_h").alias("n_unique"),
        )
    )
    rate = F.lit(1.0) - F.col("n_unique") / F.col("n_docs").cast("double")
    return agg.select(
        "source", "n_docs", "n_unique", portable_round(rate).alias("dup_rate")
    )


@probe(
    "x80_perplexity_buckets",
    sql=r"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
                AS word
            FROM documents
        ),
        freq AS (SELECT word, count(*) AS c FROM toks GROUP BY word),
        tot AS (SELECT sum(c) AS n FROM freq),
        lp AS (
            SELECT t.doc_id,
                   floor(avg(ln(f.c / tot.n)) * 10000.0 + 0.5) / 10000.0
                       AS avg_logprob
            FROM toks t JOIN freq f USING (word) CROSS JOIN tot
            GROUP BY t.doc_id
        ),
        thr AS (
            SELECT quantile_cont(avg_logprob, CAST(0.67 AS DOUBLE)) AS p67,
                   quantile_cont(avg_logprob, CAST(0.33 AS DOUBLE)) AS p33
            FROM lp
        )
        SELECT doc_id, avg_logprob,
               CASE WHEN avg_logprob >= p67 THEN 'head'
                    WHEN avg_logprob >= p33 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM lp CROSS JOIN thr
    """,
    note="CCNet-style perplexity bucketing: the unigram-LM score (x45) "
    "cut at its corpus terciles into head/middle/tail — the standard "
    "quality-tiering that decides which third of a crawl gets "
    "sampled hardest; thresholds are one percentile aggregate "
    "(2 scalars) broadcast back, never a global ntile sort",
)
def x80_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round, tokens

    toks = T(spark, sf, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    )
    freq = toks.groupBy("word").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    lp = (
        toks.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            portable_round(F.avg(F.log(F.col("c") / F.col("n")))).alias(
                "avg_logprob"
            )
        )
    )
    thr = lp.agg(
        F.percentile("avg_logprob", F.lit(0.67)).alias("p67"),
        F.percentile("avg_logprob", F.lit(0.33)).alias("p33"),
    )
    bucket = (
        F.when(F.col("avg_logprob") >= F.col("p67"), "head")
        .when(F.col("avg_logprob") >= F.col("p33"), "middle")
        .otherwise("tail")
    )
    return lp.crossJoin(F.broadcast(thr)).select(
        "doc_id", "avg_logprob", bucket.alias("bucket")
    )


@probe(
    "x81_bloom_antijoin",
    sql="""
        SELECT o_orderkey FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey)
    """,
    note="J4's incremental anti-join under the Bloom-prefilter "
    "physical strategy (operators/bloom.py): definite misses pass a "
    "broadcast bit-array filter shuffle-free, only maybe-present "
    "survivors reach the exact anti-join — same NOT EXISTS oracle as "
    "j4_anti_join because the filter cannot change membership (no "
    "false negatives); the big side's shuffle disappears at 100 TB",
)
def x81_bloom_antijoin(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.bloom import bloom_anti_join

    return bloom_anti_join(
        T(spark, sf, "orders"),
        T(spark, sf, "lineitem"),
        "o_orderkey",
        "l_orderkey",
    ).select("o_orderkey")
