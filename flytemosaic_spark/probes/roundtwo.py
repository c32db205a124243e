"""Round-2 additions: interval algebra, graph analytics beyond
propagation, prefix-filtered set-similarity join, count-min heavy
hitters, rank fusion, and time-throttled dedup.

Each pairs a Spark DataFrame builder with a bit-exact DuckDB oracle
(see probes/__init__ docstring for the comparison contract). Float
literals in oracles are CAST to DOUBLE so both engines do the same
IEEE arithmetic; order-sensitive float results use the shared
``floor(x*10^k + 0.5)/10^k`` portable rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flytemosaic_spark.probes.curation import _SPLIT_CASE
from flytemosaic_spark.probes.extensions import _SHINGLE_SQL
from flytemosaic_spark.probes.registry import T, probe


@probe(
    "x82_interval_merge",
    sql="""
        WITH iv AS (
            SELECT user_id, event_id, ts AS s,
                   ts + INTERVAL 12 HOUR AS e
            FROM events
        ),
        fl AS (
            SELECT user_id, event_id, s, e,
                   CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni
            FROM (SELECT user_id, event_id, s, e,
                         max(e) OVER (PARTITION BY user_id
                                      ORDER BY s, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pme
                  FROM iv)
        ),
        isl AS (
            SELECT user_id, s, e,
                   sum(ni) OVER (PARTITION BY user_id ORDER BY s, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS island
            FROM fl
        )
        SELECT user_id, min(s) AS island_start, max(e) AS island_end,
               count(*) AS n_merged
        FROM isl GROUP BY user_id, island
    """,
    note="gaps-and-islands interval merge (operators/intervals.py): "
    "each event opens a 12h activity interval; overlapping intervals "
    "per user collapse into coverage islands. One shuffle on user_id, "
    "one per-partition sort shared by both window passes, O(1) state "
    "per key — no global sort at any size",
)
def x82_interval_merge(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.intervals import merge_intervals

    iv = T(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 12 HOURS")).alias("e"),
    )
    return merge_intervals(
        iv, key_cols=["user_id"], start_col="s", end_col="e",
        tiebreak_col="event_id",
    )


@probe(
    "x83_triangle_count",
    sql="""
        WITH e0 AS (
            SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
                            greatest(a.l_suppkey, b.l_suppkey) AS v
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_suppkey <> b.l_suppkey
        )
        SELECT count(*) AS n_triangles
        FROM e0 ab
        JOIN e0 ac ON ab.u = ac.u AND ab.v < ac.v
        JOIN e0 bc ON bc.u = ab.v AND bc.v = ac.v
    """,
    note="triangle counting over the supplier co-occurrence graph "
    "(operators/graph.py:triangle_count): degree-ordered orientation "
    "bounds every node's wedge fan-out by O(sqrt(E)) — skew-immune "
    "where the oracle's naive u<v<w join is quadratic in the hottest "
    "node's degree; each triangle is counted exactly once",
)
def x83_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.graph import triangle_count

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    # same one-groupBy pair generation as x104 (the self-join shuffled
    # the table twice for pairs a collect_set explode emits after one
    # exchange); _und_deg's least/greatest+distinct canonicalization
    # makes the u<v-once-per-order emission bit-identical to the
    # != self-join's both-direction emission
    grp = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("ps"))
        .where(F.size("ps") >= 2)
    )
    edges = grp.select(F.posexplode("ps").alias("i", "src"), "ps").select(
        "src",
        F.explode(
            F.slice(F.col("ps"), F.col("i") + 2, F.size("ps"))
        ).alias("dst"),
    )
    return triangle_count(edges)


@probe(
    "x84_prefix_setsim_join",
    sql=_SHINGLE_SQL
    + """,
    ex AS (SELECT doc_id, len(shingles) AS L, unnest(shingles) AS s FROM sh),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.L AS la, b.L AS lb, count(*) AS n_inter
        FROM ex a JOIN ex b USING (s)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ),
    j AS (SELECT id_a, id_b,
                 CAST(n_inter AS DOUBLE) / (la + lb - n_inter) AS jc
          FROM pairs)
    SELECT id_a, id_b,
           floor(jc * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM j WHERE jc >= 0.5
    """,
    note="prefix-filtered exact set-similarity self-join "
    "(operators/dedup.py:prefix_jaccard_pairs, PPJoin-style): under a "
    "global rarest-shingle-first order a doc only probes the index "
    "with its first L-ceil(t*L)+1 shingles — lossless for Jaccard>=t, "
    "so candidates collapse versus the oracle's full inverted-index "
    "join (whose hottest bucket is the corpus' most common shingle); "
    "plus the t*La<=Lb<=La/t length prune before verification",
)
def x84_prefix_setsim_join(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.dedup import prefix_jaccard_pairs
    from flytemosaic_spark.operators.text import shingles_from_tokens, tokens

    sets = (
        T(spark, sf, "documents")
        .select("doc_id", tokens(F.col("text")).alias("_toks"))
        .select("doc_id", shingles_from_tokens(F.col("_toks"), 5).alias("sh"))
    )
    return prefix_jaccard_pairs(sets, set_col="sh", id_col="doc_id",
                                threshold=0.5)


@probe(
    "x85_cms_heavy_hitters",
    sql="""
        WITH ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
        st AS (
            SELECT d,
                   substr(md5(concat(d, ':', CAST(user_id AS VARCHAR))), 1, 2)
                       AS slot,
                   count(*) AS cnt
            FROM events CROSS JOIN ds
            GROUP BY 1, 2
        ),
        keys AS (SELECT DISTINCT user_id FROM events),
        est AS (
            SELECT user_id, min(cnt) AS est
            FROM (SELECT k.user_id, ds.d,
                         substr(md5(concat(ds.d, ':',
                             CAST(k.user_id AS VARCHAR))), 1, 2) AS slot
                  FROM keys k CROSS JOIN ds) p
            JOIN st USING (d, slot)
            GROUP BY 1
        ),
        tot AS (SELECT count(*) AS n FROM events)
        SELECT user_id, est FROM est, tot
        WHERE est >= n / 150.0
    """,
    note="count-min-sketch heavy hitters (operators/cms.py): "
    "frequency state is 4x256 counters regardless of key cardinality "
    "— built with one map-side-combined groupBy whose shuffle is "
    "O(partitions x 1024) rows, never data-scale; estimates broadcast "
    "the sketch and take min over depth. Portable md5-slot family so "
    "the oracle replays the whole estimator; heavy = est >= |events|/150",
)
def x85_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.cms import cms_build, cms_estimate

    ev = T(spark, sf, "events")
    state = cms_build(ev, "user_id")
    est = cms_estimate(ev, state, "user_id")
    total = ev.agg(F.count("*").alias("n"))
    return (
        est.crossJoin(F.broadcast(total))
        .where(F.col("est") >= F.col("n") / F.lit(150.0))
        .select("user_id", "est")
    )


@probe(
    "x86_rrf_fusion",
    sql="""
        WITH t AS (
            SELECT doc_id, lang, n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+'))
                   END AS n_tok
            FROM documents
        ),
        r AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n_chars DESC, doc_id) AS ra,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n_tok DESC, doc_id) AS rb
            FROM t
        )
        SELECT doc_id, lang,
               floor((CAST(1.0 AS DOUBLE) / (60 + ra)
                      + CAST(1.0 AS DOUBLE) / (60 + rb)) * 100000000.0
                     + 0.5) / 100000000.0 AS rrf
        FROM r
    """,
    note="reciprocal rank fusion (k=60) of two retrieval orderings "
    "(length rank + token-count rank) per language — the standard "
    "hybrid-search combiner (BM25 x dense retrieval shape). Ranks "
    "partition by lang so no global sort; both ranks share one "
    "shuffle; doc_id tie-break makes the fusion deterministic",
)
def x86_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round, token_count

    t = T(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars", token_count(F.col("text")).alias("n_tok")
    )
    wa = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wb = Window.partitionBy("lang").orderBy(F.desc("n_tok"), F.asc("doc_id"))
    ra, rb = F.row_number().over(wa), F.row_number().over(wb)
    rrf = F.lit(1.0) / (F.lit(60) + ra) + F.lit(1.0) / (F.lit(60) + rb)
    return t.select(
        "doc_id", "lang", portable_round(rrf, 8).alias("rrf")
    )


@probe(
    "x87_throttle_dedup",
    sql="""
        WITH l AS (
            SELECT event_id, user_id, event_type, ts,
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS pts
            FROM events
        )
        SELECT event_id, user_id, event_type, ts
        FROM l
        WHERE pts IS NULL OR ts > pts + INTERVAL 600 SECOND
    """,
    note="time-throttled dedup: keep an event only if the previous "
    "event of the same (user, type) is more than 10 minutes older — "
    "the crawl/telemetry rate-limit dedup that content hashing cannot "
    "express. One lag window per (user_id, event_type) partition, "
    "timestamp comparison only (no epoch casts)",
)
def x87_throttle_dedup(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    pts = F.lag("ts").over(w)
    return (
        T(spark, sf, "events")
        .select("event_id", "user_id", "event_type", "ts", pts.alias("_pts"))
        .where(
            F.col("_pts").isNull()
            | (F.col("ts") > F.col("_pts") + F.expr("INTERVAL 600 SECONDS"))
        )
        .drop("_pts")
    )


@probe(
    "x88_hard_negatives",
    sql="""
        WITH q AS (SELECT vec_id AS q_id, label AS q_label,
                          CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS neighbor_id, label AS n_label,
                     CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings),
        scored AS (
            SELECT q_id, neighbor_id,
                   round(list_cosine_similarity(qv, cv), 4) AS sim
            FROM q CROSS JOIN c WHERE q_label <> n_label
        ),
        ranked AS (
            SELECT q_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY q_id
                       ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT q_id, rank, neighbor_id, sim FROM ranked WHERE rank <= 3
    """,
    note="hard-negative mining for contrastive training: per query the "
    "top-3 most-similar vectors with a DIFFERENT label — the x3 "
    "broadcast brute-force scan with a cross-label predicate pushed "
    "below ranking (cheaper than rank-then-filter: wrong-label rows "
    "never enter the window); at scale the same predicate composes "
    "with the IVF/PQ paths",
)
def x88_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.similarity import hard_negatives

    emb = T(spark, sf, "embeddings")
    return hard_negatives(
        corpus=emb, queries=emb.where(F.col("vec_id") < 20), k=3,
        label_col="label",
    )


@probe(
    "x89_epoch_upsample",
    sql="""
        WITH w AS (
            SELECT doc_id, source,
                   1 + (CAST(substr(source, 4) AS INT) % 3) AS n_epochs
            FROM documents
        )
        SELECT doc_id, source, ep.copy_idx,
               md5(concat(CAST(doc_id AS VARCHAR), '#',
                          CAST(ep.copy_idx AS VARCHAR))) AS shuffle_key
        FROM w, unnest(range(1, n_epochs + 1)) AS ep(copy_idx)
    """,
    note="epoch-aware domain upsampling (data-mixing stage): each doc "
    "is replicated per its source's epoch weight, and every copy gets "
    "an md5 shuffle key so repeats scatter across the training order "
    "instead of sitting adjacent — explode is map-side (no shuffle); "
    "the later sort by shuffle_key is the one range exchange",
)
def x89_epoch_upsample(spark: SparkSession, sf: str) -> DataFrame:
    n_epochs = F.lit(1) + (
        F.substring(F.col("source"), 4, 10).cast("int") % 3
    )
    return (
        T(spark, sf, "documents")
        .select("doc_id", "source", n_epochs.alias("n_epochs"))
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("n_epochs"))).alias("copy_idx"),
        )
        .select(
            "doc_id",
            "source",
            F.col("copy_idx").cast("bigint").alias("copy_idx"),
            F.md5(
                F.concat_ws(
                    "#",
                    F.col("doc_id").cast("string"),
                    F.col("copy_idx").cast("string"),
                )
            ).alias("shuffle_key"),
        )
    )


@probe(
    "x90_group_split",
    sql=_SHINGLE_SQL.replace("WITH", "WITH RECURSIVE", 1)
    + """,
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
           FROM sh),
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
    comp AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node),
    lab AS (
        SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT doc_id, cluster,
           """
    + _SPLIT_CASE.format(c="cluster")
    + """ AS split
    FROM lab
    """,
    note="leakage-safe split assignment: near-dup connected components "
    "first (x21's min-label fixpoint), then the split hash is taken on "
    "the CLUSTER id, so every near-duplicate lands in the same split — "
    "the group-aware form of x19 that closes the x72 leakage channel "
    "by construction. Split stays a pure hash expression: no "
    "shuffle beyond the component computation itself",
)
def x90_group_split(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators import dedup
    from flytemosaic_spark.operators.dedup import connected_components
    from flytemosaic_spark.operators.sampling import split_label

    docs = T(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    lab = (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("lbl", "doc_id").alias("cluster"))
    )
    return lab.withColumn("split", split_label(F.col("cluster")))


@probe(
    "x91_bigram_logprob",
    sql=r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        uni AS (
            SELECT word, count(*) AS c FROM (
                SELECT unnest(w) AS word FROM toks) GROUP BY word
        ),
        tot AS (SELECT sum(c) AS n FROM uni),
        big AS (
            SELECT doc_id, w[i] AS w1, w[i+1] AS w2
            FROM toks, LATERAL (
                SELECT unnest(generate_series(1, greatest(len(w) - 1, 1)))
                    AS i
            ) g
            WHERE i + 1 <= len(w)
        ),
        bic AS (SELECT w1, w2, count(*) AS c_ab FROM big GROUP BY 1, 2)
        SELECT big.doc_id,
               floor(avg(ln(CAST(0.7 AS DOUBLE) * bic.c_ab / a.c
                            + CAST(0.3 AS DOUBLE) * b.c / tot.n))
                     * 10000.0 + 0.5) / 10000.0 AS avg_logprob
        FROM big
        JOIN bic USING (w1, w2)
        JOIN uni a ON a.word = big.w1
        JOIN uni b ON b.word = big.w2
        CROSS JOIN tot
        GROUP BY big.doc_id
    """,
    note="interpolated bigram LM scoring (0.7 * p(w2|w1) + 0.3 * "
    "unigram backoff) — the next step up from x45's unigram perplexity "
    "proxy for quality filtering; corpus n-gram tables are "
    "vocabulary-scale aggregates joined back to the doc-scale bigram "
    "stream (broadcast here; at 100 TB the bigram table outgrows "
    "broadcast and becomes a co-partitioned shuffle join on (w1,w2))",
)
def x91_bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round, tokens

    docs = T(spark, sf, "documents").select(
        "doc_id", tokens(F.col("text")).alias("w")
    )
    uni = (
        docs.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    total = uni.agg(F.sum("c").alias("n"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("w") - 1, F.lit(1))),
        lambda i: F.struct(
            F.element_at("w", i).alias("w1"),
            F.try_element_at("w", i + 1).alias("w2"),
        ),
    )
    big = (
        docs.select("doc_id", F.explode(grams).alias("g"))
        .where(F.col("g.w2").isNotNull())
        .select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    bic = big.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
    a = uni.select(F.col("word").alias("w1"), F.col("c").alias("c_a"))
    b = uni.select(F.col("word").alias("w2"), F.col("c").alias("c_b"))
    p = (
        F.lit(0.7) * F.col("c_ab") / F.col("c_a")
        + F.lit(0.3) * F.col("c_b") / F.col("n")
    )
    return (
        big.join(F.broadcast(bic), ["w1", "w2"])
        .join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(portable_round(F.avg(F.log(p))).alias("avg_logprob"))
    )


@probe(
    "x92_psi_drift",
    sql="""
        WITH ref AS (SELECT value FROM events
                     WHERE ts < TIMESTAMP '2024-01-16'),
        cur AS (SELECT value FROM events
                WHERE ts >= TIMESTAMP '2024-01-16'),
        th AS (SELECT quantile_cont(value, 0.2) AS t1,
                      quantile_cont(value, 0.4) AS t2,
                      quantile_cont(value, 0.6) AS t3,
                      quantile_cont(value, 0.8) AS t4
               FROM ref),
        rb AS (SELECT CASE WHEN value < t1 THEN 0 WHEN value < t2 THEN 1
                           WHEN value < t3 THEN 2 WHEN value < t4 THEN 3
                           ELSE 4 END AS bin, count(*) AS c
               FROM ref CROSS JOIN th GROUP BY 1),
        cb AS (SELECT CASE WHEN value < t1 THEN 0 WHEN value < t2 THEN 1
                           WHEN value < t3 THEN 2 WHEN value < t4 THEN 3
                           ELSE 4 END AS bin, count(*) AS c
               FROM cur CROSS JOIN th GROUP BY 1),
        rt AS (SELECT sum(c) AS n FROM rb),
        ct AS (SELECT sum(c) AS n FROM cb)
        SELECT rb.bin,
               floor(CAST(rb.c AS DOUBLE) / rt.n * 1000000.0 + 0.5)
                   / 1000000.0 AS p_ref,
               floor(CAST(cb.c AS DOUBLE) / ct.n * 1000000.0 + 0.5)
                   / 1000000.0 AS p_cur,
               floor((CAST(rb.c AS DOUBLE) / rt.n
                      - CAST(cb.c AS DOUBLE) / ct.n)
                     * ln((CAST(rb.c AS DOUBLE) / rt.n)
                          / (CAST(cb.c AS DOUBLE) / ct.n))
                     * 1000000.0 + 0.5) / 1000000.0 AS psi_term
        FROM rb JOIN cb USING (bin) CROSS JOIN rt CROSS JOIN ct
    """,
    note="population-stability-index drift report between the first and "
    "second half of the event stream: bin edges are exact quintiles of "
    "the REFERENCE window (Spark percentile == DuckDB quantile_cont, "
    "bit-exact per a16), a 4-scalar broadcast; each side then bins in "
    "one scan. Per-bin PSI terms are emitted (their sum is the PSI) so "
    "no cross-bin float summation order is involved",
)
def x92_psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    ev = T(spark, sf, "events")
    split = F.lit("2024-01-16").cast("timestamp_ntz")
    ref = ev.where(F.col("ts") < split).select("value")
    cur = ev.where(F.col("ts") >= split).select("value")
    th = ref.agg(
        F.percentile("value", F.lit(0.2)).alias("t1"),
        F.percentile("value", F.lit(0.4)).alias("t2"),
        F.percentile("value", F.lit(0.6)).alias("t3"),
        F.percentile("value", F.lit(0.8)).alias("t4"),
    )
    bin_expr = (
        F.when(F.col("value") < F.col("t1"), 0)
        .when(F.col("value") < F.col("t2"), 1)
        .when(F.col("value") < F.col("t3"), 2)
        .when(F.col("value") < F.col("t4"), 3)
        .otherwise(4)
    )

    def binned(side):
        return (
            side.crossJoin(F.broadcast(th))
            .groupBy(bin_expr.alias("bin"))
            .agg(F.count("*").alias("c"))
        )

    rb, cb = binned(ref), binned(cur)
    rt = rb.agg(F.sum("c").alias("rn"))
    ct = cb.agg(F.sum("c").alias("cn"))
    p = F.col("rc").cast("double") / F.col("rn")
    q = F.col("cc").cast("double") / F.col("cn")
    return (
        rb.withColumnRenamed("c", "rc")
        .join(cb.withColumnRenamed("c", "cc"), "bin")
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(ct))
        .select(
            "bin",
            portable_round(p, 6).alias("p_ref"),
            portable_round(q, 6).alias("p_cur"),
            portable_round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )


@probe(
    "x93_mi_features",
    sql="""
        WITH ex AS (
            SELECT vec_id, label, u.d AS dim,
                   CAST(u.v AS DOUBLE) >= 0 AS pos
            FROM (SELECT vec_id, label,
                         unnest(list_transform(range(1, len(embedding) + 1),
                             i -> {'d': i, 'v': embedding[i]})) AS u
                  FROM embeddings)
        ),
        joint AS (SELECT dim, pos, label, count(*) AS c
                  FROM ex GROUP BY 1, 2, 3),
        ms AS (SELECT dim, pos, sum(c) AS cs FROM joint GROUP BY 1, 2),
        ml AS (SELECT label, count(*) AS cl FROM embeddings GROUP BY 1),
        n AS (SELECT count(*) AS n FROM embeddings)
        SELECT joint.dim,
               floor(sum((CAST(c AS DOUBLE) / n.n)
                         * ln(CAST(c AS DOUBLE) * n.n
                              / (CAST(cs AS DOUBLE) * cl)))
                     * 10000.0 + 0.5) / 10000.0 AS mi
        FROM joint
        JOIN ms USING (dim, pos)
        JOIN ml USING (label)
        CROSS JOIN n
        GROUP BY joint.dim
    """,
    note="mutual information between each embedding dimension's sign "
    "and the class label — the feature-selection screen. The explode "
    "is map-side; all downstream state is (dims x 2 x labels) "
    "aggregate cells joined to broadcast marginals, so cost is one "
    "pass over the vectors regardless of corpus size; per-dim MI sums "
    "20 cells (drift ~1e-16, rounded at 1e-4)",
)
def x93_mi_features(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    emb = T(spark, sf, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode("embedding").alias("pos0", "v"),
    ).select(
        "label",
        (F.col("pos0") + 1).alias("dim"),
        (F.col("v").cast("double") >= 0).alias("pos"),
    )
    joint = ex.groupBy("dim", "pos", "label").agg(F.count("*").alias("c"))
    ms = joint.groupBy("dim", "pos").agg(F.sum("c").alias("cs"))
    ml = emb.groupBy("label").agg(F.count("*").alias("cl"))
    n = emb.agg(F.count("*").alias("n"))
    term = (F.col("c").cast("double") / F.col("n")) * F.log(
        F.col("c").cast("double") * F.col("n")
        / (F.col("cs").cast("double") * F.col("cl"))
    )
    return (
        joint.join(F.broadcast(ms), ["dim", "pos"])
        .join(F.broadcast(ml), "label")
        .crossJoin(F.broadcast(n))
        .groupBy("dim")
        .agg(portable_round(F.sum(term)).alias("mi"))
    )


@probe(
    "x94_cdc_apply",
    sql="""
        WITH ranked AS (
            SELECT o_custkey, o_orderstatus, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC,
                                               o_orderkey DESC) AS rn
            FROM orders
        ),
        last_op AS (
            SELECT o_custkey,
                   CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
                   o_totalprice AS val
            FROM ranked WHERE rn = 1
        )
        SELECT c.c_custkey,
               CASE WHEN l.op = 'U' THEN round(l.val, 2)
                    ELSE round(c.c_acctbal, 2) END AS acctbal,
               CASE WHEN l.op IS NULL THEN 'base' ELSE 'cdc' END AS src
        FROM customer c
        LEFT JOIN last_op l ON l.o_custkey = c.c_custkey
        WHERE l.op IS NULL OR l.op <> 'D'
    """,
    note="CDC log application: compact the change log to the last "
    "operation per key (one hash arg-max, no full-log sort), then one "
    "left join applies upserts and tombstones to the base snapshot — "
    "the Debezium/Delta CDF consume pattern. The log is compacted "
    "BEFORE touching the base, so the join is key-cardinality-scale "
    "on the build side no matter how long the log is",
)
def x94_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    last = (
        o.groupBy("o_custkey")
        .agg(
            F.max_by(
                F.struct(
                    F.when(F.col("o_orderstatus") == "F", "D")
                    .otherwise("U")
                    .alias("op"),
                    F.col("o_totalprice").alias("val"),
                ),
                F.struct("o_orderdate", "o_orderkey"),
            ).alias("l")
        )
        .select("o_custkey", F.col("l.op").alias("op"), F.col("l.val").alias("val"))
    )
    c = T(spark, sf, "customer")
    return (
        c.join(last, c.c_custkey == last.o_custkey, "left")
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "c_custkey",
            F.when(F.col("op") == "U", F.round("val", 2))
            .otherwise(F.round("c_acctbal", 2))
            .alias("acctbal"),
            F.when(F.col("op").isNull(), "base").otherwise("cdc").alias("src"),
        )
    )


@probe(
    "x95_priority_sample",
    sql="""
        WITH u AS (
            SELECT o_orderkey, o_totalprice,
                   list_sum(list_transform(range(1, 9),
                       i -> (strpos('0123456789abcdef',
                                substr(md5(CAST(o_orderkey AS VARCHAR)),
                                       i, 1)) - 1)
                            * power(16, 8 - i)))
                       / 4294967296.0 AS u
            FROM orders
        ),
        pr AS (
            SELECT o_orderkey, o_totalprice,
                   floor(ln(u) / o_totalprice * 10000000000.0 + 0.5)
                       / 10000000000.0 AS priority
            FROM u
        )
        SELECT o_orderkey, o_totalprice, priority
        FROM pr ORDER BY priority DESC, o_orderkey LIMIT 100
    """,
    note="weighted sampling WITHOUT replacement (Efraimidis-Spirakis "
    "A-ES): per-row priority ln(u)/w with u a deterministic md5 "
    "uniform — the top-k by priority IS a weighted sample, rand()-free "
    "and so stable under retries. Physically a TakeOrderedAndProject "
    "(per-partition top-k partials, never a global sort); priority is "
    "rounded at 1e-10 with an id tie-break so the k-th boundary is "
    "reproducible across engines",
)
def x95_priority_sample(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    o = T(spark, sf, "orders")
    uval = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    priority = portable_round(F.log(uval) / F.col("o_totalprice"), 10)
    return (
        o.select("o_orderkey", "o_totalprice", priority.alias("priority"))
        .orderBy(F.desc("priority"), F.asc("o_orderkey"))
        .limit(100)
    )


@probe(
    "x96_cov_matrix",
    sql="""
        WITH cells AS (
            SELECT di.i AS di, dj.i AS dj,
                   CAST(embedding[di.i] AS DOUBLE)
                       * CAST(embedding[dj.i] AS DOUBLE) AS vv,
                   CAST(embedding[di.i] AS DOUBLE) AS vi,
                   CAST(embedding[dj.i] AS DOUBLE) AS vj
            FROM embeddings,
                 LATERAL (SELECT unnest(range(1, 65)) AS i) di,
                 LATERAL (SELECT unnest(range(1, 65)) AS i) dj
            WHERE dj.i >= di.i
        )
        SELECT di, dj,
               floor((sum(vv) / count(*)
                      - (sum(vi) / count(*)) * (sum(vj) / count(*)))
                     * 1000000.0 + 0.5) / 1000000.0 AS cov
        FROM cells GROUP BY di, dj
    """,
    note="embedding covariance matrix (PCA / whitening prep): the "
    "upper triangle of the dims x dims Gram-style aggregate in ONE "
    "pass — per row a map-side flatten of dim-pair products, then a "
    "hash-agg whose state is dims^2 cells regardless of corpus size "
    "(the vectors themselves never shuffle); 6-digit portable "
    "rounding absorbs cross-engine summation order",
)
def x96_cov_matrix(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    emb = T(spark, sf, "embeddings")
    n_dim = 64
    idx = F.sequence(F.lit(1), F.lit(n_dim))
    pairs = F.flatten(
        F.transform(
            idx,
            lambda i: F.filter(
                F.transform(
                    idx,
                    lambda j: F.struct(
                        i.alias("di"),
                        j.alias("dj"),
                        (
                            F.element_at("embedding", i).cast("double")
                            * F.element_at("embedding", j).cast("double")
                        ).alias("vv"),
                        F.element_at("embedding", i).cast("double").alias("vi"),
                        F.element_at("embedding", j).cast("double").alias("vj"),
                    ),
                ),
                lambda s: s["dj"] >= s["di"],
            ),
        )
    )
    cells = emb.select(F.explode(pairs).alias("c")).select(
        "c.di", "c.dj", "c.vv", "c.vi", "c.vj"
    )
    cov = (
        F.sum("vv") / F.count("*")
        - (F.sum("vi") / F.count("*")) * (F.sum("vj") / F.count("*"))
    )
    return (
        cells.groupBy("di", "dj")
        .agg(portable_round(cov, 6).alias("cov"))
    )


@probe(
    "x97_multitouch_attribution",
    sql="""
        WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS c_id, user_id, ts AS c_ts
              FROM events WHERE event_type = 'click'),
        pairs AS (
            SELECT p.p_id, c.c_id, p.user_id
            FROM p JOIN c ON p.user_id = c.user_id
            WHERE c.c_ts < p.p_ts
              AND c.c_ts >= p.p_ts - INTERVAL 7 DAY
        )
        SELECT p_id, c_id, user_id,
               floor(CAST(1.0 AS DOUBLE)
                     / count(*) OVER (PARTITION BY p_id)
                     * 1000000.0 + 0.5) / 1000000.0 AS weight
        FROM pairs
    """,
    note="linear multi-touch attribution: every click in the 7 days "
    "before a purchase shares the credit equally (1/n) — completes "
    "the attribution family (x22/x29 last-touch, x67 first-touch). "
    "Physically the time-range theta join becomes an equi-join on "
    "(user, 7-day bucket) with the purchase side probing two adjacent "
    "buckets (j1/j10's binning trick) — fan-out bounded by bucket "
    "occupancy, no per-user cross product; the weight window "
    "partitions by purchase id",
)
def x97_multitouch_attribution(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    ev = T(spark, sf, "events")
    week = 7 * 86400
    epoch = F.col("ts").cast("timestamp").cast("long")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.explode(
            F.array(
                F.floor(epoch / week).cast("long"),
                F.floor(epoch / week).cast("long") - 1,
            )
        ).alias("bucket"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.floor(epoch / week).cast("long").alias("bucket"),
    )
    pairs = (
        p.join(c, (p.user_id == c.c_user) & (p.bucket == c.bucket))
        .where(
            (F.col("c_ts") < F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
        )
        .select("p_id", "c_id", "user_id")
    )
    w = Window.partitionBy("p_id")
    return pairs.select(
        "p_id",
        "c_id",
        "user_id",
        portable_round(F.lit(1.0) / F.count("*").over(w), 6).alias("weight"),
    )


@probe(
    "x98_series_similarity",
    sql="""
        WITH base AS (
            SELECT user_id AS key, CAST(ts AS DATE) AS d, value AS v
            FROM events
        ),
        d0 AS (SELECT min(d) AS d0 FROM base),
        daily AS (
            SELECT key, date_diff('day', d0, d) + 1 AS day, sum(v) AS v
            FROM base CROSS JOIN d0
            WHERE date_diff('day', d0, d) + 1 <= 30
            GROUP BY 1, 2
        ),
        grid AS (
            SELECT k.key, g.day
            FROM (SELECT DISTINCT key FROM daily) k,
                 (SELECT unnest(range(1, 31)) AS day) g
        ),
        dense AS (
            SELECT grid.key, grid.day, coalesce(daily.v, 0.0) AS v
            FROM grid LEFT JOIN daily USING (key, day)
        ),
        mom AS (SELECT key, avg(v) AS mu, stddev_pop(v) AS sd
                FROM dense GROUP BY 1),
        z AS (SELECT dense.key, day, (v - mu) / sd AS z
              FROM dense JOIN mom USING (key) WHERE sd > 0),
        ms AS (SELECT day, avg(v) AS v FROM dense GROUP BY 1),
        qm AS (SELECT avg(v) AS mu, stddev_pop(v) AS sd FROM ms),
        qz AS (SELECT day, (v - mu) / sd AS qz FROM ms CROSS JOIN qm),
        dist AS (
            SELECT key,
                   floor(sum((z - qz) * (z - qz)) * 1000000.0 + 0.5)
                       / 1000000.0 AS dist
            FROM z JOIN qz USING (day) GROUP BY key
        )
        SELECT key AS user_id, dist
        FROM dist ORDER BY dist, key LIMIT 10
    """,
    note="time-series similarity search (operators/timeseries.py — the "
    "EDBT'19 distributed-series-similarity shape from PAPERS.md): "
    "per-user daily series densified to a fixed 30-day grid "
    "(|keys| x |grid| rows, never data-scale), z-normalized via "
    "per-key moment joins, squared-Euclidean distance to the "
    "broadcast z-normalized corpus-mean series, top-k via "
    "per-partition partials. Per-key state is the grid length, so "
    "the plan is flat in key cardinality",
)
def x98_series_similarity(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.timeseries import topk_similar_to_mean

    return topk_similar_to_mean(T(spark, sf, "events"), k=10, n_days=30)


@probe(
    "x99_trimmed_mean_udaf",
    sql="""
        WITH ranked AS (
            SELECT l_returnflag, l_quantity,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_quantity) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem
        )
        SELECT l_returnflag,
               floor(avg(l_quantity) * 10000.0 + 0.5) / 10000.0
                   AS trimmed_mean
        FROM ranked
        WHERE rn > floor(n * 0.05) AND rn <= n - floor(n * 0.05)
        GROUP BY l_returnflag
    """,
    note="5% two-sided trimmed mean per group via a GROUPED_AGG pandas "
    "UDF — the one UDF flavor the rest of the engine does not already "
    "exercise (scalar pandas UDFs, grouped-map, map-in-pandas, UDTF, "
    "stateful processors are all elsewhere): Arrow ships each group's "
    "column once, numpy sorts in-process. The oracle replays the trim "
    "with rank arithmetic (values sorted ascending; ties broken by "
    "position, which the value-sort makes deterministic)",
)
def x99_trimmed_mean_udaf(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from flytemosaic_spark.operators.text import portable_round

    # functionType passed explicitly: `from __future__ import
    # annotations` stringifies type hints, which defeats the
    # hint-based eval-type inference
    def _tm(v):
        arr = np.sort(v.to_numpy())
        cut = int(np.floor(len(arr) * 0.05))
        return float(arr[cut: len(arr) - cut].mean())

    trimmed_mean = pandas_udf(_tm, "double", PandasUDFType.GROUPED_AGG)

    return (
        T(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(portable_round(trimmed_mean("l_quantity")).alias("trimmed_mean"))
    )


@probe(
    "x100_zonal_stats",
    sql="""
        WITH px AS (
            SELECT CAST(embedding[1] AS DOUBLE) AS x,
                   CAST(embedding[2] AS DOUBLE) AS y,
                   CAST(embedding[3] AS DOUBLE) AS v
            FROM embeddings
        ),
        zones(zone_id, minx, miny, maxx, maxy) AS (
            VALUES (0, -2.0, -2.0, 0.0, 0.0),
                   (1, 0.0, -2.0, 2.0, 0.0),
                   (2, -2.0, 0.0, 0.0, 2.0),
                   (3, 0.0, 0.0, 2.0, 2.0),
                   (4, -0.5, -0.5, 0.5, 0.5)
        )
        SELECT zone_id, count(*) AS n_pixels,
               floor(avg(v) * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
               min(v) AS min_value, max(v) AS max_value
        FROM px JOIN zones
          ON x >= minx AND x <= maxx AND y >= miny AND y <= maxy
        GROUP BY zone_id
    """,
    note="zonal statistics (operators/spatial.py:zonal_stats — the "
    "zonal form of the reference's per-tile composite aggregate, "
    "glad.py:259-282): embedding dims 1/2 as point coordinates, dim 3 "
    "as the value, five literal zones incl. an overlapping center "
    "zone. The theta containment join runs as the grid-cell equi-join "
    "(each point bins to ONE cell; zones explode to covered cells) so "
    "pairing cost is bucket occupancy, never |points| x |zones|",
)
def x100_zonal_stats(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.spatial import zonal_stats
    from flytemosaic_spark.operators.text import portable_round

    px = T(spark, sf, "embeddings").select(
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
        F.element_at("embedding", 3).cast("double").alias("value"),
    )
    zones = spark.createDataFrame(
        [
            (0, -2.0, -2.0, 0.0, 0.0),
            (1, 0.0, -2.0, 2.0, 0.0),
            (2, -2.0, 0.0, 0.0, 2.0),
            (3, 0.0, 0.0, 2.0, 2.0),
            (4, -0.5, -0.5, 0.5, 0.5),
        ],
        "zone_id long, minx double, miny double, maxx double, maxy double",
    )
    out = zonal_stats(px, zones, cell=0.5)
    return out.select(
        "zone_id",
        "n_pixels",
        portable_round(F.col("mean_value"), 6).alias("mean_value"),
        "min_value",
        "max_value",
    )


@probe(
    "x101_exp_smoothing",
    sql="""
        WITH base AS (
            SELECT user_id AS key, CAST(ts AS DATE) AS d, value AS v
            FROM events
        ),
        d0 AS (SELECT min(d) AS d0 FROM base),
        daily AS (
            SELECT key, date_diff('day', d0, d) + 1 AS day, sum(v) AS v
            FROM base CROSS JOIN d0
            WHERE date_diff('day', d0, d) + 1 <= 30
            GROUP BY 1, 2
        ),
        grid AS (
            SELECT k.key, g.day
            FROM (SELECT DISTINCT key FROM daily) k,
                 (SELECT unnest(range(1, 31)) AS day) g
        ),
        dense AS (
            SELECT grid.key, grid.day, coalesce(daily.v, 0.0) AS v
            FROM grid LEFT JOIN daily USING (key, day)
        )
        SELECT key AS user_id,
               floor(sum(CASE WHEN day = 1
                              THEN power(0.7, 29) * v
                              ELSE 0.3 * power(0.7, 30 - day) * v END)
                     * 1000000.0 + 0.5) / 1000000.0 AS smoothed
        FROM dense GROUP BY key
    """,
    note="exponential smoothing (SES, alpha=0.3) of each user's daily "
    "series, evaluated in CLOSED FORM — s_T unrolls to a power-"
    "weighted sum, so the sequential fold becomes one partial-"
    "aggregated groupBy over the dense grid (reusing "
    "operators/timeseries.daily_series): no per-key iteration, no "
    "collect_list, state is one accumulator per key. The smoothed "
    "level IS the next-period forecast",
)
def x101_exp_smoothing(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round
    from flytemosaic_spark.operators.timeseries import daily_series

    alpha, n_days = 0.3, 30
    dense = daily_series(T(spark, sf, "events"), n_days=n_days)
    weight = F.when(
        F.col("day") == 1, F.pow(F.lit(1 - alpha), F.lit(n_days - 1))
    ).otherwise(
        F.lit(alpha) * F.pow(F.lit(1 - alpha), F.lit(n_days) - F.col("day"))
    )
    return (
        dense.groupBy(F.col("key").alias("user_id"))
        .agg(portable_round(F.sum(weight * F.col("v")), 6).alias("smoothed"))
    )


@probe(
    "x102_target_encoding",
    sql="""
        WITH joined AS (
            SELECT c.c_mktsegment AS seg, o.o_totalprice AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        prior AS (SELECT avg(y) AS mu FROM joined),
        enc AS (
            SELECT seg, count(*) AS n, sum(y) AS s FROM joined GROUP BY seg
        )
        SELECT seg,
               n AS n_orders,
               floor((s + mu * 20.0) / (n + 20.0) * 10000.0 + 0.5)
                   / 10000.0 AS encoded
        FROM enc CROSS JOIN prior
    """,
    note="smoothed target encoding (the leakage-prone categorical "
    "feature done right at corpus scale): per-category Bayesian-"
    "smoothed target mean (sum + mu*m)/(n + m), m=20 — two partial "
    "aggregates and a 1-row broadcast prior, so the encoding table is "
    "category-cardinality-scale and joins back as a broadcast "
    "dimension at feature-apply time",
)
def x102_target_encoding(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    joined = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("y"))
    prior = joined.agg(F.avg("y").alias("mu"))
    enc = joined.groupBy("seg").agg(
        F.count("*").alias("n"), F.sum("y").alias("s")
    )
    m = F.lit(20.0)
    return (
        enc.crossJoin(F.broadcast(prior))
        .select(
            "seg",
            F.col("n").alias("n_orders"),
            portable_round(
                (F.col("s") + F.col("mu") * m) / (F.col("n") + m)
            ).alias("encoded"),
        )
    )


@probe(
    "x103_negative_sampling",
    sql="""
        WITH e0 AS (
            SELECT DISTINCT l_suppkey AS src, l_partkey AS dst
            FROM lineitem
        ),
        nodes AS (SELECT DISTINCT src AS node FROM e0),
        rng AS (SELECT max(dst) + 1 AS n FROM e0),
        cand AS (
            SELECT node AS src,
                   CAST(list_sum(list_transform(range(1, 9),
                       j -> (strpos('0123456789abcdef',
                                substr(md5(concat(CAST(node AS VARCHAR), '#',
                                                  CAST(k.k AS VARCHAR))),
                                       j, 1)) - 1)
                            * power(16, 8 - j))) AS BIGINT) % n AS dst
            FROM nodes CROSS JOIN rng
            CROSS JOIN (SELECT unnest(range(0, 8)) AS k) k
        ),
        neg AS (
            SELECT DISTINCT c.src, c.dst
            FROM cand c
            WHERE NOT EXISTS (SELECT 1 FROM e0
                              WHERE e0.src = c.src AND e0.dst = c.dst)
        )
        SELECT src, dst FROM neg
    """,
    note="deterministic negative sampling for link-prediction / graph-"
    "embedding training over the sparse supplier-part bipartite graph: "
    "per supplier, 8 md5-derived pseudo-random part endpoints, then "
    "one anti-join "
    "against the real edge list filters accidental positives. "
    "rand()-free so the sample is identical under retries; candidate "
    "generation is map-side explode, the anti-join is the only "
    "shuffle (Bloom-prefilterable via operators/bloom.py at scale)",
)
def x103_negative_sampling(spark: SparkSession, sf: str) -> DataFrame:
    e0 = (
        T(spark, sf, "lineitem")
        .select(
            F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
        )
        .distinct()
    )
    nodes = e0.select(F.col("src").alias("node")).distinct()
    rng = e0.agg((F.max("dst") + 1).alias("n"))
    hval = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "#", F.col("node").cast("string"), F.col("k").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    cand = (
        nodes.crossJoin(F.broadcast(rng))
        .select(
            F.col("node").alias("src"),
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("k"),
            F.col("n"),
        )
        .withColumnRenamed("src", "node")
        .select(F.col("node").alias("src"), (hval % F.col("n")).alias("dst"))
        .distinct()
    )
    return cand.join(e0, ["src", "dst"], "left_anti")


@probe(
    "x104_clustering_coeff",
    sql="""
        WITH e0 AS (
            SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                            greatest(a.l_partkey, b.l_partkey) AS v
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey <> b.l_partkey
        ),
        tri AS (
            SELECT ab.u AS a, ab.v AS b1, ac.v AS b2
            FROM e0 ab
            JOIN e0 ac ON ab.u = ac.u AND ab.v < ac.v
            JOIN e0 bc ON bc.u = ab.v AND bc.v = ac.v
        ),
        corners AS (
            SELECT node, count(*) AS n_tri FROM (
                SELECT a AS node FROM tri
                UNION ALL SELECT b1 FROM tri
                UNION ALL SELECT b2 FROM tri
            ) GROUP BY node
        ),
        deg AS (
            SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
            ) GROUP BY node
        )
        SELECT d.node, d.deg,
               coalesce(c.n_tri, 0) AS n_tri,
               floor(coalesce(c.n_tri, 0)
                     / (d.deg * (d.deg - 1) / 2.0)
                     * 1000000.0 + 0.5) / 1000000.0 AS cc
        FROM deg d LEFT JOIN corners c USING (node)
        WHERE d.deg >= 2
    """,
    note="per-node local clustering coefficient over the part "
    "co-occurrence graph (graph.py:clustering_coefficient): triangle "
    "participation from exploding each enumerated triangle's three "
    "corners — the enumeration reuses the degree-ordered orientation, "
    "so the wedge fan-out stays O(sqrt E) per node while the oracle's "
    "naive triple join is quadratic in the hottest degree",
)
def x104_clustering_coeff(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.graph import clustering_coefficient
    from flytemosaic_spark.operators.text import portable_round

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    # Pair generation via ONE groupBy instead of the self-join: the
    # join shuffled the 600k-row table twice (both aliases) to emit
    # the same per-order pairs that a collect_set + positional explode
    # emits after ONE exchange — order groups are tiny (avg 4 parts),
    # so the in-task pair fan-out is trivial and the edge set is
    # bit-identical (sorted set, src < dst once per order). r10 at
    # sf0.1: 1.82s -> 1.28s for the und construction (guide §2.4).
    grp = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .where(F.size("ps") >= 2)
    )
    edges = grp.select(F.posexplode("ps").alias("i", "src"), "ps").select(
        "src",
        F.explode(
            F.slice(F.col("ps"), F.col("i") + 2, F.size("ps"))
        ).alias("dst"),
    )
    out = clustering_coefficient(edges)
    return out.select(
        "node", "deg", "n_tri", portable_round(F.col("cc"), 6).alias("cc")
    )


@probe(
    "x105_rag_chunking",
    sql=r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        starts AS (
            SELECT doc_id, w, unnest(range(1, greatest(len(w), 1) + 1, 24))
                AS s
            FROM toks
        )
        SELECT doc_id,
               CAST((s - 1) / 24 AS BIGINT) AS chunk_idx,
               len(w[s:least(s + 31, len(w))]) AS n_tokens,
               md5(array_to_string(w[s:least(s + 31, len(w))], ' '))
                   AS chunk_hash
        FROM starts
    """,
    note="RAG ingestion chunking: overlapping 32-token windows with a "
    "24-token stride (8-token overlap) per document — the retrieval "
    "twin of x25's training-sequence packing. Pure array math "
    "(sequence of starts -> slice -> explode), map-side only: no "
    "shuffle until whatever downstream indexes the chunks; chunk "
    "content hashed so the probe output stays narrow",
)
def x105_rag_chunking(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    size, stride = 32, 24
    docs = T(spark, sf, "documents").select(
        "doc_id", tokens(F.col("text")).alias("w")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("w"), F.lit(1)), F.lit(stride)
    )
    return (
        docs.select("doc_id", "w", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / stride).cast("bigint").alias("chunk_idx"),
            F.size(F.slice("w", F.col("s"), F.lit(size))).alias("n_tokens"),
            F.md5(
                F.array_join(F.slice("w", F.col("s"), F.lit(size)), " ")
            ).alias("chunk_hash"),
        )
    )
