"""Round-5 probes: semantic dedup, mixture weighting, tokenizer
fertility, community detection, session path mining, int8 embedding
quantization, and packing efficiency — the next ring of
training-data-pipeline operators around the existing dedup / ANN /
packing / graph families.

Portability recipe (same as the rest of the suite): integer state
wherever sums cross rows (micro-unit quantization before any
order-sensitive float sum), cosine similarities rounded at 1e-4
before thresholds/ranking (the proven x3 recipe), md5 for anything
pseudo-random.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import portable_round, token_count
from flytemosaic_spark.plans.prefix import bounded_total, bounded_window
from flytemosaic_spark.probes.registry import T, probe

# ---------------------------------------------------------------------------
# x129 — semantic dedup (SemDeDup shape): coarse cluster, then exact
# pairwise cosine only WITHIN clusters
# ---------------------------------------------------------------------------

# anchors scale with the corpus as k = max(8, floor(sqrt(N))) — the
# COST-OPTIMAL point: total work = assignment N*k + intra-block pairs
# N*(N/k), minimized at k = sqrt(N) for ~2*N^1.5 total. k ∝ N looks
# flat at small scale but makes the assignment stage quadratic
# (N²/block — measured 10.9x at 30x data); fixed k makes the pair
# stage quadratic (18.7x at 10x). Both engines derive k from the same
# count; sqrt is correctly-rounded IEEE so floor(sqrt(N)) is portable.
_SEM_ANCHOR_FLOOR = 8
_SEM_THRESHOLD = 0.30
_PAIR_BUCKETS = 8


@probe(
    "x129_semdedup",
    sql=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        k AS (SELECT greatest({_SEM_ANCHOR_FLOOR},
                              CAST(floor(sqrt(count(*))) AS BIGINT))
                  AS n_anchors
              FROM e),
        a AS (SELECT vec_id AS aid, v AS av FROM e
              WHERE vec_id < (SELECT n_anchors FROM k)),
        scored AS (
            SELECT e.vec_id, a.aid,
                   round(list_cosine_similarity(e.v, a.av), 4) AS sim
            FROM e CROSS JOIN a
        ),
        asg AS (
            SELECT vec_id, aid AS cluster_id
            FROM (SELECT vec_id, aid,
                         row_number() OVER (PARTITION BY vec_id
                             ORDER BY sim DESC, aid) AS rk
                  FROM scored)
            WHERE rk = 1
        ),
        m AS (SELECT e.vec_id, asg.cluster_id, e.v
              FROM e JOIN asg USING (vec_id)),
        dup AS (
            SELECT x.cluster_id, y.vec_id AS dropped
            FROM m x JOIN m y
              ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
            WHERE round(list_cosine_similarity(x.v, y.v), 4) >= {_SEM_THRESHOLD}
        ),
        cs AS (SELECT cluster_id, count(*) AS n_members FROM m GROUP BY 1),
        ds AS (SELECT cluster_id, count(*) AS n_dup_pairs,
                      count(DISTINCT dropped) AS n_dropped
               FROM dup GROUP BY 1)
        SELECT cs.cluster_id, cs.n_members,
               coalesce(ds.n_dup_pairs, 0) AS n_dup_pairs,
               coalesce(ds.n_dropped, 0) AS n_dropped
        FROM cs LEFT JOIN ds USING (cluster_id)
    """,
    note="semantic dedup (SemDeDup shape): assign every vector to its "
    "nearest of k deterministic anchor centroids (broadcast, "
    "node-scale), then run the exact pairwise cosine ONLY within "
    "clusters — the quadratic pair join is bounded by the largest "
    "cluster block instead of the corpus; keep-lowest-id drop rule "
    "(a member is dropped if any lower-id cluster-mate is >= 0.30 "
    "cosine). k = max(8, floor(sqrt(N))) is derived relationally from "
    "the corpus count on BOTH engines — the cost-optimal anchor count "
    "(assignment N·k + pair stage N²/k balance at k = sqrt(N), "
    "~2·N^1.5 total); sims rounded at 1e-4 before the threshold so "
    "both engines gate identically",
)
def x129_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.similarity import semdedup_report

    emb = T(spark, sf, "embeddings").select("vec_id", "embedding")
    # anchor count ∝ corpus: a 1-row count aggregate (broadcast) gates
    # the anchor filter, so no driver-side action is needed and the
    # oracle replays the same k from the same count
    k_df = emb.agg(
        F.greatest(
            F.lit(_SEM_ANCHOR_FLOOR).cast("bigint"),
            F.floor(F.sqrt(F.count("*"))).cast("bigint"),
        ).alias("_n_anchors")
    )
    anchors = (
        emb.crossJoin(F.broadcast(k_df))
        .where(F.col("vec_id") < F.col("_n_anchors"))
        .drop("_n_anchors")
    )
    return semdedup_report(
        emb, anchors, threshold=_SEM_THRESHOLD, pair_buckets=_PAIR_BUCKETS
    )


# ---------------------------------------------------------------------------
# x130 — temperature-based source mixture weights
# ---------------------------------------------------------------------------


@probe(
    "x130_temperature_mix",
    sql="""
        WITH g AS (
            SELECT source, count(*) AS n_docs,
                   CAST(floor(sqrt(count(*)) * 1000000.0 + 0.5) AS BIGINT) AS wq
            FROM documents GROUP BY source
        ),
        t AS (SELECT sum(wq) AS total_wq FROM g)
        SELECT source, n_docs,
               floor(CAST(wq AS DOUBLE) / total_wq * 1000000.0 + 0.5) / 1000000.0
                   AS mix_weight
        FROM g CROSS JOIN t
    """,
    note="temperature-based mixture weighting (p_s ∝ n_s^0.5, the "
    "multilingual/multi-source rebalancing rule; sqrt is "
    "correctly-rounded IEEE so alpha=0.5 is portable): per-source "
    "counts quantized to integer micro-units BEFORE the normalizing "
    "sum, so the only float op is one final division — the weight "
    "table is source-cardinality and broadcasts into any sampler",
)
def x130_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    g = (
        T(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.floor(F.sqrt(F.count("*")) * 1e6 + F.lit(0.5))
            .cast("bigint")
            .alias("_wq"),
        )
    )
    t = g.agg(F.sum("_wq").alias("_total"))
    return g.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        portable_round(F.col("_wq").cast("double") / F.col("_total"), 6).alias(
            "mix_weight"
        ),
    )


# ---------------------------------------------------------------------------
# x131 — tokenizer fertility / compression-rate readout
# ---------------------------------------------------------------------------


@probe(
    "x131_tokenizer_fertility",
    sql=r"""
        WITH d AS (
            SELECT lang,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                       AS n_tokens,
                   length(text) AS n_chars,
                   strlen(text) AS n_bytes
            FROM documents
        )
        SELECT lang, count(*) AS n_docs,
               sum(n_tokens) AS total_tokens,
               floor(CAST(sum(n_chars) AS DOUBLE) / sum(n_tokens) * 1000000.0
                     + 0.5) / 1000000.0 AS chars_per_token,
               floor(CAST(sum(n_bytes) AS DOUBLE) / sum(n_tokens) * 1000000.0
                     + 0.5) / 1000000.0 AS bytes_per_token
        FROM d GROUP BY lang
    """,
    note="tokenizer fertility per language: chars/token and bytes/token "
    "of the whitespace tokenizer — the compression-rate readout that "
    "decides vocab allocation across languages; all-integer sums, two "
    "final divisions",
)
def x131_tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select(
        "lang",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        portable_round(
            F.sum("n_chars").cast("double") / F.sum("n_tokens"), 6
        ).alias("chars_per_token"),
        portable_round(
            F.sum("n_bytes").cast("double") / F.sum("n_tokens"), 6
        ).alias("bytes_per_token"),
    )


# ---------------------------------------------------------------------------
# x132 — majority-label propagation (LPA community detection)
# ---------------------------------------------------------------------------

_LPA_ITER = """
        {next} AS (
            SELECT node, lbl FROM (
                SELECT e.dst AS node, p.lbl,
                       row_number() OVER (PARTITION BY e.dst
                           ORDER BY count(*) DESC, p.lbl) AS rk
                FROM e JOIN {prev} p ON e.src = p.node
                GROUP BY e.dst, p.lbl
            ) WHERE rk = 1
        )"""


@probe(
    "x132_label_propagation",
    sql="""
        WITH e AS (
            SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_suppkey <> b.l_suppkey
        ),
        l0 AS (SELECT DISTINCT src AS node, src % 10 AS lbl FROM e),"""
    + _LPA_ITER.format(next="l1", prev="l0")
    + ","
    + _LPA_ITER.format(next="l2", prev="l1")
    + """
        SELECT node AS suppkey, lbl AS community FROM l2
    """,
    note="majority-label propagation (LPA community detection, 2 "
    "synchronous rounds) over the supplier co-occurrence graph, "
    "initial label node%10, ties to the smallest label — all-integer "
    "state so rounds replay bit-identically; each round is one join "
    "of the cached edges against the node-scale label table "
    "(broadcast under the 2M-node gate), one (dst,lbl) hash-agg with "
    "map-side combine, and a per-node window bounded by |labels|, "
    "never by degree",
)
def x132_label_propagation(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.graph import (
        grouped_pairs,
        label_propagation,
    )

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    # label_propagation DISTINCTs its edges — the set-per-order
    # symmetric emission is the identical edge set after ONE exchange
    # instead of the != self-join's two (r10, the x104 recipe)
    edges = grouped_pairs(
        li, "l_orderkey", "l_suppkey", distinct=True, symmetric=True
    ).select(F.col("u").alias("src"), F.col("v").alias("dst"))
    out = label_propagation(edges, iterations=2, init_mod=10)
    return out.select(F.col("node").alias("suppkey"), "community")


# ---------------------------------------------------------------------------
# x133 — top-k session event-type paths
# ---------------------------------------------------------------------------


@probe(
    "x133_session_paths",
    sql="""
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, event_id, event_type,
                   sum(new_sess) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM marked
        ),
        numbered AS (
            SELECT user_id, sess_id, event_type,
                   row_number() OVER (PARTITION BY user_id, sess_id
                       ORDER BY ts, event_id) AS pos
            FROM sess
        ),
        paths AS (
            SELECT string_agg(event_type, '>' ORDER BY pos) AS path
            FROM numbered WHERE pos <= 5
            GROUP BY user_id, sess_id
        )
        SELECT path, count(*) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT 20
    """,
    note="top-20 session journeys: 30-minute-gap sessions (the x6 "
    "construction), each session reduced to its first-5 event-type "
    "path, global heavy hitters via TakeOrderedAndProject — no global "
    "sort; Spark builds the path with array_sort over (ts,event_id) "
    "structs so the within-session order is deterministic under ties",
)
def x133_session_paths(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    sessions = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.array_join(
                F.transform(
                    F.slice("evs", 1, 5), lambda s: s["event_type"]
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        sessions.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# x134 — int8 scalar quantization of the embedding column
# ---------------------------------------------------------------------------


@probe(
    "x134_int8_quantization",
    sql="""
        WITH ex AS (
            SELECT u.i AS dim, u.v AS val FROM (
                SELECT list_transform(range(1, len(embedding) + 1),
                           i -> {'i': i, 'v': CAST(embedding[i] AS DOUBLE)})
                           AS us
                FROM embeddings), unnest(us) AS t(u)
        ),
        mm AS (SELECT dim, min(val) AS mn, max(val) AS mx FROM ex GROUP BY dim),
        q AS (
            SELECT ex.dim,
                   abs(ex.val - (mn + floor((ex.val - mn) * 255.0 / (mx - mn)
                                            + 0.5) * (mx - mn) / 255.0)) AS err
            FROM ex JOIN mm USING (dim)
        ),
        iq AS (SELECT dim, CAST(floor(err * 1e9 + 0.5) AS BIGINT) AS erru FROM q)
        SELECT dim, count(*) AS n,
               floor(CAST(sum(erru) AS DOUBLE) / count(*) / 1000.0 + 0.5)
                   / 1000000.0 AS avg_abs_err_u,
               floor(CAST(max(erru) AS DOUBLE) / 1000.0 + 0.5) / 1000000.0
                   AS max_abs_err_u
        FROM iq GROUP BY dim
    """,
    note="int8 scalar quantization readout: per-dimension min/max "
    "(exact, order-independent) define the 255-level grid; each "
    "element's reconstruction error is quantized to integer "
    "nano-units BEFORE the per-dim sums so avg/max replay exactly — "
    "the 4x-memory-compression feasibility check an ANN index runs "
    "before switching its vectors to int8; the min/max table is "
    "dims-cardinality and broadcasts back onto the exploded rows",
)
def x134_int8_quantization(spark: SparkSession, sf: str) -> DataFrame:
    ex = T(spark, sf, "embeddings").select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "val")
    ).select((F.col("dim0") + 1).alias("dim"), "val")
    mm = ex.groupBy("dim").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    code = F.floor((F.col("val") - F.col("mn")) * F.lit(255.0) / (F.col("mx") - F.col("mn")) + F.lit(0.5))
    # same IEEE association as the oracle: code * (mx-mn), THEN / 255
    # (a precomputed step = (mx-mn)/255 is a different expression that
    # can differ in the last ulp and flip the 1e-9 quantization)
    err = F.abs(
        F.col("val")
        - (F.col("mn") + code * (F.col("mx") - F.col("mn")) / F.lit(255.0))
    )
    iq = ex.join(F.broadcast(mm), "dim").select(
        "dim", F.floor(err * F.lit(1e9) + F.lit(0.5)).cast("bigint").alias("erru")
    )
    return iq.groupBy("dim").agg(
        F.count("*").alias("n"),
        (
            F.floor(F.sum("erru").cast("double") / F.count("*") / F.lit(1000.0) + F.lit(0.5))
            / F.lit(1e6)
        ).alias("avg_abs_err_u"),
        (
            F.floor(F.max("erru").cast("double") / F.lit(1000.0) + F.lit(0.5))
            / F.lit(1e6)
        ).alias("max_abs_err_u"),
    )


# ---------------------------------------------------------------------------
# x135 — packing efficiency readout over the x25 packer
# ---------------------------------------------------------------------------


@probe(
    "x135_packing_efficiency",
    sql=r"""
        WITH toks AS (
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 8
                       AS bucket,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                       AS n_tokens
            FROM documents
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               count(*) AS n_docs,
               sum(n_tokens) AS total_tokens,
               CAST(floor((sum(n_tokens) - 1) / 256.0) + 1 AS BIGINT) AS n_packs,
               floor(CAST(sum(n_tokens) AS DOUBLE)
                     / ((floor((sum(n_tokens) - 1) / 256.0) + 1) * 256.0)
                     * 1000000.0 + 0.5) / 1000000.0 AS fill_ratio
        FROM toks GROUP BY bucket
    """,
    note="packing-efficiency readout of the x25 concat-then-chunk "
    "packer: per bucket, how full the 256-token packs run (the "
    "padding-waste number a dataloader watches); pure integer "
    "aggregate over the same md5 bucket assignment, one final "
    "division",
)
def x135_packing_efficiency(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.packing import pack_sequences

    packed = pack_sequences(T(spark, sf, "documents"), budget=256, n_buckets=8)
    g = packed.groupBy(F.col("bucket").cast("bigint").alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.floor((F.sum("n_tokens") - 1) / F.lit(256.0)) + 1)
        .cast("bigint")
        .alias("n_packs"),
    )
    return g.select(
        "bucket",
        "n_docs",
        "total_tokens",
        "n_packs",
        portable_round(
            F.col("total_tokens").cast("double")
            / (F.col("n_packs") * F.lit(256.0)),
            6,
        ).alias("fill_ratio"),
    )


# ---------------------------------------------------------------------------
# x136 — in-engine logistic-regression training (unrolled GD)
# ---------------------------------------------------------------------------

_LR_FEATS = """
            SELECT o_totalprice / 1000000.0 AS price_m,
                   CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2')
                        THEN 1.0 ELSE 0.0 END AS urgent,
                   1.0 AS _bias,
                   CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
            FROM orders"""

# one GD step: residual r = fast_sigmoid(z) - y with z from the previous
# weights; per-row contributions quantized to integer nano-units before
# the sum; new weight = round9(w - lr * ((g/1e9)/n))
_LR_STEP = """
        g{k} AS (
            SELECT count(*) AS n,
                   sum(CAST(floor(r * price_m * 1e9 + 0.5) AS BIGINT)) AS g1,
                   sum(CAST(floor(r * urgent * 1e9 + 0.5) AS BIGINT)) AS g2,
                   sum(CAST(floor(r * _bias * 1e9 + 0.5) AS BIGINT)) AS g3
            FROM (
                SELECT price_m, urgent, _bias, y,
                       (0.5 + z / (2.0 * (1.0 + abs(z)))) - y AS r
                FROM (SELECT d.*, wp.w1 * price_m + wp.w2 * urgent
                                 + wp.w3 * _bias AS z
                      FROM d CROSS JOIN w{p} wp)
            )
        ),
        w{k} AS (
            SELECT floor((wp.w1 - 0.05 * ((CAST(g1 AS DOUBLE) / 1e9) / gg.n))
                         * 1e9 + 0.5) / 1e9 AS w1,
                   floor((wp.w2 - 0.05 * ((CAST(g2 AS DOUBLE) / 1e9) / gg.n))
                         * 1e9 + 0.5) / 1e9 AS w2,
                   floor((wp.w3 - 0.05 * ((CAST(g3 AS DOUBLE) / 1e9) / gg.n))
                         * 1e9 + 0.5) / 1e9 AS w3,
                   gg.n AS n
            FROM g{k} gg CROSS JOIN w{p} wp
        )"""


@probe(
    "x136_logreg_train",
    sql="WITH d AS ("
    + _LR_FEATS
    + """),
        w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),"""
    + _LR_STEP.format(k=1, p=0)
    + ","
    + _LR_STEP.format(k=2, p=1)
    + ","
    + _LR_STEP.format(k=3, p=2)
    + """
        SELECT n, w1 AS w_price_m, w2 AS w_urgent, w3 AS w_bias FROM w3
    """,
    note="in-engine model training: 3 full-batch gradient-descent steps "
    "of a logistic-style linear model (operators/linear.py). The link "
    "is the fast sigmoid 0.5 + z/(2(1+|z|)) — pure IEEE ops, no exp, "
    "so the whole trajectory replays bit-identically; per-row gradient "
    "contributions quantize to integer nano-units before the sum "
    "(order-independent), weights round at 1e-9 per step. Each step = "
    "one scan of the cached feature table + one 1-row aggregate — "
    "corpus never moves, weights are the only cross-step state",
)
def x136_logreg_train(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.linear import logreg_train_gd

    d = T(spark, sf, "orders").select(
        (F.col("o_totalprice") / F.lit(1000000.0)).alias("price_m"),
        F.substring("o_orderpriority", 1, 1)
        .isin("1", "2")
        .cast("double")
        .alias("urgent"),
        (F.col("o_orderstatus") == "F").cast("double").alias("y"),
    )
    return logreg_train_gd(
        d, ["price_m", "urgent"], label_col="y", lr=0.05, iterations=3
    ).select(
        "n",
        F.col("w_price_m"),
        F.col("w_urgent"),
        "w_bias",
    )


# ---------------------------------------------------------------------------
# x137 — skip-gram (center, context) pair mining
# ---------------------------------------------------------------------------


@probe(
    "x137_skipgram_pairs",
    sql=r"""
        WITH toks AS (
            SELECT CASE WHEN trim(text) = '' THEN []
                        ELSE string_split_regex(trim(text), '\s+') END AS w
            FROM documents
        ),
        fw AS (
            SELECT unnest(flatten(list_transform(w, (x, i) ->
                       list_transform(w[i+1:i+2],
                                      c -> {'center': x, 'context': c}))))
                   AS p
            FROM toks
        ),
        sym AS (
            SELECT p.center AS center, p.context AS context FROM fw
            UNION ALL
            SELECT p.context, p.center FROM fw
        )
        SELECT center, context, count(*) AS n_pairs
        FROM sym GROUP BY center, context
        ORDER BY n_pairs DESC, center, context
        LIMIT 50
    """,
    note="skip-gram (center, context) pair mining, window 2 — the "
    "word2vec / embedding-pretraining corpus pass. Pairs are generated "
    "MAP-SIDE from each token array (index lambda + slice of the next "
    "two tokens, then symmetrized) — no positional self-join, no "
    "shuffle until the final count; top-50 via TakeOrderedAndProject",
)
def x137_skipgram_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    w = F.when(F.trim(F.col("text")) == "", F.array().cast("array<string>")).otherwise(
        tokens(F.col("text"))
    )
    # 2-arg higher-order lambda: second argument is the 0-based index;
    # slice() is 1-based, so (i+2, 2) = the next two tokens after i
    fw = (
        T(spark, sf, "documents")
        .select(w.alias("w"))
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "w",
                        lambda x, i: F.transform(
                            F.slice("w", i + F.lit(2), 2),
                            lambda c: F.struct(
                                x.alias("center"), c.alias("context")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.center", "p.context")
    )
    sym = fw.unionAll(
        fw.select(F.col("context").alias("center"), F.col("center").alias("context"))
    )
    return (
        sym.groupBy("center", "context")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("center"), F.asc("context"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# x138 — grid-density clustering (DBSCAN-lite on dense cells)
# ---------------------------------------------------------------------------

_DB_CELL = 0.1
_DB_MINPTS = 8
# cell id encoding shared by both engines: (cx+2e6)*4e6 + (cy+2e6)
_DB_ENC = "(cx + 2000000) * 4000000 + (cy + 2000000)"


@probe(
    "x138_grid_density_clusters",
    sql=f"""
        WITH RECURSIVE p AS (
            SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) / {_DB_CELL}) AS BIGINT)
                       AS cx,
                   CAST(floor(CAST(embedding[2] AS DOUBLE) / {_DB_CELL}) AS BIGINT)
                       AS cy
            FROM embeddings
        ),
        dense AS (
            SELECT cx, cy, {_DB_ENC} AS cell, count(*) AS n_pts
            FROM p GROUP BY cx, cy
            HAVING count(*) >= {_DB_MINPTS}
        ),
        edges AS (
            SELECT a.cell AS a, b.cell AS b
            FROM dense a JOIN dense b
              ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
             AND a.cell <> b.cell
        ),
        reach(node, lbl) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
        ),
        comp AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node)
        SELECT coalesce(c.cluster, d.cell) AS cluster_id,
               count(*) AS n_cells, sum(d.n_pts) AS n_points
        FROM dense d LEFT JOIN comp c ON c.node = d.cell
        GROUP BY 1
    """,
    note="grid-density clustering (DBSCAN-lite): bin the first two "
    "embedding dims into 0.1 cells, keep cells with >= 8 points "
    "(density core), connect 8-neighbor dense cells, label components "
    "with the iterative min-label operator (oracle: recursive-CTE "
    "closure). The neighbor join runs on the CELL table (corpus "
    "already aggregated away) and the 9-way adjacency is an equi-join "
    "on shifted cell keys at scale — the quadratic never touches "
    "points",
)
def x138_grid_density_clusters(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.dedup import connected_components

    e = F.col("embedding").cast("array<double>")
    p = T(spark, sf, "embeddings").select(
        F.floor(F.try_element_at(e, F.lit(1)) / F.lit(_DB_CELL))
        .cast("bigint")
        .alias("cx"),
        F.floor(F.try_element_at(e, F.lit(2)) / F.lit(_DB_CELL))
        .cast("bigint")
        .alias("cy"),
    )
    enc = (F.col("cx") + F.lit(2000000)) * F.lit(4000000) + (
        F.col("cy") + F.lit(2000000)
    )
    dense = (
        p.groupBy("cx", "cy")
        .agg(F.count("*").alias("n_pts"))
        .where(F.col("n_pts") >= _DB_MINPTS)
        .withColumn("cell", enc)
    )
    # 9-way adjacency as an equi-join: explode each dense cell to its
    # 3x3 neighbor keys, join back on the encoded key — never a theta
    # join over the cell table
    offs = F.expr(
        "explode(array(-1,0,1)) as dx"
    )
    neigh = (
        dense.select("cx", "cy", "cell")
        .select("cx", "cy", "cell", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dx"))
        .select("cx", "cy", "cell", "dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dy"))
        .where((F.col("dx") != 0) | (F.col("dy") != 0))
        .select(
            F.col("cell").alias("a"),
            (
                (F.col("cx") + F.col("dx") + F.lit(2000000)) * F.lit(4000000)
                + (F.col("cy") + F.col("dy") + F.lit(2000000))
            ).alias("nkey"),
        )
    )
    edges = neigh.join(
        dense.select(F.col("cell").alias("nkey"), F.lit(1).alias("_hit")),
        "nkey",
    ).select("a", F.col("nkey").alias("b"))
    comp = connected_components(edges, src="a", dst="b")
    return (
        dense.join(comp.withColumnRenamed("node", "cell"), "cell", "left")
        .groupBy(F.coalesce("lbl", "cell").alias("cluster_id"))
        .agg(F.count("*").alias("n_cells"), F.sum("n_pts").alias("n_points"))
    )


# ---------------------------------------------------------------------------
# x139 — sparse TF-IDF document similarity via inverted-index join
# ---------------------------------------------------------------------------


@probe(
    "x139_tfidf_docsim",
    sql=r"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
            FROM documents WHERE trim(text) <> ''
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        w AS (
            SELECT doc_id, term,
                   CAST(floor(tf / sqrt(CAST(df AS DOUBLE)) * 1000000.0 + 0.5)
                        AS BIGINT) AS wq
            FROM tf JOIN dft USING (term)
        ),
        n2 AS (SELECT doc_id, sum(wq * wq) AS n2 FROM w GROUP BY 1),
        q AS (SELECT doc_id AS q_id, term, wq AS wq_q FROM w WHERE doc_id < 5),
        dots AS (
            SELECT q.q_id, w.doc_id AS neighbor_id, sum(q.wq_q * w.wq) AS dot
            FROM q JOIN w USING (term)
            WHERE q.q_id <> w.doc_id
            GROUP BY 1, 2
        ),
        sims AS (
            SELECT d.q_id, d.neighbor_id,
                   floor(d.dot / (sqrt(CAST(nq.n2 AS DOUBLE))
                                  * sqrt(CAST(nc.n2 AS DOUBLE)))
                         * 1000000.0 + 0.5) / 1000000.0 AS sim
            FROM dots d
            JOIN n2 nq ON nq.doc_id = d.q_id
            JOIN n2 nc ON nc.doc_id = d.neighbor_id
        )
        SELECT q_id, rnk, neighbor_id, sim FROM (
            SELECT q_id, neighbor_id, sim,
                   CAST(row_number() OVER (PARTITION BY q_id
                       ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
            FROM sims)
        WHERE rnk <= 3
    """,
    note="lexical document similarity via the inverted index: TF-IDF-ish "
    "weights (tf/sqrt(df) — sqrt is IEEE-exact so the idf damping is "
    "portable) quantized to integer micro-units, pair dot products as "
    "an equi-join ON TERM (candidates must share a term — never a "
    "cross join), norms exact integer sums, one final float division; "
    "the sparse/lexical complement of x3's dense ANN. At scale the "
    "high-df stop terms get pruned from the index (the df table is "
    "where that knob lives)",
)
def x139_tfidf_docsim(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    docs = T(spark, sf, "documents").where(F.trim(F.col("text")) != "")
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = tf.join(F.broadcast(dft), "term").select(
        "doc_id",
        "term",
        F.floor(
            F.col("tf") / F.sqrt(F.col("df").cast("double")) * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("wq"),
    )
    n2 = w.groupBy("doc_id").agg(F.sum(F.col("wq") * F.col("wq")).alias("n2"))
    q = w.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("q_id"), "term", F.col("wq").alias("wq_q")
    )
    dots = (
        w.join(F.broadcast(q), "term")
        .where(F.col("q_id") != F.col("doc_id"))
        .groupBy("q_id", F.col("doc_id").alias("neighbor_id"))
        .agg(F.sum(F.col("wq_q") * F.col("wq")).alias("dot"))
    )
    nq = n2.select(F.col("doc_id").alias("q_id"), F.col("n2").alias("n2_q"))
    nc = n2.select(F.col("doc_id").alias("neighbor_id"), F.col("n2").alias("n2_c"))
    sims = (
        dots.join(F.broadcast(nq), "q_id")
        .join(nc, "neighbor_id")
        .select(
            "q_id",
            "neighbor_id",
            portable_round(
                F.col("dot")
                / (
                    F.sqrt(F.col("n2_q").cast("double"))
                    * F.sqrt(F.col("n2_c").cast("double"))
                ),
                6,
            ).alias("sim"),
        )
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("q_id", "rnk", "neighbor_id", "sim")
    )


# ---------------------------------------------------------------------------
# x140 — exact trailing windowed median (robust smoothing)
# ---------------------------------------------------------------------------


@probe(
    "x140_windowed_median",
    sql="""
        SELECT event_id,
               quantile_cont(value, 0.5) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
        FROM events
    """,
    note="exact trailing 5-row median per user (robust smoothing for "
    "noisy metrics — the windowed twin of a7/a16): Spark 4's "
    "percentile() as a window aggregate vs DuckDB's windowed "
    "quantile_cont, bit-exact with no rounding (same interpolation "
    "as the a16 precedent); ROWS frame so the TIMESTAMP_NTZ order "
    "key needs no epoch cast",
)
def x140_windowed_median(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return T(spark, sf, "events").select(
        "event_id", F.percentile("value", F.lit(0.5)).over(w).alias("med5")
    )


# ---------------------------------------------------------------------------
# x141 — A/B two-proportion z-statistic
# ---------------------------------------------------------------------------


@probe(
    "x141_ab_proportion_z",
    sql="""
        WITH assigned AS (
            SELECT event_type,
                   CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 4)
                        < '8000' THEN 1 ELSE 0 END AS in_a,
                   CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS conv
            FROM events
        ),
        g AS (
            SELECT event_type,
                   sum(in_a) AS n_a, sum(1 - in_a) AS n_b,
                   sum(in_a * conv) AS conv_a,
                   sum((1 - in_a) * conv) AS conv_b
            FROM assigned GROUP BY event_type
        )
        SELECT event_type, n_a, n_b, conv_a, conv_b,
               CASE WHEN (conv_a + conv_b) > 0
                         AND (conv_a + conv_b) < (n_a + n_b)
                    THEN floor(
                        ((CAST(conv_a AS DOUBLE) / n_a)
                         - (CAST(conv_b AS DOUBLE) / n_b))
                        / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                               * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                                        / (n_a + n_b))
                               * (1.0 / n_a + 1.0 / n_b))
                        * 1000000.0 + 0.5) / 1000000.0
                    ELSE 0.0 END AS z
        FROM g
    """,
    note="A/B two-proportion z-test per event type on the deterministic "
    "md5 arm assignment (x66's machinery): all-integer counts, the "
    "pooled-variance z computed in one fixed IEEE expression (sqrt is "
    "correctly rounded) — the significance readout next to x66's "
    "effect size; degenerate all/none-converted groups short-circuit "
    "to 0 so ANSI mode never divides by zero",
)
def x141_ab_proportion_z(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sampling import hash_bucket

    in_a = (hash_bucket(F.col("user_id")) < "8000").cast("bigint")
    conv = (F.col("value") > 50.0).cast("bigint")
    g = (
        T(spark, sf, "events")
        .select("event_type", in_a.alias("in_a"), conv.alias("conv"))
        .groupBy("event_type")
        .agg(
            F.sum("in_a").alias("n_a"),
            F.sum(1 - F.col("in_a")).alias("n_b"),
            F.sum(F.col("in_a") * F.col("conv")).alias("conv_a"),
            F.sum((1 - F.col("in_a")) * F.col("conv")).alias("conv_b"),
        )
    )
    tot = F.col("conv_a") + F.col("conv_b")
    n_tot = F.col("n_a") + F.col("n_b")
    p_pool = tot.cast("double") / n_tot
    z = (
        (F.col("conv_a").cast("double") / F.col("n_a"))
        - (F.col("conv_b").cast("double") / F.col("n_b"))
    ) / F.sqrt(
        p_pool * (F.lit(1.0) - p_pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.when((tot > 0) & (tot < n_tot), portable_round(z, 6))
        .otherwise(F.lit(0.0))
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# x142 — recursive CTE through the SQL frontend (graph closure)
# ---------------------------------------------------------------------------

_RCTE_SQL = """
WITH RECURSIVE e AS (
    SELECT a.l_suppkey AS src, b.l_suppkey AS dst
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_suppkey <> b.l_suppkey
    GROUP BY a.l_suppkey, b.l_suppkey
    HAVING count(*) >= 3
),
seed AS (SELECT min(src) AS s FROM e),
reach(node, depth) AS (
    SELECT s, 0 FROM seed
    UNION ALL
    SELECT e.dst, r.depth + 1
    FROM reach r JOIN e ON e.src = r.node
    WHERE r.depth < 2
)
SELECT node AS suppkey, CAST(min(depth) AS BIGINT) AS min_depth
FROM reach GROUP BY node
"""


@probe(
    "x142_recursive_closure",
    sql=_RCTE_SQL,
    note="WITH RECURSIVE through the engine's SQL frontend (Spark 4 "
    "recursive CTE): depth-bounded BFS closure from the smallest "
    "supplier over the strong-tie co-occurrence graph — the SAME SQL "
    "text runs on both engines (the tpch.py contract), proving the "
    "recursive surface end-to-end; depth bound caps the UNION ALL "
    "path multiplicity so state stays edge-scale per round",
)
def x142_recursive_closure(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.sql import sql as run_sql

    return run_sql(spark, sf, _RCTE_SQL)


# ---------------------------------------------------------------------------
# x143 — distinctive terms per source (c-TF-IDF / rate-lift keywords)
# ---------------------------------------------------------------------------


@probe(
    "x143_topic_keywords",
    sql=r"""
        WITH toks AS (
            SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term
            FROM documents WHERE trim(text) <> ''
        ),
        st AS (SELECT source, term, count(*) AS tf_st FROM toks GROUP BY 1, 2),
        s AS (SELECT source, sum(tf_st) AS t_s FROM st GROUP BY 1),
        g AS (SELECT term, sum(tf_st) AS tf_t FROM st GROUP BY 1),
        tot AS (SELECT sum(tf_st) AS t_all FROM st),
        lifted AS (
            SELECT st.source, st.term,
                   floor(((CAST(tf_st AS DOUBLE) / t_s)
                          / (CAST(tf_t AS DOUBLE) / t_all))
                         * 1000000.0 + 0.5) / 1000000.0 AS lift
            FROM st JOIN s USING (source) JOIN g USING (term) CROSS JOIN tot
        )
        SELECT source, rnk, term, lift FROM (
            SELECT source, term, lift,
                   CAST(row_number() OVER (PARTITION BY source
                       ORDER BY lift DESC, term) AS BIGINT) AS rnk
            FROM lifted)
        WHERE rnk <= 3
    """,
    note="distinctive terms per source (the c-TF-IDF / rate-lift "
    "keyword readout a corpus report shows per domain): lift = "
    "in-source term rate over corpus term rate, all counts exact "
    "integers, global term table is vocabulary-scale and broadcasts; "
    "top-3 per source with rounded-lift + term tie-break so the "
    "cutoff is engine-portable",
)
def x143_topic_keywords(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    st = (
        T(spark, sf, "documents")
        .where(F.trim(F.col("text")) != "")
        .select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("tf_st"))
    )
    s = st.groupBy("source").agg(F.sum("tf_st").alias("t_s"))
    g = st.groupBy("term").agg(F.sum("tf_st").alias("tf_t"))
    tot = st.agg(F.sum("tf_st").alias("t_all"))
    lifted = (
        st.join(F.broadcast(s), "source")
        .join(F.broadcast(g), "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "term",
            portable_round(
                (F.col("tf_st").cast("double") / F.col("t_s"))
                / (F.col("tf_t").cast("double") / F.col("t_all")),
                6,
            ).alias("lift"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("lift"), F.asc("term"))
    return (
        lifted.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("source", "rnk", "term", "lift")
    )


# ---------------------------------------------------------------------------
# x144 — sketch quality report: MinHash-LSH candidates vs exact Jaccard
# ---------------------------------------------------------------------------

# assembled against the same shingle CTE the dedup family shares
from flytemosaic_spark.probes.extensions import _SHINGLE_SQL  # noqa: E402

_X144_SQL = (
    _SHINGLE_SQL
    + """,
    exs AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
            FROM sh),
    exact AS (
        SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_inter
            FROM exs a JOIN exs b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
        WHERE round(n_inter / (n_a + n_b - n_inter), 4) >= 0.5
    ),
    m AS (
        SELECT doc_id, seed, min(md5(concat(seed, ':', shingle))) AS mh
        FROM exs CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) seeds
        GROUP BY doc_id, seed
    ),
    sig AS (SELECT doc_id, list(mh ORDER BY seed) AS s FROM m GROUP BY doc_id),
    banded AS (
        SELECT doc_id, s, b AS band,
               md5(array_to_string(list_slice(s, b * 4 + 1, b * 4 + 4), '|'))
                   AS bucket
        FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bands
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        FROM banded a JOIN banded c USING (band, bucket)
        WHERE a.doc_id < c.doc_id
    ),
    hit AS (SELECT count(*) AS n_hit FROM cand JOIN exact USING (id_a, id_b)),
    nc AS (SELECT count(*) AS n_cand FROM cand),
    ne AS (SELECT count(*) AS n_exact FROM exact)
    SELECT n_cand, n_exact, n_hit,
           CASE WHEN n_cand > 0
                THEN floor(CAST(n_hit AS DOUBLE) / n_cand * 1000000.0 + 0.5)
                     / 1000000.0 ELSE 1.0 END AS precision_,
           CASE WHEN n_exact > 0
                THEN floor(CAST(n_hit AS DOUBLE) / n_exact * 1000000.0 + 0.5)
                     / 1000000.0 ELSE 1.0 END AS recall_
    FROM nc CROSS JOIN ne CROSS JOIN hit
"""
)


@probe(
    "x144_minhash_quality",
    sql=_X144_SQL,
    note="sketch-quality report: precision/recall of the x2d banded "
    "MinHash-LSH candidate pairs against the exact >=0.5 Jaccard "
    "pairs — the measure-your-sketch readout that decides band/hash "
    "counts before a corpus-wide dedup run; both pipelines share one "
    "shingle pass, the comparison join is pair-scale, output is one "
    "row",
)
def x144_minhash_quality(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.dedup import (
        minhash_lsh_pairs_md5,
        ngram_jaccard_pairs,
    )

    docs = T(spark, sf, "documents")
    exact = ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b")
    cand = minhash_lsh_pairs_md5(docs).select("id_a", "id_b")
    hit = cand.join(exact, ["id_a", "id_b"]).agg(F.count("*").alias("n_hit"))
    nc = cand.agg(F.count("*").alias("n_cand"))
    ne = exact.agg(F.count("*").alias("n_exact"))
    out = nc.crossJoin(ne).crossJoin(hit)
    return out.select(
        "n_cand",
        "n_exact",
        "n_hit",
        F.when(
            F.col("n_cand") > 0,
            portable_round(F.col("n_hit").cast("double") / F.col("n_cand"), 6),
        )
        .otherwise(F.lit(1.0))
        .alias("precision_"),
        F.when(
            F.col("n_exact") > 0,
            portable_round(F.col("n_hit").cast("double") / F.col("n_exact"), 6),
        )
        .otherwise(F.lit(1.0))
        .alias("recall_"),
    )


# ---------------------------------------------------------------------------
# x145 — per-segment ROC AUC
# ---------------------------------------------------------------------------


@probe(
    "x145_group_auc",
    sql="""
        WITH s AS (
            SELECT o_orderpriority AS grp,
                   CAST(floor(o_totalprice / 1000) AS BIGINT) AS sc,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
        ),
        v AS (SELECT grp, sc, count(*) AS n, sum(y) AS np
              FROM s GROUP BY grp, sc),
        r AS (
            SELECT grp, sc, n, np,
                   coalesce(sum(n) OVER (PARTITION BY grp ORDER BY sc
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cb
            FROM v
        ),
        t AS (
            SELECT grp, sum(np * (2 * cb + n + 1)) AS rp2,
                   sum(np) AS npos, sum(n - np) AS nneg
            FROM r GROUP BY grp
        )
        SELECT grp, CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
               CASE WHEN npos > 0 AND nneg > 0
                    THEN floor(((rp2 - npos * (npos + 1))
                                / (2.0 * npos * nneg)) * 1000000 + 0.5)
                         / 1000000 END AS auc
        FROM t
    """,
    note="per-segment ROC AUC (metrics.roc_auc_by): does the model "
    "discriminate uniformly across slices — the fairness/debug "
    "readout after x106's global number. DECIMAL(38,0) half-rank "
    "units (a single segment can pass 1e9 rows at the design point); "
    "the rank window is partitioned by segment but runs over the "
    "(segment, score) AGGREGATE, so partitions are score-cardinality "
    "not corpus-cardinality; one-class segments yield NULL, never a "
    "divide-by-zero",
)
def x145_group_auc(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.metrics import roc_auc_by

    s = T(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("sc"),
        (F.col("o_orderstatus") == "F").cast("bigint").alias("y"),
    )
    return roc_auc_by(s, "grp", "sc", "y")


# ---------------------------------------------------------------------------
# x146 — dataset card (one-row corpus profile)
# ---------------------------------------------------------------------------


@probe(
    "x146_dataset_card",
    sql=r"""
        WITH base AS (
            SELECT doc_id, text, lang, source, n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                       AS n_tokens,
                   md5(text) AS h
            FROM documents
        ),
        lc AS (SELECT lang, count(*) AS n FROM base GROUP BY lang),
        lt AS (SELECT sum(n) AS total FROM lc),
        ent AS (
            SELECT floor(-sum((n / total) * ln(n / total)) * 10000.0 + 0.5)
                       / 10000.0 AS lang_entropy
            FROM lc CROSS JOIN lt
        ),
        agg AS (
            SELECT count(*) AS n_docs,
                   count(DISTINCT source) AS n_sources,
                   count(DISTINCT lang) AS n_langs,
                   sum(n_tokens) AS total_tokens,
                   floor((1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*))
                         * 1000000.0 + 0.5) / 1000000.0 AS dup_rate,
                   floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 10000.0
                         + 0.5) / 10000.0 AS avg_chars
            FROM base
        )
        SELECT n_docs, n_sources, n_langs, total_tokens, dup_rate,
               avg_chars, lang_entropy
        FROM agg CROSS JOIN ent
    """,
    note="dataset card: the one-row corpus profile a data release "
    "ships (docs/sources/langs, token total, exact-dup rate via "
    "content-hash distinct, average length, language entropy) — one "
    "scan plus a language-cardinality histogram; every number "
    "integer-exact except the 1e-4-rounded entropy (x64 recipe)",
)
def x146_dataset_card(spark: SparkSession, sf: str) -> DataFrame:
    base = T(spark, sf, "documents").select(
        "lang",
        "source",
        "n_chars",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        F.md5("text").alias("h"),
    )
    lc = base.groupBy("lang").agg(F.count("*").alias("n"))
    p = F.col("n") / F.sum("n").over(bounded_total("lang"))
    ent = lc.select(p.alias("_p")).agg(
        portable_round(-F.sum(F.col("_p") * F.log("_p"))).alias("lang_entropy")
    )
    agg = base.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tokens").alias("total_tokens"),
        portable_round(
            F.lit(1.0) - F.countDistinct("h").cast("double") / F.count("*"), 6
        ).alias("dup_rate"),
        portable_round(F.sum("n_chars").cast("double") / F.count("*")).alias(
            "avg_chars"
        ),
    )
    return agg.crossJoin(F.broadcast(ent)).select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_tokens",
        "dup_rate",
        "avg_chars",
        "lang_entropy",
    )


# ---------------------------------------------------------------------------
# x147 — audio frame-energy VAD (multimodal, rows-only check)
# ---------------------------------------------------------------------------


@probe(
    "x147_audio_vad",
    sql=None,
    note="audio voice-activity segmentation over mapInPandas (int16 PCM "
    "payload in, per-clip voiced-frame stats out); deterministic FAKS "
    "codec — real audio decoders are a clearly-marked seam "
    "(operators/multimodal.py). Not SQL-expressible (binary decode); "
    "unit-tested vs numpy in tests/.",
)
def x147_audio_vad(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        frame_energy_vad,
        synthesize_audio,
    )

    return frame_energy_vad(synthesize_audio(spark, n=32)).orderBy("media_id")


# ---------------------------------------------------------------------------
# x148 — exact quantile normalization (per-type values -> global
# reference distribution), with NO single-partition sort anywhere
# ---------------------------------------------------------------------------


@probe(
    "x148_quantile_normalize",
    sql="""
        WITH ev AS (SELECT event_id, event_type, value FROM events),
        ns AS (SELECT event_type, count(*) AS n_s FROM ev GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM ev),
        r AS (
            SELECT event_id, event_type, value,
                   row_number() OVER (PARTITION BY event_type
                       ORDER BY value, event_id) AS rs
            FROM ev
        ),
        g AS (
            SELECT value AS gv,
                   row_number() OVER (ORDER BY value, event_id) AS rg
            FROM ev
        ),
        px AS (
            SELECT r.event_id, r.event_type,
                   ((rs - 0.5) / n_s) * (n - 1) + 1 AS pos, n
            FROM r JOIN ns USING (event_type) CROSS JOIN nn
        ),
        k AS (
            SELECT event_id, event_type, pos,
                   CAST(floor(pos) AS BIGINT) AS k0,
                   least(CAST(floor(pos) AS BIGINT) + 1, n) AS k1
            FROM px
        )
        SELECT k.event_id, k.event_type,
               floor((g0.gv + (g1.gv - g0.gv) * (pos - floor(pos)))
                     * 1000000.0 + 0.5) / 1000000.0 AS norm_value
        FROM k
        JOIN g g0 ON g0.rg = k.k0
        JOIN g g1 ON g1.rg = k.k1
    """,
    note="exact quantile normalization (map every per-type value onto "
    "the global reference distribution at its within-type relative "
    "rank — the batch-effect/source-alignment transform): the oracle "
    "uses plain global windows; the Spark plan computes BOTH rankings "
    "with the x121 bucket decomposition (range-bucket counts -> "
    "metadata-scale offset window -> per-bucket row_number), so "
    "nothing ever funnels through one partition — then two "
    "co-partitioned integer-rank joins interpolate the target value. "
    "All position math is one fixed IEEE expression on exact integer "
    "ranks, rounded at 1e-6",
)
def x148_quantile_normalize(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events").select("event_id", "event_type", "value")
    bucket = F.floor(F.col("value") / 10).cast("bigint")
    b = ev.withColumn("bkt", bucket)

    # global exact rank by (value, event_id): per-bucket offsets
    # (metadata scale) + within-bucket row_number — no global sort
    gcounts = b.groupBy("bkt").agg(F.count("*").alias("cnt"))
    w_goff = bounded_window("bkt").rowsBetween(Window.unboundedPreceding, -1)
    goff = gcounts.select(
        "bkt", F.coalesce(F.sum("cnt").over(w_goff), F.lit(0)).alias("goff")
    )
    w_gin = Window.partitionBy("bkt").orderBy("value", "event_id")
    g = (
        b.withColumn("grn", F.row_number().over(w_gin))
        .join(F.broadcast(goff), "bkt")
        .select(
            F.col("value").alias("gv"),
            (F.col("goff") + F.col("grn")).alias("rg"),
        )
    )

    # per-type exact rank, same decomposition keyed by (type, bucket)
    tcounts = b.groupBy("event_type", "bkt").agg(F.count("*").alias("cnt"))
    w_toff = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toff = tcounts.select(
        "event_type",
        "bkt",
        F.coalesce(F.sum("cnt").over(w_toff), F.lit(0)).alias("toff"),
    )
    w_tin = Window.partitionBy("event_type", "bkt").orderBy("value", "event_id")
    r = (
        b.withColumn("trn", F.row_number().over(w_tin))
        .join(F.broadcast(toff), ["event_type", "bkt"])
        .select(
            "event_id", "event_type", (F.col("toff") + F.col("trn")).alias("rs")
        )
    )

    ns = ev.groupBy("event_type").agg(F.count("*").alias("n_s"))
    nn = ev.agg(F.count("*").alias("n"))
    pos = ((F.col("rs") - F.lit(0.5)) / F.col("n_s")) * (
        F.col("n") - F.lit(1)
    ) + F.lit(1)
    k = (
        r.join(F.broadcast(ns), "event_type")
        .crossJoin(F.broadcast(nn))
        .select(
            "event_id",
            "event_type",
            pos.alias("pos"),
            F.floor(pos).cast("bigint").alias("k0"),
            F.least(F.floor(pos).cast("bigint") + 1, F.col("n")).alias("k1"),
        )
    )
    g0 = g.select(F.col("rg").alias("k0"), F.col("gv").alias("v0"))
    g1 = g.select(F.col("rg").alias("k1"), F.col("gv").alias("v1"))
    out = k.join(g0, "k0").join(g1, "k1")
    norm = F.col("v0") + (F.col("v1") - F.col("v0")) * (
        F.col("pos") - F.floor(F.col("pos"))
    )
    return out.select(
        "event_id", "event_type", portable_round(norm, 6).alias("norm_value")
    )


# ---------------------------------------------------------------------------
# x149 — exact weighted median per group
# ---------------------------------------------------------------------------


@probe(
    "x149_weighted_median",
    sql="""
        WITH w AS (
            SELECT l_returnflag AS grp, l_quantity AS v,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS wt
            FROM lineitem
        ),
        g AS (SELECT grp, v, sum(wt) AS wt FROM w GROUP BY grp, v),
        c AS (
            SELECT grp, v, wt,
                   sum(wt) OVER (PARTITION BY grp ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cw,
                   sum(wt) OVER (PARTITION BY grp) AS tw
            FROM g
        )
        SELECT grp, min(v) AS weighted_median
        FROM c WHERE cw * 2 >= tw
        GROUP BY grp
    """,
    note="exact weighted median per group (price-cents weights — "
    "all-integer cumulative state, so the >= half-total cut is "
    "engine-portable with no rounding): the per-(group, value) "
    "aggregate collapses the corpus BEFORE the window, so window "
    "partitions are value-cardinality; the lower-weighted-median "
    "definition (first v with 2*cumw >= total)",
)
def x149_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    w = T(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").alias("v"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("wt"),
    )
    g = w.groupBy("grp", "v").agg(F.sum("wt").alias("wt"))
    wc = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt_tot = Window.partitionBy("grp")
    c = g.select(
        "grp",
        "v",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wt_tot).alias("tw"),
    )
    return (
        c.where(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("grp")
        .agg(F.min("v").alias("weighted_median"))
    )


# ---------------------------------------------------------------------------
# x150 — word2vec-style frequent-word subsampling
# ---------------------------------------------------------------------------


@probe(
    "x150_word_subsample",
    sql=r"""
        WITH toks AS (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents WHERE trim(text) <> ''
        ),
        f AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
        t AS (SELECT sum(n) AS total FROM f),
        keep AS (
            SELECT w, n,
                   least(sqrt(0.001 / (CAST(n AS DOUBLE) / total)), 1.0)
                       AS p_keep
            FROM f CROSS JOIN t
        )
        SELECT w,
               n AS n_before,
               CAST(floor(n * p_keep + 0.5) AS BIGINT) AS n_after_expected,
               floor(p_keep * 1000000.0 + 0.5) / 1000000.0 AS p_keep_r
        FROM keep
        ORDER BY n DESC, w
        LIMIT 30
    """,
    note="word2vec frequent-word subsampling plan: p_keep = "
    "min(sqrt(t/f(w)), 1) with t=1e-3 (Mikolov's rule; sqrt and one "
    "division — portable IEEE), reported for the 30 most frequent "
    "words with the expected retained count. The actual drop is a "
    "deterministic md5(doc:pos) < p_keep map-side filter (x120's "
    "machinery) — retry-stable, no rand()",
)
def x150_word_subsample(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    toks = (
        T(spark, sf, "documents")
        .where(F.trim(F.col("text")) != "")
        .select(F.explode(tokens(F.col("text"))).alias("w"))
    )
    f = toks.groupBy("w").agg(F.count("*").alias("n"))
    t = f.agg(F.sum("n").alias("total"))
    p_keep = F.least(
        F.sqrt(F.lit(0.001) / (F.col("n").cast("double") / F.col("total"))),
        F.lit(1.0),
    )
    keep = f.crossJoin(F.broadcast(t)).select(
        "w",
        F.col("n").alias("n_before"),
        F.floor(F.col("n") * p_keep + F.lit(0.5))
        .cast("bigint")
        .alias("n_after_expected"),
        portable_round(p_keep, 6).alias("p_keep_r"),
    )
    return keep.orderBy(F.desc("n_before"), F.asc("w")).limit(30)


# ---------------------------------------------------------------------------
# x151 — classifier threshold sweep (precision/recall curve points)
# ---------------------------------------------------------------------------


@probe(
    "x151_threshold_sweep",
    sql="""
        WITH s AS (
            SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 1000000
                       AS ppm,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
        ),
        th AS (SELECT unnest(range(1, 10)) AS k),
        c AS (
            SELECT k,
                   sum(CASE WHEN ppm >= k * 100000 THEN y ELSE 0 END) AS tp,
                   sum(CASE WHEN ppm >= k * 100000 THEN 1 - y ELSE 0 END)
                       AS fp,
                   sum(CASE WHEN ppm < k * 100000 THEN y ELSE 0 END) AS fn
            FROM s CROSS JOIN th
            GROUP BY k
        )
        SELECT CAST(k AS BIGINT) AS k, tp, fp, fn,
               CASE WHEN tp + fp > 0
                    THEN floor(CAST(tp AS DOUBLE) / (tp + fp) * 1000000.0
                               + 0.5) / 1000000.0 END AS precision_,
               CASE WHEN tp + fn > 0
                    THEN floor(CAST(tp AS DOUBLE) / (tp + fn) * 1000000.0
                               + 0.5) / 1000000.0 END AS recall_
        FROM c
    """,
    note="classifier threshold sweep: confusion counts and "
    "precision/recall at 9 operating points in ONE corpus pass (the "
    "9-way threshold grid is a constant-width crossJoin, integer "
    "counts, divisions only at the end) — the curve a release uses "
    "to pick the quality-filter cutoff; complements x106 (AUC "
    "integrates this curve) and x107 (calibration)",
)
def x151_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    s = T(spark, sf, "orders").select(
        (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint") % 1000000)
        .alias("ppm"),
        (F.col("o_orderstatus") == "F").cast("bigint").alias("y"),
    )
    th = s.sparkSession.range(1, 10).select(F.col("id").alias("k"))
    gate = F.col("ppm") >= F.col("k") * 100000
    c = (
        s.crossJoin(F.broadcast(th))
        .groupBy("k")
        .agg(
            F.sum(F.when(gate, F.col("y")).otherwise(0)).alias("tp"),
            F.sum(F.when(gate, 1 - F.col("y")).otherwise(0)).alias("fp"),
            F.sum(F.when(~gate, F.col("y")).otherwise(0)).alias("fn"),
        )
    )
    return c.select(
        F.col("k").cast("bigint").alias("k"),
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            portable_round(
                F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6
            ),
        ).alias("precision_"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            portable_round(
                F.col("tp").cast("double") / (F.col("tp") + F.col("fn")), 6
            ),
        ).alias("recall_"),
    )
