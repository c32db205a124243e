"""Round-8 probes: supervised predictability (Naive Bayes), rule
mining, link analysis (HITS), conformal calibration, categorical
independence testing, and sequential A/B decisions — each backed by a
reusable operator module and an engine-portable DuckDB oracle.

These round out the model-adjacent surface of the training-data
engine: NB answers "is this label leakably predictable from these
columns?", association rules mine template/item co-occurrence
structure, HITS complements PageRank with the bipartite
hub/authority readout, split conformal turns any point predictor into
a coverage-guaranteed interval (the quality-score gate), chi-square
tests label-mix independence across cohorts, and Wald's SPRT is the
early-stopping A/B gate replayed over the event stream.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.probes.registry import T, probe

# ---------------------------------------------------------------------------
# x180 — categorical Naive Bayes: train, score, confusion matrix
# ---------------------------------------------------------------------------

_NB_SQL = """
    WITH base AS (
        SELECT CAST(l_orderkey AS VARCHAR) || '-'
                   || CAST(l_linenumber AS VARCHAR) AS k,
               l_returnflag AS lbl,
               l_linestatus AS f_linestatus,
               CAST(CAST(year(l_shipdate) AS BIGINT) AS VARCHAR) AS f_ship_year,
               CAST(CAST(month(l_shipdate) AS BIGINT) AS VARCHAR) AS f_ship_month,
               CAST(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS VARCHAR)
                   AS f_disc_bin,
               substr(md5('nb:' || CAST(l_orderkey AS VARCHAR) || '-'
                          || CAST(l_linenumber AS VARCHAR)), 1, 4) < '4000'
                   AS is_test
        FROM lineitem
    ),
    lng AS (
        SELECT k, lbl, is_test, 'disc_bin' AS f, f_disc_bin AS v FROM base
        UNION ALL SELECT k, lbl, is_test, 'linestatus', f_linestatus FROM base
        UNION ALL SELECT k, lbl, is_test, 'ship_month', f_ship_month FROM base
        UNION ALL SELECT k, lbl, is_test, 'ship_year', f_ship_year FROM base
    ),
    cls AS (SELECT lbl, count(*) AS n_c FROM base WHERE NOT is_test
            GROUP BY lbl),
    ntr AS (SELECT sum(n_c) AS n_train FROM cls),
    cnts AS (SELECT lbl, f, v, count(*) AS cnt FROM lng WHERE NOT is_test
             GROUP BY 1, 2, 3),
    vocab AS (SELECT f, count(DISTINCT v) AS vv FROM cnts GROUP BY f),
    model AS (
        SELECT lbl, f, v,
               floor(ln((cnt + 1.0) / (n_c + 1.0 * vv)) * 1e9 + 0.5) / 1e9 AS ll
        FROM cnts JOIN cls USING (lbl) JOIN vocab USING (f)
    ),
    dflt AS (
        SELECT lbl, f,
               floor(ln(1.0 / (n_c + 1.0 * vv)) * 1e9 + 0.5) / 1e9 AS ll0
        FROM cls CROSS JOIN vocab
    ),
    prior AS (
        SELECT lbl AS cl,
               floor(ln(CAST(n_c AS DOUBLE) / n_train) * 1e9 + 0.5) / 1e9 AS pr
        FROM cls CROSS JOIN ntr
    ),
    sc AS (
        SELECT t.k, c.lbl AS cl, sum(coalesce(m.ll, d.ll0)) AS sll
        FROM (SELECT k, f, v FROM lng WHERE is_test) t
        CROSS JOIN (SELECT lbl FROM cls) c
        LEFT JOIN model m ON m.lbl = c.lbl AND m.f = t.f AND m.v = t.v
        JOIN dflt d ON d.lbl = c.lbl AND d.f = t.f
        GROUP BY t.k, c.lbl
    ),
    scored AS (
        SELECT k, cl, floor((pr + sll) * 1e6 + 0.5) / 1e6 AS score
        FROM sc JOIN prior USING (cl)
    ),
    prd AS (
        SELECT k, cl AS predicted,
               row_number() OVER (PARTITION BY k
                   ORDER BY score DESC, cl) AS rk
        FROM scored
    )
    SELECT b.lbl AS actual, p.predicted, count(*) AS n
    FROM base b JOIN prd p ON b.k = p.k AND p.rk = 1
    WHERE b.is_test
    GROUP BY 1, 2
"""


@probe(
    "x180_naive_bayes",
    sql=_NB_SQL,
    note="categorical Naive Bayes trained on the md5 75% fold, scored "
    "on the held-out 25%, reported as the integer confusion matrix "
    "(operators/bayes.py:naive_bayes_confusion): the cheap supervised "
    "predictability probe — is l_returnflag leakably predictable from "
    "(linestatus, ship year/month, discount bin)? Model = one "
    "partial-aggregating shuffle over the unpivoted train fold, "
    "vocabulary-scale and broadcast for scoring; Laplace alpha=1 "
    "default handles unseen values; log-likelihoods quantized at 1e-9 "
    "pre-sum, scores at 1e-6 pre-argmax with a class tiebreak, so "
    "predictions reproduce across engines; output all-integer",
)
def x180_naive_bayes(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.bayes import naive_bayes_confusion

    li = T(spark, sf, "lineitem")
    return naive_bayes_confusion(
        li,
        key=F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")),
        label=F.col("l_returnflag"),
        features={
            "linestatus": F.col("l_linestatus"),
            "ship_year": F.year("l_shipdate").cast("bigint"),
            "ship_month": F.month("l_shipdate").cast("bigint"),
            "disc_bin": F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint"),
        },
        alpha=1.0,
        test_frac=0.25,
    )


# ---------------------------------------------------------------------------
# x181 — association rules (support / confidence / lift)
# ---------------------------------------------------------------------------


@probe(
    "x181_assoc_rules",
    sql="""
        WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                   FROM lineitem),
        nb AS (SELECT count(DISTINCT bk) AS n_baskets FROM b),
        itn AS (SELECT it, count(*) AS n_item FROM b GROUP BY it),
        und AS (SELECT x.it AS u, y.it AS v, count(*) AS n_ab
                FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
                GROUP BY 1, 2 HAVING count(*) >= 3),
        d AS (SELECT u AS a, v AS c, n_ab FROM und
              UNION ALL SELECT v, u, n_ab FROM und),
        r AS (
            SELECT a AS antecedent, c AS consequent,
                   CAST(n_ab AS BIGINT) AS n_ab,
                   floor(n_ab / CAST(n_baskets AS DOUBLE) * 1e6 + 0.5) / 1e6
                       AS support,
                   floor(n_ab / CAST(na.n_item AS DOUBLE) * 1e6 + 0.5) / 1e6
                       AS confidence,
                   floor((n_ab * n_baskets)
                         / CAST(na.n_item * nc.n_item AS DOUBLE)
                         * 1e6 + 0.5) / 1e6 AS lift
            FROM d JOIN itn na ON na.it = d.a
                   JOIN itn nc ON nc.it = d.c
            CROSS JOIN nb
        )
        SELECT * FROM r
        ORDER BY lift DESC, confidence DESC, antecedent, consequent
        LIMIT 20
    """,
    note="directed association rules A -> B over part baskets "
    "(operators/recsys.py:association_rules): basket-distinct support, "
    "confidence = P(B|A), lift = P(B|A)/P(B) by exact integer "
    "cross-multiplication; pair counting is the cooccur selfjoin shape "
    "(same measured crossover to the basket-list twin applies); final "
    "top-20 is ORDER BY+LIMIT (TakeOrderedAndProject) on the rounded "
    "(lift, confidence) with a full key tiebreak",
)
def x181_assoc_rules(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.recsys import association_rules

    li = T(spark, sf, "lineitem")
    return association_rules(
        li,
        "l_orderkey",
        "l_partkey",
        min_pair_support=3,
        top_n=20,
        plan="auto",
        stats_key=sf,
    )


# ---------------------------------------------------------------------------
# x182 — HITS hubs and authorities
# ---------------------------------------------------------------------------


def _hits_sql(iterations: int = 4) -> str:
    parts = [
        """
        WITH e AS MATERIALIZED (
            SELECT DISTINCT l_partkey AS u, l_suppkey AS v FROM lineitem
        ),
        a0 AS (SELECT DISTINCT v AS node, CAST(1.0 AS DOUBLE) AS score
               FROM e)"""
    ]
    prev_a = "a0"
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        h{i}r AS MATERIALIZED (
            SELECT e.u AS node,
                   floor(sum(a.score) * 1e10 + 0.5) / 1e10 AS raw
            FROM e JOIN {prev_a} a ON e.v = a.node GROUP BY e.u
        ),
        h{i} AS MATERIALIZED (
            SELECT node, floor(raw / (SELECT sum(raw) FROM h{i}r)
                               * 1e10 + 0.5) / 1e10 AS score
            FROM h{i}r
        ),
        a{i}r AS MATERIALIZED (
            SELECT e.v AS node,
                   floor(sum(h.score) * 1e10 + 0.5) / 1e10 AS raw
            FROM e JOIN h{i} h ON e.u = h.node GROUP BY e.v
        ),
        a{i} AS MATERIALIZED (
            SELECT node, floor(raw / (SELECT sum(raw) FROM a{i}r)
                               * 1e10 + 0.5) / 1e10 AS score
            FROM a{i}r
        )"""
        )
        prev_a = f"a{i}"
    last = iterations
    parts.append(
        f"""
        SELECT * FROM (
            SELECT 'hub' AS kind, node, floor(score * 1e6 + 0.5) / 1e6 AS score
            FROM h{last} ORDER BY score DESC, node LIMIT 20)
        UNION ALL
        SELECT * FROM (
            SELECT 'authority' AS kind, node,
                   floor(score * 1e6 + 0.5) / 1e6 AS score
            FROM a{last} ORDER BY score DESC, node LIMIT 20)"""
    )
    return "".join(parts)


@probe(
    "x182_hits",
    sql=_hits_sql(),
    note="HITS hubs/authorities (Kleinberg 1999) over the part -> "
    "supplier procurement graph, 4 iterations "
    "(operators/graph.py:hits): the bipartite complement to PageRank "
    "— per round one shuffle join of the cached distinct edge list "
    "against a node-scale score table (broadcast under the node gate) "
    "plus a hash agg; L1 norms are 1-row aggregates crossJoined back; "
    "per-round 1e-10 half-up rounding (the pagerank recipe) makes the "
    "mutual-recursion fixpoint engine-portable; top-20 per role via "
    "ORDER BY+LIMIT, no windows",
)
def x182_hits(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.graph import hits

    li = T(spark, sf, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    return hits(li, iterations=4, top_n=20)


# ---------------------------------------------------------------------------
# x183 — split conformal prediction calibration
# ---------------------------------------------------------------------------


@probe(
    "x183_conformal",
    sql="""
        WITH base AS (
            SELECT CAST(o_orderkey AS VARCHAR) AS k, o_orderpriority AS g,
                   o_totalprice AS y,
                   substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) AS hb
            FROM orders
        ),
        f AS (SELECT k, g, y,
                     CASE WHEN hb < '4000' THEN 'cal'
                          WHEN hb < '8000' THEN 'test'
                          ELSE 'train' END AS fold
              FROM base),
        pred AS (SELECT g, floor(avg(y) * 1e6 + 0.5) / 1e6 AS p,
                        count(*) AS n_g
                 FROM f WHERE fold = 'train' GROUP BY g),
        ntr AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_train FROM pred),
        cal AS (SELECT k, floor(abs(y - p) * 1e6 + 0.5) / 1e6 AS r
                FROM f JOIN pred USING (g) WHERE fold = 'cal'),
        ncal AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
        rk AS (SELECT r, row_number() OVER (ORDER BY r, k) AS rn FROM cal),
        q AS (SELECT r AS qhat FROM rk CROSS JOIN ncal
              WHERE rn = least(CAST(ceil((n_cal + 1)
                                         * CAST(0.9 AS DOUBLE)) AS BIGINT),
                               n_cal)),
        tst AS (SELECT CASE WHEN floor(abs(y - p) * 1e6 + 0.5) / 1e6 <= qhat
                            THEN 1 ELSE 0 END AS cov, qhat
                FROM f JOIN pred USING (g) CROSS JOIN q WHERE fold = 'test')
        SELECT n_train, n_cal, CAST(count(*) AS BIGINT) AS n_test, qhat,
               floor(avg(CAST(cov AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS coverage,
               CAST(0.9 AS DOUBLE) AS target_coverage,
               floor(2.0 * qhat * 1e6 + 0.5) / 1e6 AS avg_width
        FROM tst CROSS JOIN ntr CROSS JOIN ncal
        GROUP BY n_train, n_cal, qhat
    """,
    note="split conformal prediction (operators/conformal.py:"
    "split_conformal; Angelopoulos & Bates 2021): md5 folds 50/25/25 "
    "train/cal/test, predictor = per-priority train mean (broadcast "
    "model table), qhat = the EXACT ceil((n+1)(1-alpha))-th order "
    "statistic of calibration residuals selected by global rank via "
    "plans/prefix.py:distributed_row_number (no single-partition sort "
    "at any fold size; the oracle's plain window is the semantic "
    "spec), then test-fold coverage vs the broadcast 1-row qhat — the "
    "distribution-free 'how wrong is the quality model' gate",
)
def x183_conformal(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.conformal import split_conformal

    od = T(spark, sf, "orders")
    return split_conformal(
        od,
        key=F.col("o_orderkey"),
        group=F.col("o_orderpriority"),
        y=F.col("o_totalprice"),
        alpha=0.1,
    )


# ---------------------------------------------------------------------------
# x184 — chi-square test of independence
# ---------------------------------------------------------------------------


@probe(
    "x184_chi2_independence",
    sql="""
        WITH obs AS (SELECT event_type AS a, user_id % 5 AS b,
                            count(*) AS o
                     FROM events GROUP BY 1, 2),
        ra AS (SELECT a, sum(o) AS na FROM obs GROUP BY a),
        cb AS (SELECT b, sum(o) AS nb FROM obs GROUP BY b),
        tot AS (SELECT sum(o) AS n FROM obs),
        grid AS (
            SELECT n,
                   floor((coalesce(o, 0) - (na * nb) / CAST(n AS DOUBLE))
                         * (coalesce(o, 0) - (na * nb) / CAST(n AS DOUBLE))
                         / ((na * nb) / CAST(n AS DOUBLE))
                         * 1e9 + 0.5) / 1e9 AS term
            FROM ra CROSS JOIN cb
            LEFT JOIN obs USING (a, b)
            CROSS JOIN tot
        ),
        ka AS (SELECT count(*) AS nka FROM ra),
        kb AS (SELECT count(*) AS nkb FROM cb),
        s AS (SELECT n, floor(sum(term) * 1e6 + 0.5) / 1e6 AS chi2
              FROM grid GROUP BY n)
        SELECT CAST(n AS BIGINT) AS n,
               CAST((nka - 1) * (nkb - 1) AS BIGINT) AS dof, chi2,
               CAST(26.296 AS DOUBLE) AS crit_05,
               CAST(chi2 <= CAST(26.296 AS DOUBLE) AS INT) AS independent
        FROM s CROSS JOIN ka CROSS JOIN kb
    """,
    note="Pearson chi-square independence test of event_type x "
    "(user_id mod 5) cohort (operators/drift.py:chi2_independence): "
    "the label-mix-shift screen — contingency table in one "
    "partial-aggregating shuffle, full grid (observed-zero cells "
    "included) from the category-scale marginal crossJoin, expected "
    "counts from exact integer products, per-cell terms quantized at "
    "1e-9 before the category²-sized sum; dof emitted so the "
    "caller-supplied 5% critical value (26.296 at dof=16) is "
    "auditable",
)
def x184_chi2_independence(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.drift import chi2_independence

    ev = T(spark, sf, "events").select(
        "event_type", (F.col("user_id") % 5).alias("cohort")
    )
    return chi2_independence(ev, "event_type", "cohort", crit_05=26.296)


# ---------------------------------------------------------------------------
# x185 — Wald SPRT sequential A/B decision
# ---------------------------------------------------------------------------

_SPRT_P0, _SPRT_P1 = 0.3, 0.2
_SPRT_ALPHA, _SPRT_BETA = 0.05, 0.2
_L1 = math.log(_SPRT_P1 / _SPRT_P0)
_L0 = math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))
_UPPER = math.log((1.0 - _SPRT_BETA) / _SPRT_ALPHA)
_LOWER = math.log(_SPRT_BETA / (1.0 - _SPRT_ALPHA))

_SPRT_SQL = f"""
    WITH s AS (SELECT event_id AS t,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
               FROM events),
    c AS (SELECT t, sum(x) OVER (ORDER BY t) AS s_t,
                 row_number() OVER (ORDER BY t) AS n_t
          FROM s),
    l AS (SELECT t, n_t, s_t,
                 s_t * ({_L1!r}) + (n_t - s_t) * ({_L0!r}) AS llr
          FROM c),
    st AS (SELECT min(n_t) AS n_stop FROM l
           WHERE llr >= {_UPPER!r} OR llr <= {_LOWER!r}),
    la AS (SELECT max(n_t) AS n_last FROM l)
    SELECT CASE WHEN llr >= {_UPPER!r} THEN 'accept_h1'
                WHEN llr <= {_LOWER!r} THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           CAST(n_t AS BIGINT) AS n_obs,
           CAST(s_t AS BIGINT) AS successes,
           floor(llr * 1e6 + 0.5) / 1e6 AS llr,
           floor({_LOWER!r} * 1e6 + 0.5) / 1e6 AS lower,
           floor({_UPPER!r} * 1e6 + 0.5) / 1e6 AS upper
    FROM l CROSS JOIN st CROSS JOIN la
    WHERE n_t = coalesce(n_stop, n_last)
"""


@probe(
    "x185_sprt",
    sql=_SPRT_SQL,
    note="Wald sequential probability ratio test (H0 purchase rate "
    "0.3 vs H1 0.2, alpha=0.05, beta=0.2) replayed over the event "
    "stream in event_id arrival order "
    "(operators/drift.py:sprt_bernoulli): the early-stopping A/B gate "
    "— cumulative successes/trials via plans/prefix.py distributed "
    "cumsum + row_number (bounded per-task state at any stream "
    "length; oracle windows are the semantic spec), LLR = s*L1 + "
    "(n-s)*L0 with L1/L0 injected as identical literals into both "
    "engines so the crossing row is engine-identical with no "
    "quantization at the decision boundary; output is the 1-row "
    "stopping state",
)
def x185_sprt(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.drift import sprt_bernoulli

    ev = T(spark, sf, "events").select(
        "event_id", (F.col("event_type") == "purchase").alias("is_purchase")
    )
    return sprt_bernoulli(
        ev,
        "event_id",
        F.col("is_purchase"),
        p0=_SPRT_P0,
        p1=_SPRT_P1,
        alpha=_SPRT_ALPHA,
        beta=_SPRT_BETA,
    )


# ---------------------------------------------------------------------------
# x186 — Adamic–Adar link prediction
# ---------------------------------------------------------------------------


@probe(
    "x186_adamic_adar",
    sql="""
        WITH e AS MATERIALIZED (
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2
        ),
        sym AS MATERIALIZED (
            SELECT u, v FROM e UNION ALL SELECT v, u FROM e
        ),
        deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u),
        wed AS (
            SELECT l.u AS a, r.u AS b, l.v AS w
            FROM sym l JOIN sym r ON l.v = r.v
            WHERE l.u < r.u
        ),
        term AS (
            SELECT wed.a AS u, wed.b AS v,
                   floor(1.0 / ln(CAST(d.deg AS DOUBLE)) * 1e9 + 0.5) / 1e9
                       AS t
            FROM wed JOIN deg d ON d.node = wed.w
        ),
        cand AS (
            SELECT term.u, term.v, term.t FROM term
            LEFT JOIN e ON e.u = term.u AND e.v = term.v
            WHERE e.u IS NULL
        ),
        sc AS (SELECT u, v, floor(sum(t) * 1e6 + 0.5) / 1e6 AS aa_score
               FROM cand GROUP BY u, v)
        SELECT * FROM sc ORDER BY aa_score DESC, u, v LIMIT 20
    """,
    note="Adamic-Adar link prediction over the part co-order graph "
    "(operators/graph.py:adamic_adar; same support>=2 edge base as "
    "x172): top-20 missing links by sum over common neighbors of "
    "1/ln(deg) — wedge join on the center (the triangle-enumeration "
    "shape), node-scale degree table broadcast, existing-edge "
    "anti-join, per-wedge terms quantized 1e-9 pre-sum; final cut is "
    "ORDER BY+LIMIT on (score, u, v) — the dedup-graph densification "
    "/ recommendation-candidate readout",
)
def x186_adamic_adar(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.graph import adamic_adar, grouped_pairs

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    # list-per-order positional emission == the < self-join's row-pair
    # multiset (n_x·n_y per order), after ONE exchange instead of two
    # (r10, the x112 pair-generation recipe)
    edges = (
        grouped_pairs(li, "l_orderkey", "l_partkey", distinct=False)
        .groupBy("u", "v")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") >= 2)
        .select("u", "v")
    )
    return adamic_adar(edges, src="u", dst="v", top_n=20)


# ---------------------------------------------------------------------------
# x187 — Poisson-bootstrap confidence intervals
# ---------------------------------------------------------------------------

_PB_W = "(CASE WHEN u >= 0.36787944117144233 THEN 1 ELSE 0 END) + (CASE WHEN u >= 0.7357588823428847 THEN 1 ELSE 0 END) + (CASE WHEN u >= 0.9196986029286058 THEN 1 ELSE 0 END) + (CASE WHEN u >= 0.9810118431238463 THEN 1 ELSE 0 END) + (CASE WHEN u >= 0.9963401531726563 THEN 1 ELSE 0 END) + (CASE WHEN u >= 0.9994058151824183 THEN 1 ELSE 0 END) + (CASE WHEN u >= 0.999916758850712 THEN 1 ELSE 0 END) + (CASE WHEN u >= 0.9999897508033253 THEN 1 ELSE 0 END)"

_PB_SQL = f"""
    WITH base AS (SELECT CAST(c_custkey AS VARCHAR) AS k, c_mktsegment AS g,
                         c_acctbal AS y
                  FROM customer),
    reps AS (
        SELECT g, gs.b AS b, y,
               CAST(('0x' || substr(md5('pb:' || k || ':'
                          || CAST(gs.b AS VARCHAR)), 1, 13)) AS BIGINT)
                   / power(16.0, 13) AS u
        FROM base CROSS JOIN generate_series(0, 63) gs(b)
    ),
    wts AS (SELECT g, b, y, {_PB_W} AS w FROM reps),
    rm AS (SELECT g, b, floor(sum(w * y) / sum(w) * 1e6 + 0.5) / 1e6 AS m
           FROM wts GROUP BY g, b),
    rk AS (SELECT g, m, row_number() OVER (PARTITION BY g ORDER BY m, b)
                   AS rk
           FROM rm),
    bounds AS (SELECT g, min(m) AS ci_lo, max(m) AS ci_hi
               FROM rk WHERE rk IN (2, 63) GROUP BY g),
    pt AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                  floor(avg(y) * 1e6 + 0.5) / 1e6 AS mean
           FROM base GROUP BY g)
    SELECT pt.g AS grp, n, mean, ci_lo, ci_hi
    FROM pt JOIN bounds ON pt.g = bounds.g
"""


@probe(
    "x187_poisson_bootstrap",
    sql=_PB_SQL,
    note="per-segment mean account balance with a 95% bootstrap CI via "
    "deterministic Poisson resampling (operators/sampling.py:"
    "poisson_bootstrap_ci; Chamandy et al. 2012 — the bootstrap that "
    "scales: no with-replacement draw, each row enters replicate b "
    "with weight ~ Poisson(1) from the md5-uniform of (key, b) pushed "
    "through literal inverse-CDF thresholds shared by both engines): "
    "one map-side explode by replicate (no shuffle), one (group, b) "
    "partial-aggregating shuffle of group x 64 weighted partials, a "
    "bounded 64-row window per group ranks replicate means for the "
    "percentile endpoints",
)
def x187_poisson_bootstrap(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sampling import poisson_bootstrap_ci

    cust = T(spark, sf, "customer")
    return poisson_bootstrap_ci(
        cust,
        key=F.col("c_custkey"),
        group=F.col("c_mktsegment"),
        y=F.col("c_acctbal"),
        n_replicates=64,
        ci=0.95,
        seed_tag="pb",
    )


# ---------------------------------------------------------------------------
# x188 — CUPED variance-reduced A/B readout
# ---------------------------------------------------------------------------


@probe(
    "x188_cuped",
    sql="""
        WITH pc AS (
            SELECT o_custkey AS k,
                   sum(CASE WHEN o_orderdate < DATE '1996-01-01'
                            THEN 1 ELSE 0 END) AS x,
                   sum(CASE WHEN o_orderdate >= DATE '1996-01-01'
                            THEN CAST(floor(o_totalprice * 100 + 0.5)
                                      AS BIGINT)
                            ELSE 0 END) AS yc
            FROM orders GROUP BY 1
        ),
        b AS (SELECT CASE WHEN substr(md5('cuped:' || CAST(k AS VARCHAR)),
                                      1, 4) < '8000'
                          THEN 'A' ELSE 'B' END AS arm,
                     CAST(x AS BIGINT) AS x, CAST(yc AS BIGINT) AS yc
              FROM pc),
        m AS (SELECT arm, count(*) AS n, sum(x) AS sx, sum(yc) AS sy,
                     sum(x * yc) AS sxy, sum(x * x) AS sxx,
                     sum(CAST(yc AS HUGEINT) * yc) AS syy
              FROM b GROUP BY arm),
        g AS (SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
                     sum(sxy) AS tsxy, sum(sxx) AS tsxx
              FROM m),
        gq AS (SELECT floor((tn * tsxy - tsx * tsy)
                            / CAST(tn * tsxx - tsx * tsx AS DOUBLE)
                            * 1e6 + 0.5) / 1e6 AS theta,
                      floor(tsx / CAST(tn AS DOUBLE) * 1e6 + 0.5) / 1e6
                          AS xbar
               FROM g)
        SELECT arm, CAST(n AS BIGINT) AS n,
               floor(sy / CAST(n AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6
                   AS mean_y,
               floor((sy / CAST(n AS DOUBLE)
                      - theta * (sx / CAST(n AS DOUBLE) - xbar)) / 100.0
                     * 1e6 + 0.5) / 1e6 AS mean_y_cuped,
               floor((CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                      - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                     / 10000.0 * 1e4 + 0.5) / 1e4 AS var_y,
               floor((CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                      - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE))
                      - 2.0 * theta
                        * (sxy / CAST(n AS DOUBLE)
                           - (sx / CAST(n AS DOUBLE))
                             * (sy / CAST(n AS DOUBLE)))
                      + theta * theta
                        * (sxx / CAST(n AS DOUBLE)
                           - (sx / CAST(n AS DOUBLE))
                             * (sx / CAST(n AS DOUBLE))))
                     / 10000.0 * 1e4 + 0.5) / 1e4 AS var_y_cuped,
               floor((1.0
                      - (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                         - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE))
                         - 2.0 * theta
                           * (sxy / CAST(n AS DOUBLE)
                              - (sx / CAST(n AS DOUBLE))
                                * (sy / CAST(n AS DOUBLE)))
                         + theta * theta
                           * (sxx / CAST(n AS DOUBLE)
                              - (sx / CAST(n AS DOUBLE))
                                * (sx / CAST(n AS DOUBLE))))
                        / (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                           - (sy / CAST(n AS DOUBLE))
                             * (sy / CAST(n AS DOUBLE))))
                     * 100.0 * 1e4 + 0.5) / 1e4 AS var_reduction_pct
        FROM m CROSS JOIN gq
    """,
    note="CUPED variance-reduced A/B readout (operators/metrics.py:"
    "cuped_ab; Deng et al. WSDM'13): covariate = pre-1996 order count, "
    "metric = post-1996 spend in integer cents, arms by md5(custkey) — "
    "EVERY moment is an exact integer aggregate (sum y² in "
    "DECIMAL(38,0)/HUGEINT, the x168 recipe: ~5e19 exceeds int64), "
    "theta/means/variances are fixed arithmetic over those integers "
    "quantized once at the end, adjusted rows never materialized "
    "(var(y') from the moment identity) — no float summation anywhere, "
    "so the readout is partitioning- and engine-exact",
)
def x188_cuped(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.metrics import cuped_ab

    od = T(spark, sf, "orders")
    pc = od.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(
            (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
            .cast("bigint")
        ).alias("x"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"),
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"),
            ).otherwise(F.lit(0))
        ).alias("yc"),
    )
    return cuped_ab(
        pc,
        key=F.col("k"),
        x=F.col("x"),
        y=F.col("yc") / 100.0,
        arm_frac=0.5,
        seed_tag="cuped",
    )


# ---------------------------------------------------------------------------
# x189 — mutual information between categorical columns
# ---------------------------------------------------------------------------


@probe(
    "x189_mutual_info",
    sql="""
        WITH obs AS (SELECT event_type AS a, user_id % 5 AS b,
                            count(*) AS o
                     FROM events GROUP BY 1, 2),
        ra AS (SELECT a, sum(o) AS na FROM obs GROUP BY a),
        cb AS (SELECT b, sum(o) AS nb FROM obs GROUP BY b),
        tot AS (SELECT sum(o) AS n FROM obs),
        mi AS (
            SELECT n,
                   floor(sum(floor((o / CAST(n AS DOUBLE))
                                   * ln((o * n) / CAST(na * nb AS DOUBLE))
                                   * 1e9 + 0.5) / 1e9) * 1e6 + 0.5) / 1e6
                       AS mi
            FROM obs JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
            GROUP BY n
        ),
        ha AS (
            SELECT floor(sum(floor(-(na / CAST(n AS DOUBLE))
                                   * ln(na / CAST(n AS DOUBLE))
                                   * 1e9 + 0.5) / 1e9) * 1e6 + 0.5) / 1e6
                       AS h_a
            FROM ra CROSS JOIN tot
        ),
        hb AS (
            SELECT floor(sum(floor(-(nb / CAST(n AS DOUBLE))
                                   * ln(nb / CAST(n AS DOUBLE))
                                   * 1e9 + 0.5) / 1e9) * 1e6 + 0.5) / 1e6
                       AS h_b
            FROM cb CROSS JOIN tot
        )
        SELECT CAST(n AS BIGINT) AS n, mi, h_a, h_b,
               floor(mi / sqrt(h_a * h_b) * 1e6 + 0.5) / 1e6 AS nmi
        FROM mi CROSS JOIN ha CROSS JOIN hb
    """,
    note="mutual information + marginal entropies + sqrt-normalized "
    "NMI of event_type x (user_id mod 5) "
    "(operators/drift.py:mutual_info): the information-theoretic twin "
    "of x184 on the same contingency shuffle — only observed cells "
    "contribute (0 ln 0 = 0, no zero-cell grid), exact integer count "
    "products, 1e-9 per-cell quantization under category²-bounded "
    "sums; MI ranks feature relevance where chi-square only tests a "
    "hypothesis",
)
def x189_mutual_info(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.drift import mutual_info

    ev = T(spark, sf, "events").select(
        "event_type", (F.col("user_id") % 5).alias("cohort")
    )
    return mutual_info(ev, "event_type", "cohort")
