"""Round-9 probes: time-series diagnostics (ACF, Theil–Sen,
Mann–Kendall, lagged cross-correlation, mean-shift change-point),
itemset mining one level deeper (frequent triples), the l-diversity
and t-closeness privacy audits, corpus-distribution screens (Zipf
fit, Jensen–Shannon divergence, lexical diversity), the bias-baseline
recommender, Nelson–Aalen cumulative hazard, diff-in-diff A/B, and
the streaming windowed-JS drift monitor — each backed by a reusable
operator and an engine-portable DuckDB oracle.

The recurring scale move this round: every potentially-quadratic
estimator (Theil–Sen, Mann–Kendall) runs on a FIXED-BUDGET md5 sample
whose threshold is derived in-plan from the exact row count
(sampling.py:fixed_budget_sample), so pair stages stay constant-size
at any corpus scale; every order-sensitive float aggregate is
quantized to 1e-9 integer units and summed in BIGINT/DECIMAL(38,0)
(the x168 recipe), so results are engine- and partitioning-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.probes.registry import T, probe

# ---------------------------------------------------------------------------
# x190 — autocorrelation function of the daily event-volume series
# ---------------------------------------------------------------------------


@probe(
    "x190_acf",
    sql="""
        WITH s AS (
            SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
                   count(*) AS c
            FROM events GROUP BY 1
        ),
        g AS (SELECT count(*) AS n, sum(c) AS sc, sum(c * c) AS ss FROM s),
        p AS (
            SELECT gs.lag AS lag, count(*) AS n_pairs,
                   sum(a.c * b.c) AS sxy, sum(a.c) AS sh, sum(b.c) AS st
            FROM s a
            CROSS JOIN generate_series(1, 7) gs(lag)
            JOIN s b ON b.t = a.t + gs.lag
            GROUP BY 1
        )
        SELECT CAST(lag AS BIGINT) AS lag,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               floor((sxy - (sc / CAST(n AS DOUBLE)) * (sh + st)
                      + n_pairs * (sc / CAST(n AS DOUBLE))
                        * (sc / CAST(n AS DOUBLE)))
                     / (ss - n * (sc / CAST(n AS DOUBLE))
                             * (sc / CAST(n AS DOUBLE)))
                     * 1e6 + 0.5) / 1e6 AS acf
        FROM p CROSS JOIN g
    """,
    note="autocorrelation of the daily event-count series at lags 1-7 "
    "(operators/timeseries.py:autocorrelation): the seasonality/"
    "persistence diagnostic — fact rows roll up to a TIME-scale series "
    "in one shuffle, the lag pairing is a category-scale self-join on "
    "t+L, and every aggregate (S_xy, head/tail sums, S, SS) is an "
    "exact integer, the series mean entering once as fixed arithmetic "
    "— engine-exact at 1e-6 with no per-row float sums",
)
def x190_acf(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.timeseries import autocorrelation

    ev = T(spark, sf, "events")
    series = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .alias("t")
    ).agg(F.count("*").alias("c"))
    return autocorrelation(series, "t", "c", max_lag=7)


# ---------------------------------------------------------------------------
# x191 — Theil–Sen robust trend slope
# ---------------------------------------------------------------------------


@probe(
    "x191_theil_sen",
    sql="""
        WITH base AS (
            SELECT event_id AS k, floor(epoch(ts)) AS t, value AS v
            FROM events
        ),
        th AS (
            SELECT CAST(floor((300 * 65536 + count(*) - 1)
                              / CAST(count(*) AS DOUBLE)) AS BIGINT) AS tt
            FROM base
        ),
        s AS (
            SELECT k, t, v FROM base CROSS JOIN th
            WHERE tt >= 65536
               OR substr(md5('ts:' || CAST(k AS VARCHAR)), 1, 4)
                  < printf('%04x', tt)
        ),
        ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sample FROM s),
        sl AS (
            SELECT a.k AS ka, b.k AS kb,
                   floor((b.v - a.v) / (b.t - a.t) * 1e9 + 0.5) / 1e9 AS m
            FROM s a JOIN s b ON a.k < b.k
            WHERE b.t <> a.t
        ),
        np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM sl),
        rk AS (SELECT m, row_number() OVER (ORDER BY m, ka, kb) AS rn
               FROM sl),
        md AS (SELECT floor(avg(m) * 1e6 + 0.5) / 1e6 AS slope
               FROM rk CROSS JOIN np
               WHERE rn = floor((n_pairs + 1) / 2)
                  OR rn = floor(n_pairs / 2) + 1)
        SELECT n_sample, n_pairs, slope
        FROM ns CROSS JOIN np CROSS JOIN md
    """,
    note="Theil-Sen robust trend slope of event value over time "
    "(operators/timeseries.py:theil_sen_slope): median of pairwise "
    "slopes on a deterministic FIXED-BUDGET md5 sample (~300 points "
    "— the 16-bit threshold is derived in-plan from the exact row "
    "count, so the pair stage stays ~budget-squared at ANY corpus "
    "size; all-pairs is quadratic by definition and a few hundred "
    "points give a stable median, reproducible under retry/engine "
    "swap) — "
    "slopes quantized at 1e-9, the exact middle order statistic(s) "
    "selected by global rank via plans/prefix.py:"
    "distributed_row_number (oracle's plain window is the semantic "
    "spec); the 50%-breakdown drift-monitor slope one outlier batch "
    "cannot bend",
)
def x191_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.timeseries import theil_sen_slope

    ev = T(spark, sf, "events").select(
        "event_id",
        F.col("ts").cast("timestamp").cast("long").alias("t_sec"),
        "value",
    )
    return theil_sen_slope(
        ev, "t_sec", "value", sample_budget=300, seed_tag="ts",
        key_col="event_id",
    )


# ---------------------------------------------------------------------------
# x192 — frequent 3-itemsets
# ---------------------------------------------------------------------------


@probe(
    "x192_freq_triples",
    sql="""
        WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                   FROM lineitem),
        sz AS (SELECT bk FROM b GROUP BY bk
               HAVING count(*) BETWEEN 3 AND 64),
        bb AS (SELECT b.bk, b.it FROM b JOIN sz USING (bk)),
        t AS (
            SELECT x.it AS a, y.it AS b2, z.it AS c, count(*) AS n
            FROM bb x
            JOIN bb y ON x.bk = y.bk AND x.it < y.it
            JOIN bb z ON x.bk = z.bk AND y.bk = z.bk AND y.it < z.it
            GROUP BY 1, 2, 3
        )
        SELECT a AS item_a, b2 AS item_b, c AS item_c,
               CAST(n AS BIGINT) AS n_baskets
        FROM t
        ORDER BY n_baskets DESC, item_a, item_b, item_c
        LIMIT 20
    """,
    note="frequent 3-itemsets (top-20 by support desc, items) — one "
    "level past the x113/x181 pair surface "
    "(operators/recsys.py:frequent_triples): basket-list plan ONLY "
    "(collect sorted distinct items in ONE shuffle, emit C(k,3) "
    "triples map-side — a 3-way fact self-join is never the right "
    "shape); baskets past 64 items are dropped BEFORE expansion (the "
    "k-cubed itemset-mining guard, explicit rather than silent); "
    "exact integer counts, ORDER BY+LIMIT cut; oracle replays via "
    "the 3-way join on the small distinct table (with the redundant "
    "y.bk = z.bk equality spelled out — without it the optimizer "
    "join-orders (y,z) first on the bare inequality, a quadratic "
    "merge join)",
)
def x192_freq_triples(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.recsys import frequent_triples

    li = T(spark, sf, "lineitem")
    # min_support=1 at the probe level: partkey triples rarely repeat
    # at sf0.1 and a 0-row gate row checks nothing — the top-20 cut is
    # deterministic either way (support desc, then items)
    return frequent_triples(
        li,
        "l_orderkey",
        "l_partkey",
        min_support=1,
        top_n=20,
        max_basket=64,
        stats_key=sf,
    )


# ---------------------------------------------------------------------------
# x193 — l-diversity privacy audit
# ---------------------------------------------------------------------------


@probe(
    "x193_l_diversity",
    sql="""
        WITH ig AS (
            SELECT c_nationkey AS q0,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS q1,
                   c_mktsegment AS s, count(*) AS n
            FROM customer GROUP BY 1, 2, 3
        ),
        cls AS (SELECT q0, q1, sum(n) AS rws, count(*) AS ndist
                FROM ig GROUP BY 1, 2),
        ls AS (SELECT CAST(unnest([2, 3]) AS BIGINT) AS l)
        SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(CASE WHEN ndist < l THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating_classes,
               CAST(sum(CASE WHEN ndist < l THEN rws ELSE 0 END) AS BIGINT)
                   AS rows_at_risk,
               floor(sum(CASE WHEN ndist < l THEN rws ELSE 0 END)
                     / CAST(sum(rws) AS DOUBLE) * 1e6 + 0.5) / 1e6
                   AS at_risk_rate
        FROM cls CROSS JOIN ls GROUP BY l
    """,
    note="l-diversity audit over QI = (nation, $1000-acctbal band), "
    "sensitive = market segment "
    "(operators/privacy.py:l_diversity_report): the k-anonymity "
    "companion — a big QI class whose rows all share ONE sensitive "
    "value still leaks it; distinct-sensitive counts come from the "
    "two-level (QI, s) -> QI rollup (no distinct over the fact "
    "table), the literal l table broadcast-crosses class-scale rows",
)
def x193_l_diversity(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.privacy import l_diversity_report

    cust = T(spark, sf, "customer")
    return l_diversity_report(
        cust,
        [F.col("c_nationkey"), F.floor(F.col("c_acctbal") / 1000).cast("bigint")],
        F.col("c_mktsegment"),
        ls=[2, 3],
    )


# ---------------------------------------------------------------------------
# x194 — t-closeness privacy audit
# ---------------------------------------------------------------------------


@probe(
    "x194_t_closeness",
    sql="""
        WITH ig AS (
            SELECT c_nationkey AS q0,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS q1,
                   c_mktsegment AS s, count(*) AS n
            FROM customer GROUP BY 1, 2, 3
        ),
        g AS (SELECT s, sum(n) AS ns FROM ig GROUP BY 1),
        tt AS (SELECT sum(n) AS nn FROM ig),
        cls AS (SELECT q0, q1, sum(n) AS rws FROM ig GROUP BY 1, 2),
        cell AS (
            SELECT i.q0, i.q1, c.rws,
                   floor(abs(i.n / CAST(c.rws AS DOUBLE)
                             - g.ns / CAST(t.nn AS DOUBLE)) * 1e9 + 0.5)
                       / 1e9 AS ad,
                   floor(g.ns / CAST(t.nn AS DOUBLE) * 1e9 + 0.5) / 1e9 AS qs
            FROM ig i JOIN cls c USING (q0, q1) JOIN g USING (s)
            CROSS JOIN tt t
        ),
        d AS (
            SELECT q0, q1, max(rws) AS rws,
                   floor((sum(ad) + 1.0 - sum(qs)) / 2.0 * 1e9 + 0.5) / 1e9
                       AS dist
            FROM cell GROUP BY 1, 2
        ),
        ts AS (SELECT CAST(unnest([0.2, 0.35]) AS DOUBLE) AS t)
        SELECT t, CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(CASE WHEN dist > t THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating_classes,
               CAST(sum(CASE WHEN dist > t THEN rws ELSE 0 END) AS BIGINT)
                   AS rows_at_risk,
               floor(sum(CASE WHEN dist > t THEN rws ELSE 0 END)
                     / CAST(sum(rws) AS DOUBLE) * 1e6 + 0.5) / 1e6
                   AS at_risk_rate
        FROM d CROSS JOIN ts GROUP BY t
    """,
    note="t-closeness audit (Li et al. 2007) over the x193 QI/sensitive "
    "— the third privacy rung: a class with many distinct sensitive "
    "values still leaks if its distribution skews far from the corpus; "
    "total-variation distance on observed cells only via the "
    "1 - sum(q_s | s in class) identity "
    "(operators/privacy.py:t_closeness_report), class totals from a "
    "QI-partitioned window, sensitive-cardinality-scale global table "
    "broadcast, literal t grid broadcast-crossed",
)
def x194_t_closeness(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.privacy import t_closeness_report

    cust = T(spark, sf, "customer")
    return t_closeness_report(
        cust,
        [F.col("c_nationkey"), F.floor(F.col("c_acctbal") / 1000).cast("bigint")],
        F.col("c_mktsegment"),
        ts=[0.2, 0.35],
    )


# ---------------------------------------------------------------------------
# x195 — Zipf's-law fit over the corpus vocabulary
# ---------------------------------------------------------------------------


@probe(
    "x195_zipf_fit",
    sql=r"""
        WITH toks AS (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents
        ),
        freq AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
        rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rn
               FROM freq),
        pts AS (
            SELECT CAST(floor(ln(CAST(rn AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
                       AS x,
                   CAST(floor(ln(CAST(c AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
                       AS y
            FROM rk WHERE rn <= 1000
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
                   sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
            FROM pts
        ),
        sl AS (
            SELECT n, sx, sy,
                   CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT)
                        AS DOUBLE)
                   / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
                          AS DOUBLE) AS slope_raw
            FROM m
        )
        SELECT n AS n_terms,
               floor(slope_raw * 1e6 + 0.5) / 1e6 AS slope,
               floor((sy / 1e9 - slope_raw * sx / 1e9)
                     / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS intercept
        FROM sl
    """,
    note="Zipf's-law OLS fit of ln(freq) on ln(rank), top-1000 terms "
    "(operators/text.py:zipf_fit): natural text sits near slope -1, a "
    "far-off slope flags boilerplate floods / templated synthetic text "
    "— one term-count shuffle, global ranks via "
    "plans/prefix.py:distributed_row_number (oracle's plain window is "
    "the semantic spec), regression moments as EXACT 1e-9 integer "
    "units in BIGINT/DECIMAL(38,0)/HUGEINT (the x168 recipe) so the "
    "slope is fixed arithmetic — no float-summation order sensitivity; "
    "constant top-N moment state at any corpus size",
)
def x195_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import zipf_fit

    return zipf_fit(T(spark, sf, "documents"), "text", top_n=1000)


# ---------------------------------------------------------------------------
# x196 — Jensen–Shannon divergence between two sources' unigram dists
# ---------------------------------------------------------------------------


@probe(
    "x196_js_divergence",
    sql=r"""
        WITH toks AS (
            SELECT source AS g,
                   unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents WHERE source IN ('src0', 'src1')
        ),
        cnt AS (
            SELECT w,
                   sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS ca,
                   sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS cb
            FROM toks GROUP BY w
        ),
        tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM cnt),
        u AS (
            SELECT na, nb,
                   CAST(floor((
                       CASE WHEN ca > 0
                            THEN ca / CAST(na AS DOUBLE)
                                 * ln((ca / CAST(na AS DOUBLE))
                                      / ((ca / CAST(na AS DOUBLE)
                                          + cb / CAST(nb AS DOUBLE)) / 2.0))
                                 / 2.0
                            ELSE 0.0 END
                       + CASE WHEN cb > 0
                              THEN cb / CAST(nb AS DOUBLE)
                                   * ln((cb / CAST(nb AS DOUBLE))
                                        / ((ca / CAST(na AS DOUBLE)
                                            + cb / CAST(nb AS DOUBLE)) / 2.0))
                                   / 2.0
                              ELSE 0.0 END) * 1e9 + 0.5) AS BIGINT) AS su
            FROM cnt CROSS JOIN tot
        )
        SELECT CAST(count(*) AS BIGINT) AS vocab,
               CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               floor(sum(su) / 1e9 * 1e6 + 0.5) / 1e6 AS js
        FROM u GROUP BY na, nb
    """,
    note="Jensen-Shannon divergence between two sources' unigram "
    "distributions (operators/drift.py:js_divergence): the symmetric "
    "bounded-[0, ln 2] corpus-distance for domain-mixture monitoring, "
    "finite on disjoint supports where KL blows up — one token-count "
    "shuffle counts BOTH groups via conditional partial aggregates, "
    "1-row totals broadcast, per-token terms quantized to 1e-9 integer "
    "units and summed in BIGINT (vocabulary-scale sums, zero "
    "float-order sensitivity)",
)
def x196_js_divergence(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.drift import js_divergence
    from flytemosaic_spark.operators.text import tokens

    toks = (
        T(spark, sf, "documents")
        .select("source", F.explode(tokens(F.col("text"))).alias("w"))
    )
    return js_divergence(toks, "source", "w", "src0", "src1")


# ---------------------------------------------------------------------------
# x197 — lagged cross-correlation between daily volume and daily value
# ---------------------------------------------------------------------------


@probe(
    "x197_xcorr",
    sql="""
        WITH s AS (
            SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
                   count(*) AS x,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS y
            FROM events GROUP BY 1
        ),
        p AS (
            SELECT gs.lag AS lag, count(*) AS n_pairs,
                   sum(a.x) AS sx, sum(b.y) AS sy,
                   sum(CAST(a.x AS HUGEINT) * CAST(b.y AS HUGEINT)) AS sxy,
                   sum(CAST(a.x AS HUGEINT) * CAST(a.x AS HUGEINT)) AS sxx,
                   sum(CAST(b.y AS HUGEINT) * CAST(b.y AS HUGEINT)) AS syy
            FROM s a
            CROSS JOIN generate_series(-3, 3) gs(lag)
            JOIN s b ON b.t = a.t + gs.lag
            GROUP BY 1
        )
        SELECT CAST(lag AS BIGINT) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
               floor(CAST(n_pairs * sxy
                          - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT)
                          AS DOUBLE)
                     / (sqrt(CAST(n_pairs * sxx
                                  - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
                                  AS DOUBLE))
                        * sqrt(CAST(n_pairs * syy
                                    - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT)
                                    AS DOUBLE)))
                     * 1e6 + 0.5) / 1e6 AS r
        FROM p
    """,
    note="lagged cross-correlation (lags -3..+3) between the daily "
    "event-count series and the daily value series "
    "(operators/timeseries.py:cross_correlation): the lead/lag "
    "detector — does volume move before value? Per-row cents "
    "quantization makes BOTH series exact integers, every Pearson "
    "moment is an exact BIGINT/DECIMAL(38,0)/HUGEINT sum (the x168 "
    "recipe) and r is fixed arithmetic — engine/partitioning-exact; "
    "time-scale self-join on t+L against a constant 7-row lag grid",
)
def x197_xcorr(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.timeseries import cross_correlation

    ev = T(spark, sf, "events")
    series = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .alias("t")
    ).agg(
        F.count("*").alias("x"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("y"),
    )
    return cross_correlation(series, "t", "x", "y", max_lag=3)


# ---------------------------------------------------------------------------
# x198 — bias-baseline recommender (Koren baseline predictors)
# ---------------------------------------------------------------------------


@probe(
    "x198_bias_baseline",
    sql=r"""
        WITH r AS (
            SELECT user_id AS u,
                   CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
                       AS i,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events
        ),
        g AS (SELECT sum(c) AS sc, count(*) AS n FROM r),
        bi AS (
            SELECT i,
                   floor((sum(c) - count(*) * (g.sc / CAST(g.n AS DOUBLE)))
                         / (10 + count(*)) / 100.0 * 1e9 + 0.5) / 1e9 AS b_i
            FROM r CROSS JOIN g GROUP BY i, g.sc, g.n
        ),
        ru AS (
            SELECT u, i, c,
                   CAST(floor((c / 100.0
                               - (g.sc / CAST(g.n AS DOUBLE)) / 100.0
                               - b_i) * 1e9 + 0.5) AS BIGINT) AS resid_u
            FROM r JOIN bi USING (i) CROSS JOIN g
        ),
        bu AS (
            SELECT u,
                   CAST(floor(sum(resid_u) / (10.0 + count(*)) + 0.5)
                        AS BIGINT) / 1e9 AS b_u
            FROM ru GROUP BY u
        ),
        sq AS (
            SELECT g.n,
                   CAST(floor(
                       (r.c / 100.0 - (g.sc / CAST(g.n AS DOUBLE)) / 100.0
                        - bu.b_u - bi.b_i)
                       * (r.c / 100.0 - (g.sc / CAST(g.n AS DOUBLE)) / 100.0
                          - bu.b_u - bi.b_i) * 1e9 + 0.5) AS BIGINT) AS e2,
                   CAST(floor(
                       (r.c / 100.0 - (g.sc / CAST(g.n AS DOUBLE)) / 100.0)
                       * (r.c / 100.0 - (g.sc / CAST(g.n AS DOUBLE)) / 100.0)
                       * 1e9 + 0.5) AS BIGINT) AS g2
            FROM r JOIN bi USING (i) JOIN bu USING (u) CROSS JOIN g
        )
        SELECT CAST(n AS BIGINT) AS n_ratings,
               floor(sqrt(sum(e2) / 1e9 / CAST(n AS DOUBLE)) * 1e6 + 0.5)
                   / 1e6 AS rmse_baseline,
               floor(sqrt(sum(g2) / 1e9 / CAST(n AS DOUBLE)) * 1e6 + 0.5)
                   / 1e6 AS rmse_global
        FROM sq GROUP BY n
    """,
    note="bias-baseline recommender (Koren 2009 baseline predictors "
    "b_ui = mu + b_u + b_i, lambda=10): item then user biases from "
    "regularized residual means, RMSE vs the global-mean strawman — "
    "the mandatory pre-factorization baseline; ratings become exact "
    "integer cents so mu is fixed arithmetic, item table is "
    "item-cardinality-scale (broadcast back), per-row squared errors "
    "quantized to 1e-9 integer units and summed in BIGINT — no "
    "float-order sensitivity; items parsed from the props JSON via "
    "an anchored regexp (Spark/DuckDB regexp_extract group-1 parity)",
)
def x198_bias_baseline(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.recsys import bias_baseline

    ev = T(spark, sf, "events")
    r = ev.select(
        F.col("user_id").alias("u"),
        F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
        .cast("bigint")
        .alias("i"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("c"),
    )
    return bias_baseline(r, "u", "i", "c", lam=10)


# ---------------------------------------------------------------------------
# x199 — Nelson–Aalen cumulative hazard over user activity lifetimes
# ---------------------------------------------------------------------------


@probe(
    "x199_nelson_aalen",
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
        hz AS (
            SELECT d, n_churn, n_risk,
                   CAST(floor(n_churn / CAST(n_risk AS DOUBLE)
                              * 1000000000 + 0.5) AS BIGINT) AS h_u
            FROM risk
        )
        SELECT CAST(d AS BIGINT) AS day,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(n_churn AS BIGINT) AS n_churn,
               floor(sum(h_u) OVER (ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     / 1000000000.0 * 1000000 + 0.5) / 1000000
                   AS cum_hazard
        FROM hz
    """,
    note="Nelson-Aalen cumulative hazard H(t) = sum d_i/n_i over user "
    "activity lifetimes — the Kaplan-Meier companion (x164, same "
    "censoring convention and risk-set machinery): per-day hazard "
    "increments quantized to integer nano-units BEFORE the cumsum "
    "(exact BIGINT prefix sums, engine-identical), risk set via "
    "reverse cumsum on the calendar-bounded day axis "
    "(plans/prefix.py:bounded_window); H(t) ~ -ln S(t) ties the two "
    "curves together as a consistency check",
)
def x199_nelson_aalen(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from flytemosaic_spark.plans.prefix import bounded_window

    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    life = (
        T(spark, sf, "events").groupBy("user_id").agg(F.max(day).alias("last_d"))
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
    h_u = F.floor(
        F.col("n_churn") / F.col("n_risk").cast("double") * 1e9 + F.lit(0.5)
    ).cast("bigint")
    w_cum = bounded_window("d", F.col("d").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return risk.select(
        F.col("d").cast("bigint").alias("day"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("n_churn").cast("bigint").alias("n_churn"),
        (
            F.floor(
                F.sum(h_u).over(w_cum) / F.lit(1e9) * F.lit(1e6) + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("cum_hazard"),
    )


# ---------------------------------------------------------------------------
# x200 — lexical diversity per source (TTR, hapax rate)
# ---------------------------------------------------------------------------


@probe(
    "x200_lexical_diversity",
    sql=r"""
        WITH toks AS (
            SELECT source AS src,
                   unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents
        ),
        tf AS (SELECT src, w, count(*) AS c FROM toks GROUP BY 1, 2)
        SELECT src AS source,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               floor(count(*) / CAST(sum(c) AS DOUBLE) * 1e6 + 0.5) / 1e6
                   AS ttr,
               floor(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
                   AS hapax_rate
        FROM tf GROUP BY src
    """,
    note="lexical diversity per source: type-token ratio and hapax-"
    "legomenon rate — the vocabulary-health companion to the Zipf "
    "slope (x195): templated/boilerplate sources show low TTR and low "
    "hapax rate, spammy/garbage sources show anomalously high ones; "
    "one (source, word) partial-aggregating shuffle then a "
    "source-scale rollup, exact integer counts with two fixed "
    "divisions at the end",
)
def x200_lexical_diversity(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round, tokens

    tf = (
        T(spark, sf, "documents")
        .select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy(F.col("source").alias("src"), "w")
        .agg(F.count("*").alias("c"))
    )
    return (
        tf.groupBy(F.col("src").alias("source"))
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.sum((F.col("c") == 1).cast("bigint")).alias("n_hapax"),
            portable_round(
                F.count("*") / F.sum("c").cast("double"), 6
            ).alias("ttr"),
            portable_round(
                F.sum((F.col("c") == 1).cast("bigint"))
                / F.count("*").cast("double"),
                6,
            ).alias("hapax_rate"),
        )
    )


# ---------------------------------------------------------------------------
# x201 — windowed JS drift vs a static reference distribution
# ---------------------------------------------------------------------------

_X201_REF = {
    "click": 0.2,
    "error": 0.2,
    "purchase": 0.2,
    "signup": 0.2,
    "view": 0.2,
}


def _x201_sql() -> str:
    cats = sorted(_X201_REF)
    counts = ",\n               ".join(
        "sum(CASE WHEN event_type = '%s' THEN 1 ELSE 0 END) AS c%d"
        % (c, i)
        for i, c in enumerate(cats)
    )
    terms = []
    for i, c in enumerate(cats):
        q = repr(float(_X201_REF[c]))
        p = f"(c{i} / CAST(n AS DOUBLE))"
        m = f"(({p} + {q}) / 2.0)"
        terms.append(
            f"(CASE WHEN c{i} > 0 THEN {p} * ln({p} / {m}) / 2.0 "
            f"ELSE 0.0 END + {q} * ln({q} / {m}) / 2.0)"
        )
    js = "\n                 + ".join(terms)
    return f"""
        WITH w AS (
            SELECT time_bucket(INTERVAL '1 day', ts) AS bucket,
               count(*) AS n,
               {counts}
            FROM events GROUP BY 1
        )
        SELECT bucket, CAST(n AS BIGINT) AS n,
               floor(({js}) * 1e6 + 0.5) / 1e6 AS js
        FROM w
    """


@probe(
    "x201_windowed_js_drift",
    sql=_x201_sql(),
    note="per-day Jensen-Shannon drift of the event-type distribution "
    "vs a static uniform reference "
    "(streaming/events.py:windowed_js_drift): the LIVE drift monitor "
    "— streaming-legal by construction (per-category conditional "
    "counts inside ONE windowed aggregation, JS as fixed column "
    "arithmetic — a projection, not a second aggregation; chained "
    "aggs are unsupported on streams), identical plan on batch and "
    "stream so the batch run is the streaming oracle "
    "(test_streaming.py equality test); deterministic fixed-order "
    "5-term sum, 1e-6 grain",
)
def x201_windowed_js_drift(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.streaming.events import windowed_js_drift

    return windowed_js_drift(
        T(spark, sf, "events"), _X201_REF, window="1 day"
    )


# ---------------------------------------------------------------------------
# x202 — Mann–Kendall trend test
# ---------------------------------------------------------------------------


@probe(
    "x202_mann_kendall",
    sql="""
        WITH base AS (
            SELECT event_id AS k, floor(epoch(ts)) AS t, value AS v
            FROM events
        ),
        th AS (
            SELECT CAST(floor((300 * 65536 + count(*) - 1)
                              / CAST(count(*) AS DOUBLE)) AS BIGINT) AS tt
            FROM base
        ),
        s AS (
            SELECT k, t, v FROM base CROSS JOIN th
            WHERE tt >= 65536
               OR substr(md5('mk:' || CAST(k AS VARCHAR)), 1, 4)
                  < printf('%04x', tt)
        ),
        ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
        sst AS (
            SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1
                                 WHEN b.v < a.v THEN -1
                                 ELSE 0 END) AS BIGINT) AS s_stat
            FROM s a JOIN s b ON a.t < b.t
        ),
        tie AS (
            SELECT sum(tg * (tg - 1) * (2 * tg + 5)) AS tie_term
            FROM (SELECT count(*) AS tg FROM s GROUP BY v)
        )
        SELECT n AS n_sample, s_stat,
               floor(CASE
                   WHEN s_stat > 0 THEN (s_stat - 1)
                       / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term
                                   AS DOUBLE) / 18.0)
                   WHEN s_stat < 0 THEN (s_stat + 1)
                       / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term
                                   AS DOUBLE) / 18.0)
                   ELSE 0.0 END * 1e6 + 0.5) / 1e6 AS z
        FROM ns CROSS JOIN sst CROSS JOIN tie
    """,
    note="Mann-Kendall trend test on event value over time "
    "(operators/timeseries.py:mann_kendall): the hypothesis-test "
    "companion to the x191 Theil-Sen slope, same fixed-budget md5 "
    "sample machinery (sampling.py:fixed_budget_sample — pair stage "
    "constant at any corpus size); S and the tie-corrected variance "
    "numerator are exact integers, z is fixed arithmetic at 1e-6; "
    "time-tied pairs excluded per the one-observation-per-time "
    "premise",
)
def x202_mann_kendall(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.timeseries import mann_kendall

    ev = T(spark, sf, "events").select(
        "event_id",
        F.col("ts").cast("timestamp").cast("long").alias("t_sec"),
        "value",
    )
    return mann_kendall(
        ev, "t_sec", "value", sample_budget=300, seed_tag="mk",
        key_col="event_id",
    )


# ---------------------------------------------------------------------------
# x203 — difference-in-differences A/B estimator
# ---------------------------------------------------------------------------


@probe(
    "x203_diff_in_diff",
    sql="""
        WITH r AS (
            SELECT substr(md5('did:' || CAST(user_id AS VARCHAR)), 1, 4)
                       < '8000' AS a,
                   ts >= TIMESTAMP '2024-01-16' AS p,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events
        ),
        cells AS (
            SELECT a, p, count(*) AS n, sum(c) AS s,
                   sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ss
            FROM r GROUP BY a, p
        ),
        one AS (
            SELECT
                max(CASE WHEN a AND p THEN n END) AS n_11,
                max(CASE WHEN a AND p THEN s END) AS s_11,
                max(CASE WHEN a AND p THEN ss END) AS ss_11,
                max(CASE WHEN a AND NOT p THEN n END) AS n_10,
                max(CASE WHEN a AND NOT p THEN s END) AS s_10,
                max(CASE WHEN a AND NOT p THEN ss END) AS ss_10,
                max(CASE WHEN NOT a AND p THEN n END) AS n_01,
                max(CASE WHEN NOT a AND p THEN s END) AS s_01,
                max(CASE WHEN NOT a AND p THEN ss END) AS ss_01,
                max(CASE WHEN NOT a AND NOT p THEN n END) AS n_00,
                max(CASE WHEN NOT a AND NOT p THEN s END) AS s_00,
                max(CASE WHEN NOT a AND NOT p THEN ss END) AS ss_00
            FROM cells
        )
        SELECT CAST(n_11 + n_10 + n_01 + n_00 AS BIGINT) AS n,
               floor(s_10 / CAST(n_10 AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6
                   AS mean_treat_pre,
               floor(s_11 / CAST(n_11 AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6
                   AS mean_treat_post,
               floor(s_00 / CAST(n_00 AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6
                   AS mean_ctrl_pre,
               floor(s_01 / CAST(n_01 AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6
                   AS mean_ctrl_post,
               floor(((s_11 / CAST(n_11 AS DOUBLE) / 100.0
                       - s_10 / CAST(n_10 AS DOUBLE) / 100.0)
                      - (s_01 / CAST(n_01 AS DOUBLE) / 100.0
                         - s_00 / CAST(n_00 AS DOUBLE) / 100.0))
                     * 1e6 + 0.5) / 1e6 AS did,
               floor(sqrt(
                   (CAST(ss_11 AS DOUBLE) - CAST(s_11 AS DOUBLE)
                        * CAST(s_11 AS DOUBLE) / CAST(n_11 AS DOUBLE))
                       / (CAST(n_11 AS DOUBLE) - 1) / CAST(n_11 AS DOUBLE)
                   + (CAST(ss_10 AS DOUBLE) - CAST(s_10 AS DOUBLE)
                        * CAST(s_10 AS DOUBLE) / CAST(n_10 AS DOUBLE))
                       / (CAST(n_10 AS DOUBLE) - 1) / CAST(n_10 AS DOUBLE)
                   + (CAST(ss_01 AS DOUBLE) - CAST(s_01 AS DOUBLE)
                        * CAST(s_01 AS DOUBLE) / CAST(n_01 AS DOUBLE))
                       / (CAST(n_01 AS DOUBLE) - 1) / CAST(n_01 AS DOUBLE)
                   + (CAST(ss_00 AS DOUBLE) - CAST(s_00 AS DOUBLE)
                        * CAST(s_00 AS DOUBLE) / CAST(n_00 AS DOUBLE))
                       / (CAST(n_00 AS DOUBLE) - 1) / CAST(n_00 AS DOUBLE)
               ) / 100.0 * 1e6 + 0.5) / 1e6 AS se,
               floor(((s_11 / CAST(n_11 AS DOUBLE) / 100.0
                       - s_10 / CAST(n_10 AS DOUBLE) / 100.0)
                      - (s_01 / CAST(n_01 AS DOUBLE) / 100.0
                         - s_00 / CAST(n_00 AS DOUBLE) / 100.0))
                     / (sqrt(
                   (CAST(ss_11 AS DOUBLE) - CAST(s_11 AS DOUBLE)
                        * CAST(s_11 AS DOUBLE) / CAST(n_11 AS DOUBLE))
                       / (CAST(n_11 AS DOUBLE) - 1) / CAST(n_11 AS DOUBLE)
                   + (CAST(ss_10 AS DOUBLE) - CAST(s_10 AS DOUBLE)
                        * CAST(s_10 AS DOUBLE) / CAST(n_10 AS DOUBLE))
                       / (CAST(n_10 AS DOUBLE) - 1) / CAST(n_10 AS DOUBLE)
                   + (CAST(ss_01 AS DOUBLE) - CAST(s_01 AS DOUBLE)
                        * CAST(s_01 AS DOUBLE) / CAST(n_01 AS DOUBLE))
                       / (CAST(n_01 AS DOUBLE) - 1) / CAST(n_01 AS DOUBLE)
                   + (CAST(ss_00 AS DOUBLE) - CAST(s_00 AS DOUBLE)
                        * CAST(s_00 AS DOUBLE) / CAST(n_00 AS DOUBLE))
                       / (CAST(n_00 AS DOUBLE) - 1) / CAST(n_00 AS DOUBLE)
               ) / 100.0) * 1e6 + 0.5) / 1e6 AS z
        FROM one
    """,
    note="difference-in-differences estimator "
    "(operators/metrics.py:diff_in_diff): DID = (treat post-pre) - "
    "(ctrl post-pre) removes the arm baseline gap AND the common time "
    "trend — the panel-data companion to CUPED (x188); md5 arms, "
    "literal date split, exact integer cents with sum-squares in "
    "DECIMAL(38,0)/HUGEINT (x168 recipe), Welch SE from the four "
    "cells' exact moments — all fixed arithmetic, one 4-row shuffle",
)
def x203_diff_in_diff(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.metrics import diff_in_diff
    from flytemosaic_spark.operators.sampling import hash_bucket

    ev = T(spark, sf, "events")
    return diff_in_diff(
        ev,
        hash_bucket(
            F.concat(F.lit("did:"), F.col("user_id").cast("string"))
        )
        < F.lit("8000"),
        F.col("ts") >= F.lit("2024-01-16").cast("timestamp_ntz"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"),
    )


# ---------------------------------------------------------------------------
# x204 — mean-shift change-point (binary segmentation, first split)
# ---------------------------------------------------------------------------


@probe(
    "x204_mean_shift_split",
    sql="""
        WITH s AS (
            SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
            FROM events GROUP BY 1
        ),
        g AS (SELECT count(*) AS n, sum(v) AS sv FROM s),
        pre AS (
            SELECT t,
                   count(*) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS n1,
                   sum(v) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS c1
            FROM s
        )
        SELECT CAST(t AS BIGINT) AS split_t,
               CAST(n1 AS BIGINT) AS n_before,
               CAST(n - n1 AS BIGINT) AS n_after,
               floor(c1 / CAST(n1 AS DOUBLE) * 1e6 + 0.5) / 1e6
                   AS mean_before,
               floor((sv - c1) / CAST(n - n1 AS DOUBLE) * 1e6 + 0.5) / 1e6
                   AS mean_after,
               floor(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
                     * (c1 / CAST(n1 AS DOUBLE)
                        - (sv - c1) / CAST(n - n1 AS DOUBLE))
                     * (c1 / CAST(n1 AS DOUBLE)
                        - (sv - c1) / CAST(n - n1 AS DOUBLE))
                     / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS score
        FROM pre CROSS JOIN g
        WHERE n1 < n
        ORDER BY score DESC, split_t
        LIMIT 1
    """,
    note="single change-point by binary segmentation "
    "(operators/timeseries.py:mean_shift_split): the split day "
    "maximizing the between-segment sum of squares n1*n2*(m1-m2)^2/n "
    "over the daily value-cents series — the corpus-level 'when did "
    "the mean move' detector (x110 CUSUM flags per-key anomalies); "
    "exact BIGINT prefix sums on the bounded day axis "
    "(plans/prefix.py:bounded_window — oracle's plain window is the "
    "semantic spec), candidate scores fixed arithmetic, argmax via "
    "ORDER BY+LIMIT",
)
def x204_mean_shift_split(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.timeseries import mean_shift_split

    ev = T(spark, sf, "events")
    series = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .alias("t")
    ).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("v")
    )
    return mean_shift_split(series, "t", "v")


# ---------------------------------------------------------------------------
# x205 — survivorship / golden-record canonicalization
# ---------------------------------------------------------------------------


@probe(
    "x205_survivorship",
    sql="""
        WITH h AS (
            SELECT doc_id AS id, md5(substr(text, 1, 200)) AS h,
                   n_chars AS q
            FROM documents
        ),
        r AS (
            SELECT id, h,
                   row_number() OVER (PARTITION BY h
                       ORDER BY q DESC, id) AS rn,
                   count(*) OVER (PARTITION BY h) AS sz,
                   first_value(id) OVER (PARTITION BY h
                       ORDER BY q DESC, id) AS canon
            FROM h
        )
        SELECT id AS doc_id, canon AS canonical_id,
               CAST(sz AS BIGINT) AS cluster_size
        FROM r WHERE sz > 1 AND rn > 1
        ORDER BY doc_id
    """,
    note="survivorship / golden-record canonicalization "
    "(operators/dedup.py:survivorship): the step AFTER dedup "
    "detection — each duplicate family (leading-200-char fingerprint; "
    "exact hash has no collisions at sf0.01) elects one canonical by "
    "(quality desc, id), members map to it for a MERGE rewrite or "
    "training-data drop list; one fingerprint shuffle, the election "
    "is a hash-PARTITIONED window (bounded per-cluster state), "
    "singleton clusters dropped",
)
def x205_survivorship(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.dedup import survivorship

    return survivorship(
        T(spark, sf, "documents"), "doc_id", "text", "n_chars",
        prefix_len=200,
    )


# ---------------------------------------------------------------------------
# x206 — exact weighted median per group
# ---------------------------------------------------------------------------


@probe(
    "x206_weighted_median",
    sql=r"""
        WITH s AS (
            SELECT event_type AS g,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                   CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
                       AS w
            FROM events
        ),
        r AS (
            SELECT g, v,
                   sum(w) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cw,
                   sum(w) OVER (PARTITION BY g) AS tw,
                   count(*) OVER (PARTITION BY g) AS n
            FROM s
        )
        SELECT g AS grp, CAST(max(n) AS BIGINT) AS n,
               CAST(max(tw) AS BIGINT) AS total_w,
               CAST(min(v) AS BIGINT) AS wmedian
        FROM r WHERE 2 * cw >= tw GROUP BY g
    """,
    note="exact weighted median per event type, weights from the "
    "props JSON (operators/metrics.py:weighted_median_by): smallest "
    "value whose cumulative weight reaches half the group total (the "
    "lower weighted median) — the robust center when rows carry "
    "importance; group-PARTITIONED cumulative-weight window over "
    "integer cents/weights, the 2·cum ≥ tot boundary exact integer "
    "arithmetic (no floats anywhere), tie-order-invariant by "
    "construction (min over crossing rows)",
)
def x206_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.metrics import weighted_median_by

    ev = T(spark, sf, "events")
    return weighted_median_by(
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
            F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
            .cast("bigint")
            .alias("w"),
        ),
        "event_type",
        "v",
        "w",
    )


# ---------------------------------------------------------------------------
# x207 — winsorized mean per group
# ---------------------------------------------------------------------------


@probe(
    "x207_winsorized_mean",
    sql="""
        WITH s AS (
            SELECT event_type AS g,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events
        ),
        r AS (
            SELECT g, c,
                   row_number() OVER (PARTITION BY g ORDER BY c) AS rn,
                   count(*) OVER (PARTITION BY g) AS n
            FROM s
        ),
        b AS (
            SELECT g, min(c) AS lo, max(c) AS hi
            FROM r
            WHERE rn = greatest(1, CAST(ceil(n * 5 / 100) AS BIGINT))
               OR rn = n + 1 - greatest(1, CAST(ceil(n * 5 / 100) AS BIGINT))
            GROUP BY g
        ),
        w AS (
            SELECT s.g, b.lo, b.hi,
                   least(greatest(s.c, b.lo), b.hi) AS cc
            FROM s JOIN b USING (g)
        )
        SELECT g AS grp, CAST(count(*) AS BIGINT) AS n,
               max(lo) AS lo_bound, max(hi) AS hi_bound,
               floor(sum(cc) / CAST(count(*) AS DOUBLE) / 100.0 * 1e6 + 0.5)
                   / 1e6 AS wins_mean
        FROM w GROUP BY g
    """,
    note="5% winsorized mean per event type "
    "(operators/metrics.py:winsorized_mean_by): values clamped to the "
    "group's exact p5/p95 order statistics (nearest-rank, integer "
    "index arithmetic) before averaging — the outlier-robust mean "
    "that keeps n constant (unlike trimming); group-partitioned "
    "rank window, group-scale bounds joined back, winsorized sum an "
    "exact BIGINT so the mean is one fixed division",
)
def x207_winsorized_mean(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.metrics import winsorized_mean_by

    ev = T(spark, sf, "events")
    return winsorized_mean_by(
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("c"),
        ),
        "event_type",
        "c",
        pct=5,
    )


# ---------------------------------------------------------------------------
# x208 — entropy rate of the event-flow Markov chain
# ---------------------------------------------------------------------------


@probe(
    "x208_entropy_rate",
    sql="""
        WITH tr0 AS (
            SELECT event_type AS cur,
                   lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
            FROM events
        ),
        tr AS (SELECT cur, nxt, count(*) AS o FROM tr0
               WHERE nxt IS NOT NULL GROUP BY 1, 2),
        ri AS (SELECT cur, sum(o) AS ni FROM tr GROUP BY 1),
        cj AS (SELECT nxt, sum(o) AS nj FROM tr GROUP BY 1),
        tot AS (SELECT sum(o) AS n FROM tr),
        hc AS (
            SELECT n,
                   floor(sum(CAST(floor((o / CAST(n AS DOUBLE))
                       * ln(ni / CAST(o AS DOUBLE)) * 1e9 + 0.5) AS BIGINT))
                       / 1e9 * 1e6 + 0.5) / 1e6 AS h_cond
            FROM tr JOIN ri USING (cur) CROSS JOIN tot GROUP BY n
        ),
        hn AS (
            SELECT floor(sum(CAST(floor((nj / CAST(n AS DOUBLE))
                       * ln(n / CAST(nj AS DOUBLE)) * 1e9 + 0.5) AS BIGINT))
                       / 1e9 * 1e6 + 0.5) / 1e6 AS h_next
            FROM cj CROSS JOIN tot
        )
        SELECT CAST(n AS BIGINT) AS n_transitions, h_cond, h_next,
               floor((h_next - h_cond) * 1e6 + 0.5) / 1e6 AS seq_info
        FROM hc CROSS JOIN hn
    """,
    note="entropy rate H(next|current) of the event-flow Markov chain "
    "(operators/drift.py:conditional_entropy_rate): the predictability "
    "number for session flows — low means rigid funnels, ~H(next) "
    "means no sequential structure; seq_info = H(next) - H(next|cur) "
    "is the information the current state carries. Transitions from a "
    "user-PARTITIONED lead window (data-scale key), then everything "
    "is category-squared-scale: exact integer cells/marginals, "
    "per-cell terms as 1e-9 integer units summed in BIGINT (x189 "
    "recipe)",
)
def x208_entropy_rate(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.drift import conditional_entropy_rate

    ev = T(spark, sf, "events")
    return conditional_entropy_rate(
        ev, "user_id", "ts", "event_type", "event_id"
    )


# ---------------------------------------------------------------------------
# x209 — Herfindahl concentration per market
# ---------------------------------------------------------------------------


@probe(
    "x209_hhi",
    sql="""
        WITH per AS (
            SELECT n_name AS m, l_suppkey AS i,
                   sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                       AS s
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2
        ),
        agg AS (
            SELECT m, count(*) AS n_members,
                   sum(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS sq,
                   sum(s) AS tot
            FROM per GROUP BY m
        )
        SELECT m AS market, CAST(n_members AS BIGINT) AS n_members,
               floor(CAST(sq AS DOUBLE)
                     / CAST(CAST(tot AS HUGEINT) * CAST(tot AS HUGEINT)
                            AS DOUBLE) * 1e6 + 0.5) / 1e6 AS hhi
        FROM agg
    """,
    note="Herfindahl-Hirschman concentration of supplier revenue "
    "shares per nation (operators/metrics.py:hhi_by): the dominance "
    "readout completing the Gini (x168) / Pareto (x169) inequality "
    "family — HHI = sum(s_i^2)/S^2 as EXACT DECIMAL(38,0)/HUGEINT "
    "integer cross-multiplication (no per-member share floats), one "
    "double division at the end; two partial-aggregating shuffles, "
    "supplier/nation dims broadcast",
)
def x209_hhi(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.metrics import hhi_by

    li = T(spark, sf, "lineitem")
    su = T(spark, sf, "supplier")
    na = T(spark, sf, "nation")
    joined = li.join(
        F.broadcast(su), li.l_suppkey == su.s_suppkey
    ).join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
    return hhi_by(
        joined,
        "n_name",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint"),
    )


# ---------------------------------------------------------------------------
# x210 — cold-start coverage of a recommender train/test split
# ---------------------------------------------------------------------------


@probe(
    "x210_coldstart_coverage",
    sql=r"""
        WITH base AS (
            SELECT substr(md5('cs:' || CAST(user_id AS VARCHAR)), 1, 4)
                       AS b,
                   CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
                       AS i
            FROM events
        ),
        ti AS (SELECT DISTINCT i FROM base WHERE b < 'cccd'),
        test AS (
            SELECT base.i,
                   CASE WHEN ti.i IS NULL THEN 1 ELSE 0 END AS cold
            FROM base LEFT JOIN ti ON base.i = ti.i
            WHERE b >= 'cccd'
        ),
        r AS (SELECT CAST(count(*) AS BIGINT) AS n_test_rows,
                     CAST(sum(cold) AS BIGINT) AS n_cold_rows FROM test),
        it AS (SELECT CAST(count(*) AS BIGINT) AS n_test_items,
                      CAST(sum(cold) AS BIGINT) AS n_cold_items
               FROM (SELECT DISTINCT i, cold FROM test))
        SELECT n_test_rows, n_cold_rows,
               floor(n_cold_rows / CAST(n_test_rows AS DOUBLE) * 1e6 + 0.5)
                   / 1e6 AS cold_row_rate,
               n_test_items, n_cold_items,
               floor(n_cold_items / CAST(n_test_items AS DOUBLE) * 1e6 + 0.5)
                   / 1e6 AS cold_item_rate
        FROM r CROSS JOIN it
    """,
    note="cold-start coverage audit of an 80/20 md5 user split "
    "(operators/recsys.py:coldstart_coverage): share of TEST "
    "interactions and of distinct test items whose item never appears "
    "in train — high cold rates mean offline recsys metrics overstate "
    "production quality and serving needs a content fallback; "
    "deterministic split (x19 recipe), item-cardinality distinct "
    "tables, broadcast existence join, exact integer counts",
)
def x210_coldstart_coverage(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.recsys import coldstart_coverage

    ev = T(spark, sf, "events")
    return coldstart_coverage(
        ev,
        "user_id",
        F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("bigint"),
        train_hex="cccd",
        seed_tag="cs",
    )


# ---------------------------------------------------------------------------
# x211 — per-brand log-log OLS (grouped regression, exact moments)
# ---------------------------------------------------------------------------


@probe(
    "x211_grouped_ols",
    sql="""
        WITH pts AS (
            SELECT p_brand AS g,
                   CAST(floor(ln(CAST(l_quantity AS DOUBLE)) * 1e9 + 0.5)
                        AS BIGINT) AS x,
                   CAST(floor(ln(l_extendedprice) * 1e9 + 0.5) AS BIGINT)
                       AS y
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        m AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
                   sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
                   sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
            FROM pts GROUP BY g
        ),
        d AS (
            SELECT g, n,
                   CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT)
                        AS DOUBLE) AS num,
                   CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
                        AS DOUBLE) AS vx,
                   CAST(n * syy - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT)
                        AS DOUBLE) AS vy,
                   sx, sy
            FROM m
        )
        SELECT g AS grp, n,
               floor(num / vx * 1e6 + 0.5) / 1e6 AS slope,
               floor((sy / 1e9 - (num / vx) * sx / 1e9)
                     / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS intercept,
               floor(num * num / (vx * vy) * 1e6 + 0.5) / 1e6 AS r2
        FROM d
    """,
    note="per-brand log-log OLS of extended price on quantity "
    "(operators/linear.py:grouped_ols): the grouped-regression shape "
    "— slope ~ 1 says price scales linearly with quantity, intercept "
    "is the brand's mean log unit price, R² the fit; per-row ln "
    "values quantized to 1e-9 integer units, five moments as exact "
    "BIGINT/DECIMAL(38,0)/HUGEINT sums (x168 recipe), "
    "slope/intercept/R² fixed arithmetic (R² crosses to double "
    "before squaring — num² would pass 128 bits); one "
    "partial-aggregating shuffle, five numbers of state per group",
)
def x211_grouped_ols(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.linear import grouped_ols

    li = T(spark, sf, "lineitem")
    pa = T(spark, sf, "part")
    joined = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
    return grouped_ols(
        joined,
        "p_brand",
        F.log(F.col("l_quantity").cast("double")),
        F.log(F.col("l_extendedprice")),
    )


# ---------------------------------------------------------------------------
# x212 — seasonal strength (phase-ANOVA R² at period 7)
# ---------------------------------------------------------------------------


@probe(
    "x212_seasonal_strength",
    sql="""
        WITH s AS (
            SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
                   count(*) AS c
            FROM events GROUP BY 1
        ),
        sp AS (SELECT t % 7 AS d, CAST(c AS BIGINT) AS v FROM s),
        ph AS (SELECT d, count(*) AS nd, sum(v) AS sd FROM sp GROUP BY d),
        bt AS (
            SELECT sum(CAST(floor(
                       CAST(CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT)
                            AS DOUBLE) / CAST(nd AS DOUBLE) * 1e6 + 0.5)
                       AS HUGEINT)) AS b
            FROM ph
        ),
        g AS (
            SELECT count(*) AS n, sum(v) AS sv,
                   sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS ss
            FROM sp
        )
        SELECT CAST(n AS BIGINT) AS n_periods,
               CAST(7 AS BIGINT) AS period,
               floor((CAST(b AS DOUBLE) / 1e6
                      - CAST(CAST(sv AS HUGEINT) * CAST(sv AS HUGEINT)
                             AS DOUBLE) / CAST(n AS DOUBLE))
                     / (CAST(ss AS DOUBLE)
                        - CAST(CAST(sv AS HUGEINT) * CAST(sv AS HUGEINT)
                               AS DOUBLE) / CAST(n AS DOUBLE))
                     * 1e6 + 0.5) / 1e6 AS strength
        FROM g CROSS JOIN bt
    """,
    note="seasonal strength of the daily event-count series at period "
    "7 (operators/timeseries.py:seasonal_strength): share of variance "
    "explained by day-of-week — the one-way phase-ANOVA R², the "
    "quantitative companion to x190's ACF peak; phase sums/counts and "
    "global S/SS are exact integers, the 7 per-phase s_d^2/n_d terms "
    "are quantized to 1e-6 integer units BEFORE their sum (even a "
    "7-term bare float sum is engine-order-sensitive), strength is "
    "one fixed-arithmetic expression",
)
def x212_seasonal_strength(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.timeseries import seasonal_strength

    ev = T(spark, sf, "events")
    series = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .alias("t")
    ).agg(F.count("*").alias("c"))
    return seasonal_strength(series, "t", "c", period=7)


# ---------------------------------------------------------------------------
# x213 — Cliff's delta A/B effect size
# ---------------------------------------------------------------------------


@probe(
    "x213_cliffs_delta",
    sql="""
        WITH s AS (
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS sc,
                   CASE WHEN substr(md5('cd:' || CAST(user_id AS VARCHAR)),
                                    1, 4) < '8000'
                        THEN 1 ELSE 0 END AS y
            FROM events
        ),
        v AS (SELECT sc, count(*) AS n, sum(y) AS np FROM s GROUP BY sc),
        r AS (
            SELECT sc, n, np,
                   coalesce(sum(n) OVER (ORDER BY sc
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS cb
            FROM v
        ),
        t AS (
            SELECT sum(np * (2 * cb + n + 1)) AS rp2,
                   sum(np) AS npos, sum(n - np) AS nneg
            FROM r
        ),
        d AS (
            SELECT CAST(npos AS BIGINT) AS n_a,
                   CAST(nneg AS BIGINT) AS n_b,
                   floor((CAST(rp2 - npos * (npos + 1) AS DOUBLE)
                          / (CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE))
                          - 1.0) * 1e6 + 0.5) / 1e6 AS delta
            FROM t
        )
        SELECT n_a, n_b, delta,
               CASE WHEN abs(delta) < 0.147 THEN 'negligible'
                    WHEN abs(delta) < 0.33 THEN 'small'
                    WHEN abs(delta) < 0.474 THEN 'medium'
                    ELSE 'large' END AS magnitude
        FROM d
    """,
    note="Cliff's delta A/B effect size "
    "(operators/metrics.py:cliffs_delta): P(A>B) - P(A<B) over md5 "
    "arms — the MAGNITUDE number significance tests (x185, x203) "
    "don't give; = 2*AUC - 1, so it reuses x106's exact tie-corrected "
    "Mann-Whitney rank sum (DECIMAL(38,0) half-rank units, "
    "distributed cumsum) computed from the EXACT numerator, not the "
    "rounded AUC; Romano et al. 2006 magnitude cuts on the rounded "
    "delta (identical CASE both engines)",
)
def x213_cliffs_delta(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.metrics import cliffs_delta
    from flytemosaic_spark.operators.sampling import hash_bucket

    ev = T(spark, sf, "events").select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("sc"),
        (
            hash_bucket(
                F.concat(F.lit("cd:"), F.col("user_id").cast("string"))
            )
            < F.lit("8000")
        ).alias("arm"),
    )
    return cliffs_delta(ev, "arm", "sc")


# ---------------------------------------------------------------------------
# x214 — Brown–Forsythe variance-homogeneity test
# ---------------------------------------------------------------------------


@probe(
    "x214_brown_forsythe",
    sql="""
        WITH s AS (
            SELECT event_type AS g,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events
        ),
        a AS (SELECT g, c, count(*) AS cnt FROM s GROUP BY 1, 2),
        r AS (
            SELECT g, c,
                   sum(cnt) OVER (PARTITION BY g ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                   sum(cnt) OVER (PARTITION BY g) AS ng
            FROM a
        ),
        med AS (SELECT g, min(c) AS med FROM r WHERE 2 * cum >= ng
                GROUP BY g),
        z AS (SELECT s.g, abs(s.c - med.med) AS z
              FROM s JOIN med USING (g)),
        per AS (
            SELECT g, count(*) AS n, sum(z) AS sz,
                   sum(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS szz
            FROM z GROUP BY g
        ),
        g2 AS (
            SELECT count(*) AS k, sum(n) AS nn, sum(sz) AS s2,
                   sum(szz) AS ss,
                   sum(CAST(floor(
                       CAST(CAST(sz AS HUGEINT) * CAST(sz AS HUGEINT)
                            AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)
                       AS HUGEINT)) AS bt
            FROM per
        )
        SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
               floor(CAST(nn - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)
                     * ((CAST(bt AS DOUBLE) / 1e6
                         - CAST(CAST(s2 AS HUGEINT) * CAST(s2 AS HUGEINT)
                                AS DOUBLE) / CAST(nn AS DOUBLE))
                        / (CAST(ss AS DOUBLE) - CAST(bt AS DOUBLE) / 1e6))
                     * 1e6 + 0.5) / 1e6 AS f_stat
        FROM g2
    """,
    note="Brown-Forsythe variance-homogeneity test across event types "
    "(operators/metrics.py:brown_forsythe): Levene on |x - median_g| "
    "— the robust 'are these segments' variances comparable' gate in "
    "front of pooled-variance readouts (x66/x203); exact lower "
    "medians from the (group, value) aggregate cumulative (x206 "
    "machinery, never a data-scale window), z exact integer cents, "
    "sums BIGINT/DECIMAL(38,0)/HUGEINT, the k per-group (sum z)^2/n "
    "terms quantized to 1e-6 units BEFORE their k-term sum (x212 "
    "rule), F one fixed-arithmetic expression",
)
def x214_brown_forsythe(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.metrics import brown_forsythe

    ev = T(spark, sf, "events")
    return brown_forsythe(
        ev,
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"),
    )


# ---------------------------------------------------------------------------
# x215 — Ljung–Box whiteness test on the daily series
# ---------------------------------------------------------------------------


@probe(
    "x215_ljung_box",
    sql="""
        WITH s AS (
            SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
                   count(*) AS c
            FROM events GROUP BY 1
        ),
        g AS (SELECT count(*) AS n, sum(c) AS sc, sum(c * c) AS ss FROM s),
        p AS (
            SELECT gs.lag AS lag, count(*) AS n_pairs,
                   sum(a.c * b.c) AS sxy, sum(a.c) AS sh, sum(b.c) AS st
            FROM s a
            CROSS JOIN generate_series(1, 7) gs(lag)
            JOIN s b ON b.t = a.t + gs.lag
            GROUP BY 1
        ),
        acf AS (
            SELECT lag, n_pairs,
                   floor((sxy - (sc / CAST(n AS DOUBLE)) * (sh + st)
                          + n_pairs * (sc / CAST(n AS DOUBLE))
                            * (sc / CAST(n AS DOUBLE)))
                         / (ss - n * (sc / CAST(n AS DOUBLE))
                                 * (sc / CAST(n AS DOUBLE)))
                         * 1e6 + 0.5) / 1e6 AS r
            FROM p CROSS JOIN g
        ),
        q0 AS (
            SELECT max(n_pairs + lag) AS n, count(*) AS h,
                   sum(CAST(floor(r * r / CAST(n_pairs AS DOUBLE) * 1e12
                                  + 0.5) AS BIGINT)) AS su
            FROM acf
        )
        SELECT CAST(n AS BIGINT) AS n_obs, CAST(h AS BIGINT) AS h,
               floor(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
                     * (su / 1e12) * 1e6 + 0.5) / 1e6 AS q_stat,
               floor(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
                     * (su / 1e12) * 1e6 + 0.5) / 1e6 > 14.067
                   AS reject_white
        FROM q0
    """,
    note="Ljung-Box portmanteau whiteness test at lags 1-7 on the "
    "daily event-count series (operators/timeseries.py:ljung_box): "
    "Q = n(n+2) sum r_k^2/(n-k) ~ chi2(7), the formal yes/no on top "
    "of x190's per-lag ACF — a series failing it has structure a "
    "model should absorb; built literally on the x190 machinery (r_k "
    "engine-identical at 1e-6, n-k = n_pairs), the 7 per-lag terms "
    "quantized to 1e-12 integer units before their sum (x212 rule), "
    "Q one fixed-arithmetic expression vs the literal chi2(7) 5% "
    "critical value",
)
def x215_ljung_box(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.timeseries import ljung_box

    ev = T(spark, sf, "events")
    series = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .alias("t")
    ).agg(F.count("*").alias("c"))
    return ljung_box(series, "t", "c", max_lag=7)


# ---------------------------------------------------------------------------
# x216 — exact distributed Spearman rank correlation
# ---------------------------------------------------------------------------


@probe(
    "x216_spearman",
    sql="""
        WITH s AS (
            SELECT CAST(l_quantity AS BIGINT) AS x,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
            FROM lineitem
        ),
        vx AS (SELECT x, count(*) AS cnt FROM s GROUP BY x),
        rx AS (
            SELECT x,
                   2 * (sum(cnt) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) - cnt) + cnt + 1 AS r2x
            FROM vx
        ),
        vy AS (SELECT y, count(*) AS cnt FROM s GROUP BY y),
        ry AS (
            SELECT y,
                   2 * (sum(cnt) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) - cnt) + cnt + 1 AS r2y
            FROM vy
        ),
        j AS (SELECT r2x, r2y FROM s JOIN rx USING (x) JOIN ry USING (y)),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   sum(r2x) AS sa, sum(r2y) AS sb,
                   sum(CAST(r2x AS HUGEINT) * CAST(r2y AS HUGEINT)) AS sab,
                   sum(CAST(r2x AS HUGEINT) * CAST(r2x AS HUGEINT)) AS saa,
                   sum(CAST(r2y AS HUGEINT) * CAST(r2y AS HUGEINT)) AS sbb
            FROM j
        )
        SELECT n,
               floor(CAST(n * sab - CAST(sa AS HUGEINT) * CAST(sb AS HUGEINT)
                          AS DOUBLE)
                     / (sqrt(CAST(n * saa
                                  - CAST(sa AS HUGEINT) * CAST(sa AS HUGEINT)
                                  AS DOUBLE))
                        * sqrt(CAST(n * sbb
                                    - CAST(sb AS HUGEINT)
                                      * CAST(sb AS HUGEINT) AS DOUBLE)))
                     * 1e6 + 0.5) / 1e6 AS rho
        FROM m
    """,
    note="exact distributed Spearman rank correlation WITH tie "
    "midranks, quantity vs extended price "
    "(operators/linear.py:spearman_corr): the monotone-association "
    "number Pearson misses — midranks in integer DOUBLE-RANK units "
    "(2-rank, so tied halves stay integers) from each column's "
    "(value, count) aggregate via plans/prefix.py:distributed_cumsum "
    "(value-scale state, no single-partition window — the roc_auc "
    "recipe; oracle's plain window is the semantic spec); ONE "
    "data-scale pass: raw rows reduce to the checkpointed JOINT "
    "(x, y, cnt) aggregate, rank tables join to THAT (joint-distinct "
    "scale, AQE broadcasts the 50-value quantity side), five exact "
    "count-weighted DECIMAL(38,0) Pearson moments, rho fixed "
    "arithmetic",
)
def x216_spearman(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.linear import spearman_corr

    li = T(spark, sf, "lineitem")
    return spearman_corr(
        li,
        F.col("l_quantity"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint"),
    )
