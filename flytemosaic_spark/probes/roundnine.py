"""Round-9 probes: time-series diagnostics (ACF, Theil–Sen, lagged
cross-correlation), itemset mining one level deeper (frequent
triples), the l-diversity and t-closeness privacy audits, and two
corpus-distribution screens (Zipf fit, Jensen–Shannon divergence) —
each backed by a reusable operator and an engine-portable DuckDB
oracle.

ACF reads seasonality/persistence off an ingest-volume series,
Theil–Sen is the outlier-immune trend slope for drift monitors,
cross-correlation is the lead/lag detector between volume and value,
frequent triples extend the pair-level rule surface to bundles,
l-diversity/t-closeness close the gaps k-anonymity leaves, the Zipf
slope is a one-number corpus-quality screen, and JS divergence is the
bounded symmetric corpus distance for domain-mixture monitoring.
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
        WITH s AS (
            SELECT event_id AS k, floor(epoch(ts)) AS t, value AS v
            FROM events
            WHERE substr(md5('ts:' || CAST(event_id AS VARCHAR)), 1, 4)
                  < '0147'
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
    "slopes on a deterministic ~0.5% md5 sample (all-pairs is "
    "quadratic by definition; a few hundred points give a stable "
    "median and the sample reproduces under retry/engine swap) — "
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
        ev, "t_sec", "value", sample_hex="0147", seed_tag="ts",
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
        li, "l_orderkey", "l_partkey", min_support=1, top_n=20, max_basket=64
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
