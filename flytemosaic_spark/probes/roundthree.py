"""Round-3 additions: sequential-statistics operators (CUSUM change
detection, autocorrelation), graph neighborhoods, and basket
co-occurrence similarity.

Portability contract (same as probes/evaluation.py): state is integer
arithmetic wherever a float summation order could differ between
engines — event values quantize to cents once (floor(v*100+0.5),
identical on both engines since the stored doubles are identical),
and every window/aggregate then runs on exact integers; the only
float ops are final divisions/sqrts, which are single IEEE ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import portable_round
from flytemosaic_spark.plans.prefix import bounded_window
from flytemosaic_spark.probes.registry import T, probe

# CUSUM drift allowance and decision threshold, in cents. The
# allowance sits above the value mean (~49.6) so the statistic decays
# to zero between bursts; the threshold flags sustained high-value
# runs, not single spikes.
_CUSUM_ALLOWANCE_C = 6000
_CUSUM_H_C = 30000


@probe(
    "x110_cusum_anomaly",
    sql=f"""
        WITH s AS (
            SELECT user_id, event_id, ts,
                   CAST(floor(value * 100 + 0.5) AS BIGINT)
                       - {_CUSUM_ALLOWANCE_C} AS d
            FROM events
        ),
        p AS (
            SELECT user_id, event_id, ts,
                   sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS pre
            FROM s
        ),
        q AS (
            SELECT user_id, event_id, pre,
                   least(0, min(pre) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW)) AS floor_min
            FROM p
        )
        SELECT user_id, event_id,
               floor(((pre - floor_min) / 100.0) * 10000 + 0.5) / 10000
                   AS cusum,
               CAST(CASE WHEN pre - floor_min > {_CUSUM_H_C}
                         THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        FROM q
    """,
    note="CUSUM change detection per user: S_t = max(0, S_(t-1) + d_t) "
    "unrolled to the closed form S_t = P_t - min(0, min_(j<=t) P_j) — "
    "two windows sharing ONE per-user sort (running sum + running min "
    "of the running sum), O(1) state per key, no recursion. All "
    "arithmetic in integer cents so both engines agree bit-exactly; "
    "the threshold comparison is integer too, so flags can never "
    "diverge on a float ulp",
)
def x110_cusum_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = T(spark, sf, "events").select(
        "user_id",
        "event_id",
        "ts",
        (
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            - F.lit(_CUSUM_ALLOWANCE_C)
        ).alias("d"),
    )
    p = s.select(
        "user_id", "event_id", "ts", F.sum("d").over(w).alias("pre")
    )
    floor_min = F.least(F.lit(0).cast("bigint"), F.min("pre").over(w))
    cusum_c = F.col("pre") - floor_min
    return p.select(
        "user_id",
        "event_id",
        portable_round(cusum_c / F.lit(100.0), 4).alias("cusum"),
        (cusum_c > _CUSUM_H_C).cast("bigint").alias("is_anomaly"),
    )


@probe(
    "x111_acf",
    sql="""
        WITH base AS (
            SELECT user_id AS key, CAST(ts AS DATE) AS d,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
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
            SELECT grid.key, grid.day, coalesce(daily.v, 0) AS v
            FROM grid LEFT JOIN daily USING (key, day)
        ),
        lagk AS (
            SELECT a.key, k.lag AS lag, a.v AS x, b.v AS y
            FROM dense a
            JOIN (SELECT unnest([1, 2, 3]) AS lag) k ON true
            JOIN dense b ON a.key = b.key AND b.day = a.day + k.lag
        ),
        m AS (
            SELECT key, lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
            FROM lagk GROUP BY 1, 2
        )
        SELECT key AS user_id, CAST(lag AS BIGINT) AS lag,
               floor(((n * sxy - sx * sy)
                      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                             * CAST(n * syy - sy * sy AS DOUBLE)))
                     * 1000000 + 0.5) / 1000000 AS acf
        FROM m
        WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """,
    note="per-key lag-1..3 autocorrelation over the dense 30-day grid "
    "(operators/timeseries.py shape): daily sums quantized to integer "
    "cents, lagged pairs via a self-join on day+k, and the Pearson "
    "moments kept as exact integer sums — the only float ops are one "
    "sqrt and one division, bit-identical across engines. Per-key "
    "state is the grid length, flat in key cardinality",
)
def x111_acf(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.timeseries import daily_series

    ev = T(spark, sf, "events").select(
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
    )
    dense = daily_series(ev, "user_id", "ts", "vc").select(
        "key", "day", F.col("v").cast("bigint").alias("v")
    )
    lags = spark.range(1, 4).select(F.col("id").alias("lag"))
    a = dense.alias("a")
    b = dense.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("b.day") == F.col("a.day") + F.col("lag")),
        )
        .select(
            F.col("a.key").alias("key"),
            "lag",
            F.col("a.v").alias("x"),
            F.col("b.v").alias("y"),
        )
    )
    m = pairs.groupBy("key", "lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        m.where((vx > 0) & (vy > 0))
        .select(
            F.col("key").alias("user_id"),
            "lag",
            portable_round(
                cov / F.sqrt(vx.cast("double") * vy.cast("double")), 6
            ).alias("acf"),
        )
    )


@probe(
    "x112_khop_reach",
    sql="""
        WITH pw AS (
            SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS w
            FROM lineitem a
            JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ),
        e AS (SELECT u, v FROM pw WHERE w >= 2),
        sym AS (SELECT u AS node, v AS nb FROM e
                UNION ALL SELECT v, u FROM e),
        two AS (
            SELECT s1.node, s2.nb
            FROM sym s1 JOIN sym s2 ON s1.nb = s2.node
            WHERE s2.nb <> s1.node
        ),
        reach AS (
            SELECT DISTINCT node, nb FROM
                (SELECT node, nb FROM sym UNION ALL SELECT node, nb FROM two)
        )
        SELECT r.node AS l_partkey,
               d.n_1hop, count(*) AS n_2hop
        FROM reach r
        JOIN (SELECT node, count(*) AS n_1hop FROM sym GROUP BY node) d
          ON r.node = d.node
        GROUP BY r.node, d.n_1hop
    """,
    note="2-hop neighborhood size per node on the strong-tie "
    "co-purchase graph (part pairs sharing >= 2 orders — the weight "
    "threshold keeps the graph sparse BY CONSTRUCTION, so the wedge "
    "self-join stays near-linear instead of going quadratic on a "
    "dense co-occurrence graph; the same thresholding is how a "
    "100 TB co-occurrence expansion stays tractable). One basket "
    "self-join, one wedge join, one distinct",
)
def x112_khop_reach(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    # NOT localCheckpointed (r10 measured 2.55s -> 4.0s with a
    # checkpoint here): the four consumers' identical agg subtrees
    # share one ReusedExchange and overlap in one job, which beats
    # serializing an eager materialization before the main query.
    # Pair generation via ONE groupBy + posexplode instead of the
    # two-exchange self-join (the x104 recipe, guide §2.4); the
    # emitted per-order pair multiset is identical.
    grp = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("ps"))
        .where(F.size("ps") >= 2)
    )
    # collect_LIST + v > u: duplicates of one part in an order must
    # contribute n_x·n_y row pairs, exactly like the row self-join
    # the oracle counts (the _pairs_basket contract)
    e = (
        grp.select(F.posexplode("ps").alias("_i", "u"), "ps")
        .select(
            "u",
            F.explode(
                F.slice(F.col("ps"), F.col("_i") + 2, F.size("ps"))
            ).alias("v"),
        )
        .where(F.col("v") > F.col("u"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= 2)
        .select("u", "v")
    )
    # both directions from ONE evaluation of the pair aggregate (the
    # x104 corner-counts rule: unionAll branches re-run the final
    # aggregate even when the exchange below it is reused)
    sym = e.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("node"), F.col("v").alias("nb")),
                F.struct(
                    F.col("v").alias("node"), F.col("u").alias("nb")
                ),
            )
        ).alias("_e")
    ).select("_e.node", "_e.nb")
    s1, s2 = sym.alias("s1"), sym.alias("s2")
    two = s1.join(s2, F.col("s1.nb") == F.col("s2.node")).where(
        F.col("s2.nb") != F.col("s1.node")
    ).select(F.col("s1.node").alias("node"), F.col("s2.nb").alias("nb"))
    reach = sym.unionAll(two).distinct()
    deg = sym.groupBy("node").agg(F.count("*").alias("n_1hop"))
    return (
        reach.groupBy("node")
        .agg(F.count("*").alias("n_2hop"))
        .join(deg, "node")
        .select(F.col("node").alias("l_partkey"), "n_1hop", "n_2hop")
    )


@probe(
    "x113_cooccur_topk",
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
    note="item-item collaborative-filtering candidates: cosine "
    "similarity over basket co-occurrence counts (w_ij / "
    "sqrt(f_i f_j)), top-3 per item. COST-BASED plan selection "
    "(operators/recsys.cooccur_topk): sum k(k-1) from the catalog "
    "stats cache picks the per-order self-join below the measured "
    "crossover (~12M ordered pairs on 32 cores) and the one-shuffle "
    "basket-list expansion above it — so sf0.1 keeps the fast join "
    "and the 10x sweep gets the flat plan from the SAME probe. "
    "Counts and frequencies stay integer until one final division; "
    "ties break on the rounded score plus item id so the cutoff is "
    "engine-portable",
)
def x113_cooccur_topk(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.recsys import cooccur_topk

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    return cooccur_topk(
        li, "l_orderkey", "l_partkey", k=3, plan="auto", stats_key=sf
    ).select(
        F.col("item").alias("l_partkey"),
        "rnk",
        F.col("co_item").alias("co_partkey"),
        "cos_sim",
    )


@probe(
    "x114_feature_hashing",
    sql="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents
        ),
        h AS (
            SELECT doc_id,
                   ('0x' || substr(md5(w), 1, 15))::BIGINT AS hh
            FROM toks
        )
        SELECT doc_id, hh % 64 AS dim,
               sum(CASE WHEN (hh // 64) % 2 = 1 THEN 1 ELSE -1 END) AS weight
        FROM h GROUP BY 1, 2
    """,
    note="hashing-trick featurization (signed 64-bucket token counts, "
    "the Weinberger et al. feature-hashing scheme): md5 slot + sign "
    "bit per token, one map-side explode + one hash aggregate — "
    "feature width is fixed regardless of vocabulary, so no "
    "vocabulary table, no second pass, no shuffle beyond the "
    "(doc, dim) aggregate; all-integer state",
)
def x114_feature_hashing(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    t = T(spark, sf, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    )
    h = t.select(
        "doc_id",
        F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("bigint").alias("hh"),
    )
    sign = F.when(F.expr("(hh div 64) % 2") == 1, F.lit(1)).otherwise(F.lit(-1))
    return (
        h.groupBy("doc_id", (F.col("hh") % 64).alias("dim"))
        .agg(F.sum(sign).alias("weight"))
    )


@probe(
    "x115_random_projection",
    sql="""
        WITH comp AS (
            SELECT vec_id, j.j,
                   CAST(floor(CAST(embedding[j.j] AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS qv
            FROM embeddings
            CROSS JOIN (SELECT unnest(range(1, 65)) AS j) j
        ),
        signs AS (
            SELECT d.d, j.j,
                   CASE WHEN ('0x' || substr(md5(d.d || '_' || j.j), 1, 15))
                             ::BIGINT % 2 = 1
                        THEN 1 ELSE -1 END AS sgn
            FROM (SELECT unnest(range(0, 8)) AS d) d
            CROSS JOIN (SELECT unnest(range(1, 65)) AS j) j
        )
        SELECT vec_id, signs.d AS dim,
               floor((sum(sgn * qv) / 1000000.0 / sqrt(8.0))
                     * 1000000 + 0.5) / 1000000 AS value
        FROM comp JOIN signs ON comp.j = signs.j
        GROUP BY 1, 2
    """,
    note="Johnson-Lindenstrauss random projection 64d -> 8d with a "
    "deterministic md5 +/-1 sign matrix (the Achlioptas sparse-JL "
    "scheme): components quantized to integer micro-units once so "
    "the per-output-dim sums are exact in any accumulation order; "
    "the 8x64 sign matrix is a broadcast literal-scale table, the "
    "explode is map-side, and output is |vectors| x 8 rows — the "
    "cheap front-end that makes downstream LSH/clustering 8x "
    "narrower at 100 TB",
)
def x115_random_projection(spark: SparkSession, sf: str) -> DataFrame:
    emb = T(spark, sf, "embeddings")
    comp = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("j"),
        F.floor(F.col("v").cast("double") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("qv"),
    )
    dims = spark.range(0, 8).select(F.col("id").alias("d"))
    js = spark.range(1, 65).select(F.col("id").alias("j"))
    signs = dims.crossJoin(js).select(
        "d",
        "j",
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("_", F.col("d"), F.col("j"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 1,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    return (
        comp.join(F.broadcast(signs), "j")
        .groupBy("vec_id", F.col("d").alias("dim"))
        .agg(
            portable_round(
                F.sum(F.col("sgn") * F.col("qv"))
                / F.lit(1000000.0)
                / F.sqrt(F.lit(8.0)),
                6,
            ).alias("value")
        )
    )


@probe(
    "x116_pca_power",
    sql="""
        WITH q AS (
            SELECT list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                 AS BIGINT)) AS qv
            FROM embeddings
        ),
        cells AS (
            SELECT i.i AS i, j.i AS j, qv[i.i] * qv[j.i] AS pp
            FROM q,
                 LATERAL (SELECT unnest(range(1, 65)) AS i) i,
                 LATERAL (SELECT unnest(range(1, 65)) AS i) j
        ),
        second AS (SELECT i, j, sum(pp) AS s, count(*) AS n
                   FROM cells GROUP BY i, j),
        firstm AS (
            SELECT d.d AS d, sum(qv[d.d]) AS m
            FROM q, LATERAL (SELECT unnest(range(1, 65)) AS d) d
            GROUP BY d.d
        ),
        cov AS (
            SELECT s2.i, s2.j,
                   (s / n - (mi.m / n) * (mj.m / n)) / 1e12 AS c
            FROM second s2
            JOIN firstm mi ON s2.i = mi.d
            JOIN firstm mj ON s2.j = mj.d
        ),
        u1 AS (SELECT i, floor(sum(c * 0.125) * 1e10 + 0.5) / 1e10 AS u
               FROM cov GROUP BY i),
        n1 AS (SELECT sqrt(sum(u * u)) AS nrm FROM u1),
        v1 AS (SELECT i AS j,
                      CASE WHEN nrm > 0
                           THEN floor(u / nrm * 1e10 + 0.5) / 1e10
                           ELSE 0.0 END AS v
               FROM u1 CROSS JOIN n1),
        u2 AS (SELECT cov.i, floor(sum(c * v1.v) * 1e10 + 0.5) / 1e10 AS u
               FROM cov JOIN v1 ON cov.j = v1.j GROUP BY cov.i),
        n2 AS (SELECT sqrt(sum(u * u)) AS nrm FROM u2),
        v2 AS (SELECT i AS j,
                      CASE WHEN nrm > 0
                           THEN floor(u / nrm * 1e10 + 0.5) / 1e10
                           ELSE 0.0 END AS v
               FROM u2 CROSS JOIN n2),
        u3 AS (SELECT cov.i, floor(sum(c * v2.v) * 1e10 + 0.5) / 1e10 AS u
               FROM cov JOIN v2 ON cov.j = v2.j GROUP BY cov.i),
        n3 AS (SELECT sqrt(sum(u * u)) AS nrm FROM u3),
        v3 AS (SELECT i AS j,
                      CASE WHEN nrm > 0
                           THEN floor(u / nrm * 1e10 + 0.5) / 1e10
                           ELSE 0.0 END AS v
               FROM u3 CROSS JOIN n3)
        SELECT CAST(v3.j AS BIGINT) AS dim, v3.v AS loading,
               floor(n3.nrm * 1000000 + 0.5) / 1000000 AS eigenvalue
        FROM v3 CROSS JOIN n3
    """,
    note="top principal component by 3 power iterations "
    "(operators/similarity.py:pca_power_component): covariance from "
    "integer micro-unit moments (bit-exact on any engine — no "
    "rounding grain in the matrix itself), then each mat-vec and "
    "normalized vector rounds half-up at 1e-10 (the pagerank idiom). "
    "The dims^2 moment table is one pass over the vectors and is "
    "cached once; per-iteration cost is a dims^2-row join against a "
    "broadcast dims-row vector — independent of corpus size",
)
def x116_pca_power(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.similarity import pca_power_component

    return pca_power_component(T(spark, sf, "embeddings"))


@probe(
    "x117_seasonal_backtest",
    sql="""
        WITH base AS (
            SELECT user_id AS key, CAST(ts AS DATE) AS d,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
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
            SELECT grid.key, grid.day, coalesce(daily.v, 0) AS v
            FROM grid LEFT JOIN daily USING (key, day)
        ),
        bt AS (
            SELECT a.key, a.v AS actual, f.v AS forecast
            FROM dense a JOIN dense f
              ON a.key = f.key AND f.day = a.day - 7
            WHERE a.day >= 8
        ),
        agg AS (
            SELECT key, sum(abs(forecast - actual)) AS sae,
                   sum(forecast - actual) AS se, sum(actual) AS sa
            FROM bt GROUP BY key
        )
        SELECT key AS user_id,
               floor((sae / sa) * 1000000 + 0.5) / 1000000 AS wape,
               floor((se / sa) * 1000000 + 0.5) / 1000000 AS bias
        FROM agg WHERE sa > 0
    """,
    note="seasonal-naive forecast backtest: predict each day by the "
    "same weekday last week over the dense 30-day grid, score per "
    "user with WAPE (sum-abs-error / sum-actual — robust to zero "
    "days, unlike MAPE) and signed bias. Error sums stay integer "
    "cents, so the only float op is the final ratio; the lag-7 "
    "'join' is a per-key self-join on the fixed grid — state per key "
    "is the grid length",
)
def x117_seasonal_backtest(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.timeseries import daily_series

    ev = T(spark, sf, "events").select(
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
    )
    dense = daily_series(ev, "user_id", "ts", "vc").select(
        "key", "day", F.col("v").cast("bigint").alias("v")
    )
    a, f = dense.alias("a"), dense.alias("f")
    bt = (
        a.join(
            f,
            (F.col("a.key") == F.col("f.key"))
            & (F.col("f.day") == F.col("a.day") - 7),
        )
        .where(F.col("a.day") >= 8)
        .select(
            F.col("a.key").alias("key"),
            F.col("a.v").alias("actual"),
            F.col("f.v").alias("forecast"),
        )
    )
    agg = bt.groupBy("key").agg(
        F.sum(F.abs(F.col("forecast") - F.col("actual"))).alias("sae"),
        F.sum(F.col("forecast") - F.col("actual")).alias("se"),
        F.sum("actual").alias("sa"),
    )
    return agg.where(F.col("sa") > 0).select(
        F.col("key").alias("user_id"),
        portable_round(F.col("sae") / F.col("sa"), 6).alias("wape"),
        portable_round(F.col("se") / F.col("sa"), 6).alias("bias"),
    )


@probe(
    "x118_chi2_features",
    sql="""
        WITH d AS (
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                   list_distinct(string_split_regex(trim(text), '\\s+')) AS ws
            FROM documents
        ),
        tot AS (SELECT count(*) AS n, sum(y) AS npos FROM d),
        tok AS (
            SELECT unnest(ws) AS w, y FROM d
        ),
        cnt AS (
            SELECT w, count(*) AS m, sum(y) AS n11
            FROM tok GROUP BY w HAVING count(*) >= 5
        ),
        chi AS (
            SELECT w,
                   CAST(n AS DOUBLE)
                       * CAST(n11 * (n - npos - (m - n11))
                              - (m - n11) * (npos - n11) AS DOUBLE)
                       * CAST(n11 * (n - npos - (m - n11))
                              - (m - n11) * (npos - n11) AS DOUBLE)
                       / (CAST(m * (n - m) AS DOUBLE)
                          * CAST(npos * (n - npos) AS DOUBLE)) AS chi2
            FROM cnt CROSS JOIN tot
        )
        SELECT w AS token,
               floor(chi2 * 10000 + 0.5) / 10000 AS chi2
        FROM chi
        ORDER BY chi2 DESC, token LIMIT 50
    """,
    note="chi-squared feature screen: token presence vs the language "
    "label (the classical alternative to x93's mutual information). "
    "Contingency cells are integer counts from ONE distinct-token "
    "explode + hash-agg; the statistic is computed in exact-integer "
    "cross products cast to double at fixed points, so both engines "
    "agree bit-exactly; top-50 by rounded score via "
    "TakeOrderedAndProject — no global sort materialization",
)
def x118_chi2_features(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    d = T(spark, sf, "documents").select(
        "doc_id",
        (F.col("lang") == "en").cast("bigint").alias("y"),
        F.array_distinct(tokens(F.col("text"))).alias("ws"),
    )
    tot = d.agg(F.count("*").alias("n"), F.sum("y").alias("npos"))
    cnt = (
        d.select(F.explode("ws").alias("w"), "y")
        .groupBy("w")
        .agg(F.count("*").alias("m"), F.sum("y").alias("n11"))
        .where(F.col("m") >= 5)
    )
    n, npos, m, n11 = F.col("n"), F.col("npos"), F.col("m"), F.col("n11")
    det = n11 * (n - npos - (m - n11)) - (m - n11) * (npos - n11)
    chi2 = (
        n.cast("double")
        * det.cast("double")
        * det.cast("double")
        / ((m * (n - m)).cast("double") * (npos * (n - npos)).cast("double"))
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            F.col("w").alias("token"),
            portable_round(chi2, 4).alias("chi2"),
        )
        .orderBy(F.col("chi2").desc(), "token")
        .limit(50)
    )


# NDCG position discounts 1/log2(rank+1) as double literals — decimal
# literals parse to the identical nearest double on both engines, so
# no transcendental is evaluated at query time.
_NDCG_DISCOUNT = "CASE rnk WHEN 1 THEN 1.0 WHEN 2 THEN 0.6309297535714575 ELSE 0.5 END"


@probe(
    "x119_ndcg",
    sql=f"""
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
            SELECT sym.u, sym.v, sym.w,
                   floor((sym.w / sqrt(CAST(fu.nf * fv.nf AS DOUBLE)))
                         * 1000000 + 0.5) / 1000000 AS cos_sim
            FROM sym
            JOIN f fu ON sym.u = fu.item
            JOIN f fv ON sym.v = fv.item
        ),
        by_model AS (
            SELECT u, w, row_number() OVER (PARTITION BY u
                ORDER BY cos_sim DESC, v) AS rnk
            FROM sc
        ),
        by_ideal AS (
            SELECT u, w, row_number() OVER (PARTITION BY u
                ORDER BY w DESC, v) AS rnk
            FROM sc
        ),
        dcg AS (
            SELECT u, sum(w * ({_NDCG_DISCOUNT})) AS dcg
            FROM by_model WHERE rnk <= 3 GROUP BY u
        ),
        idcg AS (
            SELECT u, sum(w * ({_NDCG_DISCOUNT})) AS idcg
            FROM by_ideal WHERE rnk <= 3 GROUP BY u
        )
        SELECT dcg.u AS l_partkey,
               floor((dcg / idcg) * 1000000 + 0.5) / 1000000 AS ndcg
        FROM dcg JOIN idcg ON dcg.u = idcg.u
    """,
    note="NDCG@3 ranking quality of the cosine co-occurrence ranking "
    "(x113) against raw co-purchase weight as graded relevance: "
    "model-ranked DCG over ideal-ranked IDCG per item. Position "
    "discounts are double LITERALS (no query-time transcendental, so "
    "no libm ulp divergence); gains are integer weights times a "
    "3-term discount sum — both ranking windows are partitioned per "
    "item and share the scored-pair aggregate",
)
def x119_ndcg(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.graph import grouped_pairs

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    # list-per-order positional emission == the < self-join's row-pair
    # multiset (n_x·n_y per order), after ONE exchange instead of two
    # (r10, the x112 pair-generation recipe)
    pw = (
        grouped_pairs(li, "l_orderkey", "l_partkey", distinct=False)
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
    )
    sym = pw.unionAll(pw.select(F.col("v"), F.col("u"), F.col("w")))
    f = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.countDistinct("l_orderkey").alias("nf")
    )
    fu = f.select(F.col("item").alias("u"), F.col("nf").alias("nfu"))
    fv = f.select(F.col("item").alias("v"), F.col("nf").alias("nfv"))
    sc = sym.join(fu, "u").join(fv, "v").select(
        "u",
        "v",
        "w",
        portable_round(
            F.col("w") / F.sqrt((F.col("nfu") * F.col("nfv")).cast("double")),
            6,
        ).alias("cos_sim"),
    ).cache()
    disc = F.expr(_NDCG_DISCOUNT)
    w_model = Window.partitionBy("u").orderBy(F.col("cos_sim").desc(), "v")
    w_ideal = Window.partitionBy("u").orderBy(F.col("w").desc(), "v")
    dcg = (
        sc.withColumn("rnk", F.row_number().over(w_model))
        .where(F.col("rnk") <= 3)
        .groupBy("u")
        .agg(F.sum(F.col("w") * disc).alias("dcg"))
    )
    idcg = (
        sc.withColumn("rnk", F.row_number().over(w_ideal))
        .where(F.col("rnk") <= 3)
        .groupBy("u")
        .agg(F.sum(F.col("w") * disc).alias("idcg"))
    )
    return dcg.join(idcg, "u").select(
        F.col("u").alias("l_partkey"),
        portable_round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


@probe(
    "x120_mlm_masking",
    sql="""
        WITH toks AS (
            SELECT doc_id, p.p AS pos, ws[p.p] AS w, len(ws) AS n
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\\s+') AS ws
                  FROM documents),
                 LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS p) p
        ),
        h AS (
            SELECT doc_id, pos, w, n,
                   ('0x' || substr(md5(doc_id || ':' || pos), 1, 15))::BIGINT
                       AS hh
            FROM toks
        ),
        dec AS (
            SELECT doc_id, pos, w, n, hh % 100 < 15 AS masked,
                   (hh // 100) % 10 AS branch,
                   1 + ((hh // 1000) % n) AS rep_pos
            FROM h
        )
        SELECT d.doc_id, d.pos,
               CASE WHEN NOT d.masked THEN d.w
                    WHEN d.branch <= 7 THEN '[MASK]'
                    WHEN d.branch = 8 THEN r.w
                    ELSE d.w END AS input_token,
               CASE WHEN d.masked THEN d.w END AS label
        FROM dec d
        JOIN dec r ON d.doc_id = r.doc_id AND r.pos = d.rep_pos
    """,
    note="deterministic BERT-style MLM masking: 15% of positions "
    "selected by md5(doc:pos), split 80/10/10 into [MASK] / random "
    "in-document replacement / keep — retry-stable (no rand()), "
    "map-side except one per-document positional self-join for the "
    "random-replacement branch; label column carries the original "
    "token only at masked positions",
)
def x120_mlm_masking(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    toks = (
        T(spark, sf, "documents")
        .select("doc_id", tokens(F.col("text")).alias("ws"))
        .select(
            "doc_id",
            F.size("ws").alias("n"),
            F.posexplode("ws").alias("p0", "w"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "w", "n")
    )
    hh = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id"), F.col("pos"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    dec = toks.withColumn("hh", hh).select(
        "doc_id",
        "pos",
        "w",
        (F.col("hh") % 100 < 15).alias("masked"),
        F.expr("(hh div 100) % 10").cast("bigint").alias("branch"),
        (F.lit(1) + (F.expr("hh div 1000").cast("bigint") % F.col("n"))).alias(
            "rep_pos"
        ),
    )
    d, r = dec.alias("d"), dec.alias("r")
    return d.join(
        r,
        (F.col("d.doc_id") == F.col("r.doc_id"))
        & (F.col("r.pos") == F.col("d.rep_pos")),
    ).select(
        F.col("d.doc_id").alias("doc_id"),
        F.col("d.pos").alias("pos"),
        F.when(~F.col("d.masked"), F.col("d.w"))
        .when(F.col("d.branch") <= 7, F.lit("[MASK]"))
        .when(F.col("d.branch") == 8, F.col("r.w"))
        .otherwise(F.col("d.w"))
        .alias("input_token"),
        F.when(F.col("d.masked"), F.col("d.w")).alias("label"),
    )


@probe(
    "x121_curriculum_order",
    sql="""
        WITH d AS (
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS difficulty,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       ::BIGINT AS h
            FROM documents
        )
        SELECT doc_id, CAST(difficulty AS BIGINT) AS difficulty,
               row_number() OVER (ORDER BY difficulty, h, doc_id)
                   AS curriculum_rank
        FROM d
    """,
    note="curriculum training order (easy-to-hard by token count, "
    "md5 tie-scatter so equal-length docs interleave deterministically) "
    "as an EXACT global rank with no single-partition sort: per-bucket "
    "row_number windows (partitioned) plus an exclusive prefix of "
    "bucket counts — the oracle's global ORDER BY replayed with "
    "bounded per-task state, the same decomposition as "
    "plans/prefix.py. This is how a 100 TB corpus gets a total "
    "training order",
)
def x121_curriculum_order(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    d = T(spark, sf, "documents").select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("difficulty"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    b = d.withColumn("bucket", F.expr("difficulty div 50"))
    counts = b.groupBy("bucket").agg(F.count("*").alias("cnt"))
    w_off = bounded_window("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )
    w_in = Window.partitionBy("bucket").orderBy("difficulty", "h", "doc_id")
    return (
        b.withColumn("rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "difficulty",
            (F.col("off") + F.col("rn")).alias("curriculum_rank"),
        )
    )


@probe(
    "x122_patch_pooling",
    sql="""
        WITH px AS (
            SELECT doc_id, i.i AS i,
                   ('0x' || substr(md5(doc_id || ':' || i.i), 1, 15))::BIGINT
                       % 256 AS p
            FROM documents,
                 LATERAL (SELECT unnest(range(0, 256)) AS i) i
        ),
        tiles AS (
            SELECT doc_id,
                   (i // 16) // 4 AS py, (i % 16) // 4 AS px_idx, p
            FROM px
        )
        SELECT doc_id, CAST(py AS BIGINT) AS py,
               CAST(px_idx AS BIGINT) AS px,
               sum(p) / count(*) AS mean_px,
               CAST(max(p) AS BIGINT) AS max_px
        FROM tiles GROUP BY 1, 2, 3
    """,
    note="declarative twin of operators/multimodal.py:extract_patches "
    "(ViT patch pooling) on a deterministic md5 16x16 image per doc: "
    "patch-grid indexing is integer division on the pixel index, "
    "pooling is an integer hash-agg, one division at the end. The "
    "REAL binary-payload path (numpy reshape pooling over "
    "mapInPandas) is equivalence-tested in tests/test_multimodal.py; "
    "this probe oracle-checks the pooling math end-to-end",
)
def x122_patch_pooling(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(255))).alias("i")
    )
    p = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("i"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 256
    )
    tiles = d.select(
        "doc_id",
        F.expr("(i div 16) div 4").alias("py"),
        F.expr("(i % 16) div 4").alias("px"),
        p.alias("p"),
    )
    return tiles.groupBy("doc_id", "py", "px").agg(
        (F.sum("p") / F.count("*")).alias("mean_px"),
        F.max("p").alias("max_px"),
    )


# one BPE pair-count round in SQL, parameterized by the input seq CTE
def _bpe_round_sql(seq: str, p: str, b: str, nxt: str) -> str:
    return f"""
        {p} AS (
            SELECT sy.a[i.i] AS left_sym, sy.a[i.i + 1] AS right_sym,
                   sum(sy.c) AS pair_count
            FROM (SELECT c, list_filter(string_split(s, '\u00b7'),
                                        x -> x <> '') AS a
                  FROM {seq}) sy,
                 LATERAL (SELECT unnest(range(1, len(sy.a))) AS i) i
            GROUP BY 1, 2
        ),
        {b} AS (
            SELECT left_sym, right_sym, pair_count FROM {p}
            ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1
        ),
        {nxt} AS (
            SELECT c,
                   replace(s,
                           '\u00b7' || left_sym || '\u00b7\u00b7'
                               || right_sym || '\u00b7',
                           '\u00b7' || left_sym || right_sym || '\u00b7') AS s
            FROM {seq} CROSS JOIN {b}
        )"""


_BPE_SQL = (
    """
        WITH words AS (
            SELECT w, count(*) AS c FROM (
                SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
                FROM documents)
            WHERE w <> '' GROUP BY w
        ),
        seq0 AS (
            SELECT c,
                   regexp_replace(w, '(.)', '·\\1·', 'g') AS s
            FROM words
        ),"""
    + _bpe_round_sql("seq0", "p1", "b1", "seq1")
    + ","
    + _bpe_round_sql("seq1", "p2", "b2", "seq2")
    + ","
    + _bpe_round_sql("seq2", "p3", "b3", "seq3")
    + """
        SELECT CAST(1 AS BIGINT) AS round, left_sym, right_sym,
               CAST(pair_count AS BIGINT) AS pair_count FROM b1
        UNION ALL
        SELECT CAST(2 AS BIGINT), left_sym, right_sym,
               CAST(pair_count AS BIGINT) FROM b2
        UNION ALL
        SELECT CAST(3 AS BIGINT), left_sym, right_sym,
               CAST(pair_count AS BIGINT) FROM b3
    """
)


@probe(
    "x123_bpe_merges",
    sql=_BPE_SQL,
    note="BPE tokenizer induction (operators/bpe.py): 3 merge rounds "
    "learned over the corpus — each round one adjacent-pair explode + "
    "weighted hash-agg + 1-row broadcast argmax + map-side string "
    "replace (left-to-right non-overlapping in both engines = BPE's "
    "greedy application order). State is the DISTINCT-word table "
    "(vocabulary-scale, counts folded in at the first aggregate), so "
    "round cost is flat in corpus size; rounds are checkpointed so "
    "round k+1 never re-executes round k",
)
def x123_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.bpe import learn_bpe_merges

    return learn_bpe_merges(T(spark, sf, "documents"))


_BPE_SEG_SQL = (
    _BPE_SQL.split("SELECT CAST(1 AS BIGINT)")[0]
    + """
        SELECT sy.sym, CAST(sum(sy.c) AS BIGINT) AS n_tokens
        FROM (SELECT c, unnest(list_filter(string_split(s, '·'),
                                           x -> x <> '')) AS sym
              FROM seq3) sy
        GROUP BY sy.sym
        ORDER BY n_tokens DESC, sym LIMIT 20
    """
)


@probe(
    "x125_bpe_segment",
    sql=_BPE_SEG_SQL,
    note="APPLY the learned BPE merges (x123): segment the corpus with "
    "the final merge state and report the top-20 vocabulary symbols by "
    "usage — the train->apply loop closed. Deterministic cutoff "
    "(count desc, symbol) via TakeOrderedAndProject; the oracle "
    "replays all three merge rounds and the segmentation",
)
def x125_bpe_segment(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.bpe import bpe_vocab_counts

    return bpe_vocab_counts(T(spark, sf, "documents"))


@probe(
    "x126_preference_pairs",
    sql="""
        WITH base AS (
            SELECT doc_id, source,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+'))
                   END AS n,
                   CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
                        ELSE len(list_filter(
                                 string_split_regex(trim(text), '\\s+'),
                                 t -> t IN ('the','and','of','a','to','in','is')))
                   END AS stops,
                   text
            FROM documents
        ),
        q AS (
            SELECT doc_id, source,
                   floor((
                       least(CAST(n AS DOUBLE) / 100.0, 1.0) * 0.5
                       + least((stops / CAST(greatest(n, 1) AS DOUBLE)) * 5.0,
                               1.0) * 0.3
                       + (1.0 - least(((length(text)
                            - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                            / CAST(greatest(length(text), 1) AS DOUBLE))
                            * 10.0, 1.0)) * 0.2
                   ) * 10000 + 0.5) / 10000.0 AS quality
            FROM base
        ),
        ranked AS (
            SELECT source, doc_id, quality,
                   row_number() OVER (PARTITION BY source
                       ORDER BY quality DESC, doc_id) AS r_best,
                   row_number() OVER (PARTITION BY source
                       ORDER BY quality ASC, doc_id) AS r_worst
            FROM q
        )
        SELECT b.source, b.doc_id AS chosen_doc, w.doc_id AS rejected_doc,
               b.quality AS chosen_q, w.quality AS rejected_q,
               floor((b.quality - w.quality) * 10000 + 0.5) / 10000 AS gap
        FROM (SELECT * FROM ranked WHERE r_best = 1) b
        JOIN (SELECT * FROM ranked WHERE r_worst = 1) w USING (source)
    """,
    note="preference-pair mining (the DPO/RLHF data shape): per source, "
    "pair the highest-quality document (chosen) with the lowest "
    "(rejected) on the shared x9 quality score — two rankings over ONE "
    "per-source sort-ready aggregate, deterministic (rounded score + "
    "doc-id tie-break), integer-free gap computed from the two rounded "
    "scores identically on both engines",
)
def x126_preference_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators import text as T_

    q = F.floor(
        T_.quality_score(F.col("text")) * 10000 + F.lit(0.5)
    ).cast("double") / F.lit(10000.0)
    scored = T(spark, sf, "documents").select(
        "doc_id", "source", q.alias("quality")
    )
    w_best = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), "doc_id"
    )
    w_worst = Window.partitionBy("source").orderBy(
        F.col("quality").asc(), "doc_id"
    )
    ranked = scored.select(
        "source",
        "doc_id",
        "quality",
        F.row_number().over(w_best).alias("r_best"),
        F.row_number().over(w_worst).alias("r_worst"),
    )
    best = ranked.where(F.col("r_best") == 1).select(
        "source",
        F.col("doc_id").alias("chosen_doc"),
        F.col("quality").alias("chosen_q"),
    )
    worst = ranked.where(F.col("r_worst") == 1).select(
        "source",
        F.col("doc_id").alias("rejected_doc"),
        F.col("quality").alias("rejected_q"),
    )
    return best.join(worst, "source").select(
        "source",
        "chosen_doc",
        "rejected_doc",
        "chosen_q",
        "rejected_q",
        portable_round(F.col("chosen_q") - F.col("rejected_q"), 4).alias("gap"),
    )


@probe(
    "x127_phrase_search",
    sql="""
        WITH p AS (
            SELECT doc_id, i.i AS pos, ws[i.i] AS tok
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\\s+') AS ws
                  FROM documents),
                 LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) i
            WHERE ws[i.i] IN ('table', 'hash')
        )
        SELECT a.doc_id, count(*) AS n_hits,
               CAST(min(a.pos) AS BIGINT) AS first_pos
        FROM p a
        JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.tok = 'table' AND b.tok = 'hash'
        GROUP BY a.doc_id
    """,
    note="positional-index phrase search (the IR primitive behind "
    "exact-phrase retrieval): postings (doc, pos, token) filtered to "
    "the phrase's terms BEFORE the adjacency self-join on "
    "(doc, pos+1), so the join touches only candidate postings — at "
    "100 TB the posting list is the selective index, never the "
    "corpus. Integer positions, integer hit counts",
)
def x127_phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    p = (
        T(spark, sf, "documents")
        .select("doc_id", F.posexplode(tokens(F.col("text"))).alias("p0", "tok"))
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
        .where(F.col("tok").isin("table", "hash"))
    )
    a = p.where(F.col("tok") == "table").alias("a")
    b = p.where(F.col("tok") == "hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(
            F.count("*").alias("n_hits"),
            F.min(F.col("a.pos")).cast("bigint").alias("first_pos"),
        )
    )


@probe(
    "x128_robust_scale",
    sql="""
        WITH med AS (
            SELECT lang, quantile_cont(n_chars, 0.5) AS m
            FROM documents GROUP BY lang
        ),
        mad AS (
            SELECT d.lang,
                   quantile_cont(abs(d.n_chars - med.m), 0.5) AS mad
            FROM documents d JOIN med USING (lang)
            GROUP BY d.lang
        )
        SELECT d.doc_id, d.lang,
               floor(((d.n_chars - med.m) / (mad.mad * 1.4826))
                     * 1000000 + 0.5) / 1000000 AS robust_z
        FROM documents d
        JOIN med USING (lang) JOIN mad USING (lang)
        WHERE mad.mad > 0
    """,
    note="robust z-score (median/MAD — the outlier-resistant scaler "
    "that x75's mean/std z-score is not): two exact-percentile "
    "aggregates per group (Spark percentile and DuckDB quantile_cont "
    "share (n-1)p interpolation, bit-exact — the a16 contract), "
    "group-scale stat tables broadcast back; 1.4826 consistency "
    "constant as a literal",
)
def x128_robust_scale(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    med = d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("m")
    )
    with_m = d.join(F.broadcast(med), "lang")
    mad = with_m.groupBy("lang").agg(
        F.percentile(F.abs(F.col("n_chars") - F.col("m")), F.lit(0.5)).alias(
            "mad"
        )
    )
    return (
        with_m.join(F.broadcast(mad), "lang")
        .where(F.col("mad") > 0)
        .select(
            "doc_id",
            "lang",
            portable_round(
                (F.col("n_chars") - F.col("m"))
                / (F.col("mad") * F.lit(1.4826)),
                6,
            ).alias("robust_z"),
        )
    )
