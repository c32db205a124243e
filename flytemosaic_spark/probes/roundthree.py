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
