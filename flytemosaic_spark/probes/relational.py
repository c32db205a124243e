"""Relational probes: scans, projections/filters, joins, aggregations,
windows, set ops (SURVEY §2.1-§2.6).

Every probe mirrors a concrete operator in the reference engine (the
`file:line` citations point into /root/reference) re-expressed as the
idiomatic Catalyst plan: broadcast joins for dimensions, partial
aggregation for group-bys, `explode(sequence(...))` for interval
expansion, bucketed equi-join + refine for interval-overlap joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flytemosaic_spark.probes.registry import T, probe

# --------------------------------------------------------------------------
# §2.1 scans
# --------------------------------------------------------------------------


@probe(
    "s1_scan_rename",
    sql="SELECT n_nationkey AS nation_key, n_name, n_regionkey FROM nation",
    note="parquet scan + column rename (ref glad.py:39-47)",
)
def s1_scan_rename(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "nation").withColumnRenamed("n_nationkey", "nation_key")


# --------------------------------------------------------------------------
# §2.2 projections / filters
# --------------------------------------------------------------------------


@probe(
    "p1_projection",
    sql="SELECT l_orderkey, l_quantity FROM lineitem",
    note="column projection (ref glad.py:239)",
)
def p1_projection(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").select("l_orderkey", "l_quantity")


@probe(
    "p2_derived_column",
    sql="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
    """,
    note="withColumn derived expression (ref glad.py:51-57)",
)
def p2_derived_column(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@probe(
    "p3_rename_drop",
    sql="SELECT c_custkey, c_name AS name, c_nationkey, c_mktsegment FROM customer",
    note="rename/drop (ref glad.py:47, scenes.py:55)",
)
def p3_rename_drop(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "customer")
        .withColumnRenamed("c_name", "name")
        .drop("c_acctbal")
    )


@probe(
    "p4_range_filter",
    sql="SELECT * FROM part WHERE p_size BETWEEN 10 AND 20",
    note="range predicate ~ bbox overlap prefilter (ref glad.py:236-239); pushed to parquet scan",
)
def p4_range_filter(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "part").filter(F.col("p_size").between(10, 20))


@probe(
    "p5_negated_filter",
    sql="SELECT o_orderkey, o_orderstatus FROM orders WHERE NOT (o_orderstatus = 'O')",
    note="negated boolean-mask filter (ref scenes.py:99)",
)
def p5_negated_filter(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .filter(~(F.col("o_orderstatus") == "O"))
        .select("o_orderkey", "o_orderstatus")
    )


@probe(
    "p6_batch_assign",
    sql="""
        SELECT o_orderkey,
               CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 100) AS BIGINT) AS batch
        FROM orders
    """,
    note="row-range batching (ref scenes.py:69); distributed row_number "
    "(plans/prefix.py bucket decomposition — no single-partition window) "
    "+ floor-div",
)
def p6_batch_assign(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.plans.prefix import distributed_row_number

    rn = distributed_row_number(
        T(spark, sf, "orders").select("o_orderkey"), ("o_orderkey",), out_col="_rn"
    )
    return rn.select(
        "o_orderkey",
        F.floor((F.col("_rn") - 1) / 100).cast("bigint").alias("batch"),
    )


@probe(
    "p7_masked_avg",
    sql="""
        SELECT round(avg(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS masked_avg
        FROM lineitem
    """,
    note="QA-mask as conditional aggregation (ref glad.py:260-261)",
)
def p7_masked_avg(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").agg(
        F.round(
            F.avg(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))), 4
        ).alias("masked_avg")
    )


@probe(
    "p8_array_slice",
    sql="""
        SELECT vec_id,
               len(embedding[1:4]) AS head_len,
               floor(list_sum(embedding[1:4]) * 10000.0 + 0.5) / 10000.0 AS head_sum
        FROM embeddings
    """,
    note="band slice ~ array slice (ref glad.py:262). The slice itself is "
    "computed in both engines; the probe projects scalar views of it "
    "(length + left-to-right sum) because the driver's canonical hasher "
    "sorts pandas frames and list cells are unhashable (round-1 failure).",
)
def p8_array_slice(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    head4 = F.slice("embedding", 1, 4)
    return T(spark, sf, "embeddings").select(
        "vec_id",
        F.size(head4).alias("head_len"),
        portable_round(
            F.aggregate(head4, F.lit(0.0), lambda acc, x: acc + x)
        ).alias("head_sum"),
    )


@probe(
    "p9_cast",
    sql="""
        SELECT l_orderkey, l_linenumber, CAST(l_quantity AS REAL) AS qty_f32
        FROM lineitem
    """,
    note="dtype cast (ref glad.py:264 astype float32)",
)
def p9_cast(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("float").alias("qty_f32")
    )


# --------------------------------------------------------------------------
# §2.3 joins
# --------------------------------------------------------------------------


@probe(
    "j1_interval_join",
    sql="""
        SELECT o.o_orderpriority, count(*) AS n_pairs
        FROM orders o
        JOIN lineitem l
          ON l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
        GROUP BY o.o_orderpriority
    """,
    note=(
        "interval-overlap join ~ spatial intersects join (ref glad.py:236-239). "
        "Spark side: (1) push the aggregation BELOW the join — collapse lineitem "
        "to per-day counts first, so the interval join touches ~days, not ~rows; "
        "(2) bucket both sides on an 8-day grid and equi-join on the bucket "
        "before the exact range refine. A naive theta join is quadratic in rows "
        "at 100 TB; this is linear scan + a broadcast of the tiny daily rollup."
    ),
)
def j1_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    window_days = 7
    bucket_days = window_days + 1
    orders = T(spark, sf, "orders").select(
        "o_orderpriority",
        "o_orderdate",
        F.floor(F.unix_date(F.to_date("o_orderdate")) / bucket_days).alias("b0"),
    )
    # an order's [t, t+7d] window spans at most two 8-day buckets
    orders = orders.withColumn("bucket", F.explode(F.expr("sequence(b0, b0 + 1)")))
    # pre-aggregate: the count over pairs only needs lineitems-per-day
    li_daily = (
        T(spark, sf, "lineitem")
        .groupBy(F.to_date("l_shipdate").alias("ship_day"))
        .agg(F.count("*").alias("n_li"))
        .withColumn("bucket", F.floor(F.unix_date(F.col("ship_day")) / bucket_days))
    )
    pairs = orders.join(F.broadcast(li_daily), "bucket").where(
        (F.col("ship_day") >= F.to_date("o_orderdate"))
        & (F.col("ship_day") <= F.date_add(F.to_date("o_orderdate"), window_days))
    )
    return pairs.groupBy("o_orderpriority").agg(
        F.sum("n_li").cast("bigint").alias("n_pairs")
    )


@probe(
    "j2_lookup_broadcast",
    sql="""
        SELECT c.c_custkey, c.c_name, n.n_name
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    note="dimension lookup via broadcast hash join (ref glad.py:241-243)",
)
def j2_lookup_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "n_name"
    )


@probe(
    "j3_equi_join",
    sql="""
        SELECT o.o_orderkey, c.c_name, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    note="fact-dimension equi-join (ref build.py:141-144)",
)
def j3_equi_join(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@probe(
    "j4_anti_join",
    sql="""
        SELECT o_orderkey FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
    note="left anti-join — the incremental-compute core (ref scenes.py:115-138)",
)
def j4_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select("o_orderkey")


@probe(
    "j5_semi_join",
    sql="""
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    note="left semi-join keeps successful rows (ref glad.py:153-161)",
)
def j5_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@probe(
    "j6_cross_join",
    sql="SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
    note="cartesian expansion tiles × times (ref protocols.py:329-332)",
)
def j6_cross_join(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "region").select("r_name").crossJoin(
        T(spark, sf, "nation").select("n_name")
    )


@probe(
    "j7_series_expansion",
    sql="""
        SELECT o_orderkey,
               unnest(generate_series(o_orderdate - INTERVAL 30 DAY, o_orderdate,
                                      INTERVAL 10 DAY)) AS d
        FROM orders
    """,
    note="time-range expansion join via explode(sequence(...)) (ref glad.py:163-186)",
)
def j7_series_expansion(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").select(
        "o_orderkey",
        F.explode(
            F.sequence(
                F.col("o_orderdate") - F.expr("INTERVAL 30 DAYS"),
                F.col("o_orderdate"),
                F.expr("INTERVAL 10 DAYS"),
            )
        ).alias("d"),
    )


# --------------------------------------------------------------------------
# §2.4 aggregations
# --------------------------------------------------------------------------


@probe(
    "a1_groupby_count",
    sql="SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority",
    note="group-by split (ref scenes.py:66,117,151)",
)
def a1_groupby_count(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").groupBy("o_orderpriority").agg(F.count("*").alias("n"))


@probe(
    "a2_distinct",
    sql="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    note="full-row distinct (ref scenes.py:52)",
)
def a2_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@probe(
    "a3_dedup_subset",
    sql="SELECT count(DISTINCT o_custkey) AS n_custs FROM orders",
    note="dropDuplicates on key subset, probed as count (ref scenes.py:129)",
)
def a3_dedup_subset(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .dropDuplicates(["o_custkey"])
        .agg(F.count("*").alias("n_custs"))
    )


@probe(
    "a4_distinct_count",
    sql="SELECT count(DISTINCT l_suppkey) AS n_supps FROM lineitem",
    note="unique values (ref build.py:59-60)",
)
def a4_distinct_count(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").agg(
        F.countDistinct("l_suppkey").alias("n_supps")
    )


@probe(
    "a5_distinct_series",
    sql="""
        SELECT DISTINCT
               392 + 23 * (CAST(year(d) AS BIGINT) - 1997)
                   + (CAST(dayofyear(d) AS BIGINT) - 1) // 16 AS period
        FROM (
            SELECT unnest(generate_series(o_orderdate - INTERVAL 60 DAY, o_orderdate,
                                          INTERVAL 1 DAY)) AS d
            FROM orders
        )
    """,
    note="distinct period-set union across windows (ref glad.py:249-253); Spark "
    "generates the contiguous period range directly instead of per-day expansion",
)
def a5_distinct_series(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.functions.temporal import date_to_period

    o = T(spark, sf, "orders")
    lo = date_to_period(F.col("o_orderdate") - F.expr("INTERVAL 60 DAYS"))
    hi = date_to_period(F.col("o_orderdate"))
    return (
        o.select(F.explode(F.sequence(lo, hi)).alias("period"))
        .distinct()
    )


@probe(
    "a6_masked_mean_by_key",
    sql="""
        SELECT l_partkey,
               round(avg(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 4) AS qty_avg
        FROM lineitem GROUP BY l_partkey
    """,
    note="flagship QA-masked temporal mean, long model (ref glad.py:259-265)",
)
def a6_masked_mean_by_key(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.round(
                F.avg(F.when(F.col("l_returnflag") == "A", F.col("l_quantity"))), 4
            ).alias("qty_avg")
        )
    )


@probe(
    "a7_median",
    sql="""
        SELECT l_returnflag, round(median(l_quantity), 4) AS qty_median
        FROM lineitem GROUP BY l_returnflag
    """,
    note="QA-masked temporal median (ref glad.py:268-282); exact percentile",
)
def a7_median(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("qty_median"))
    )


@probe(
    "a8_count_sum_rollup",
    sql="""
        SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS bal
        FROM supplier GROUP BY s_nationkey
    """,
    note="count+sum rollup per dir (ref utils.py:48-53)",
)
def a8_count_sum_rollup(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n"), F.round(F.sum("s_acctbal"), 2).alias("bal"))
    )


@probe(
    "a9_coarsen",
    sql="""
        SELECT CAST(floor(p_size / 5) AS BIGINT) AS bucket,
               round(avg(p_retailprice), 4) AS price_avg
        FROM part GROUP BY bucket
    """,
    note="downsample/coarsen agg (ref utils.py:100-109)",
)
def a9_coarsen(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "part")
        .groupBy(F.floor(F.col("p_size") / 5).cast("bigint").alias("bucket"))
        .agg(F.round(F.avg("p_retailprice"), 4).alias("price_avg"))
    )


@probe(
    "a10_global_avg",
    sql="SELECT round(avg(l_extendedprice), 4) AS price_avg FROM lineitem",
    note="global mean of huge array (ref examples.py:25-30)",
)
def a10_global_avg(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").agg(
        F.round(F.avg("l_extendedprice"), 4).alias("price_avg")
    )


@probe(
    "a12_batch_sizing",
    sql="""
        SELECT o_orderpriority,
               CAST(ceil(count(*) / 100.0) AS BIGINT) AS n_batches
        FROM orders GROUP BY o_orderpriority
    """,
    note="group-wise batch-size computation (ref scenes.py:60-70)",
)
def a12_batch_sizing(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(F.ceil(F.count("*") / 100.0).cast("bigint").alias("n_batches"))
    )


# --------------------------------------------------------------------------
# §2.5 windows / sorts
# --------------------------------------------------------------------------


@probe(
    "w1_sort",
    sql="SELECT n_name, n_regionkey FROM nation ORDER BY n_name",
    note="sort before grouping (ref mosaics.py:208-211)",
)
def w1_sort(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "nation").select("n_name", "n_regionkey").orderBy("n_name")


@probe(
    "w2_cumsum",
    sql="""
        SELECT o_orderkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                   ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
                   AS running
        FROM orders
    """,
    note="cumulative sum → chunk boundaries (ref mosaics.py:287-289). "
    "Spark side is the plans/prefix.py two-pass bucket decomposition "
    "(no single-partition window); prices are summed as exact integer "
    "cents so the result is association-free and bit-identical to the "
    "oracle's global window at any partitioning.",
)
def w2_cumsum(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.plans.prefix import distributed_cumsum

    cents = (
        T(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_cents"),
        )
    )
    run = distributed_cumsum(cents, "o_orderkey", "_cents", out_col="_run")
    return run.select(
        "o_orderkey", (F.col("_run") / F.lit(100.0)).alias("running")
    )


@probe(
    "w4_first_singleton",
    sql="SELECT min(r_name) AS first_name FROM region WHERE r_regionkey = 0",
    note="first element of singleton group, deterministic via min (ref build.py:59)",
)
def w4_first_singleton(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "region")
        .filter(F.col("r_regionkey") == 0)
        .agg(F.min("r_name").alias("first_name"))
    )


@probe(
    "w5_rank",
    sql="""
        SELECT s_suppkey,
               rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk
        FROM supplier
    """,
    note="ranking (absent in reference; free from Spark, SURVEY §2.5)",
)
def w5_rank(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    return T(spark, sf, "supplier").select(
        "s_suppkey", F.rank().over(w).cast("bigint").alias("rnk")
    )


@probe(
    "w6_lag",
    sql="""
        SELECT o_orderkey,
               lag(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev_date
        FROM orders
    """,
    note="analytic lag (extension; deterministic tie-break on orderkey)",
)
def w6_lag(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return T(spark, sf, "orders").select(
        "o_orderkey", F.lag("o_orderdate").over(w).alias("prev_date")
    )


@probe(
    "w7_topk_per_group",
    sql="""
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    note="top-k per group (extension; the similarity-search ranking idiom)",
)
def w7_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        T(spark, sf, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@probe(
    "a16_multi_quantile",
    sql="""
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.25) AS q25,
               quantile_cont(l_extendedprice, 0.50) AS q50,
               quantile_cont(l_extendedprice, 0.75) AS q75,
               quantile_cont(l_extendedprice, 0.95) AS q95
        FROM lineitem GROUP BY l_returnflag
    """,
    note="exact multi-quantile per group — Spark percentile and DuckDB "
    "quantile_cont share the (n-1)p linear-interpolation definition, "
    "so values are bit-exact with no rounding at all",
)
def a16_multi_quantile(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    qs = F.percentile(
        "l_extendedprice",
        F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)),
    )
    return li.groupBy("l_returnflag").agg(
        qs[0].alias("q25"), qs[1].alias("q50"), qs[2].alias("q75"), qs[3].alias("q95")
    )


@probe(
    "a17_stats_agg",
    sql="""
        SELECT l_returnflag,
               floor(stddev_samp(l_quantity) * 1000000.0 + 0.5) / 1000000.0 AS sd_qty,
               floor(corr(l_quantity, l_extendedprice) * 1000000.0 + 0.5) / 1000000.0
                   AS corr_qty_price,
               floor(covar_samp(l_quantity, l_discount) * 1000000.0 + 0.5) / 1000000.0
                   AS cov_qty_disc
        FROM lineitem GROUP BY l_returnflag
    """,
    note="statistical aggregates (stddev/corr/covar) — both engines use "
    "numerically stable one-pass co-moments; measured drift ≤3e-17, "
    "rounded at 6 digits for hash stability",
)
def a17_stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    return T(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        portable_round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        portable_round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        portable_round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
            "cov_qty_disc"
        ),
    )


@probe(
    "a18_histogram",
    sql="""
        SELECT l_returnflag, CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS bin,
               count(*) AS n
        FROM lineitem GROUP BY 1, 2
    """,
    note="fixed-width histogram binning per group — integer-exact bin "
    "edges, partial-aggregated count",
)
def a18_histogram(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .groupBy(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") / 10000.0).alias("bin"),
        )
        .agg(F.count("*").alias("n"))
    )


@probe(
    "w8_rolling_1h",
    sql="""
        SELECT event_id,
               count(*) OVER w AS n_1h,
               floor(sum(value) OVER w * 10000.0 + 0.5) / 10000.0 AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    note="time-range rolling window (trailing 1h per user) — RANGE frame "
    "on integer epoch seconds so both engines bound the frame "
    "identically; the incremental add/remove accumulation is bit-exact "
    "vs DuckDB (verified), rounded anyway for hash stability",
)
def w8_rolling_1h(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    # events.ts is TIMESTAMP_NTZ; Spark 4 forbids a direct NTZ->BIGINT
    # cast, so hop through TIMESTAMP (session tz pinned to UTC in
    # session.py, so this is the same epoch DuckDB's epoch() computes).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return T(spark, sf, "events").select(
        "event_id",
        F.count("*").over(w).alias("n_1h"),
        portable_round(F.sum("value").over(w)).alias("sum_1h"),
    )


# --------------------------------------------------------------------------
# §2.6 set operations
# --------------------------------------------------------------------------


@probe(
    "u1_union_all",
    sql="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    note="union-all of per-group frames (ref glad.py:254-257)",
)
def u1_union_all(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s)


@probe(
    "u2_intersect",
    sql="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    note="set intersect (extension beyond reference's semi-join J5)",
)
def u2_intersect(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@probe(
    "u3_except",
    sql="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    note="set except (extension beyond reference's anti-join J4)",
)
def u3_except(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@probe(
    "u4_merge_upsert",
    sql="""
        WITH base AS (
            SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        ),
        upd AS (
            SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, o_orderdate,
                   FALSE AS is_del
            FROM base WHERE o_orderkey % 10 = 3
            UNION ALL
            SELECT o_orderkey + 100000000, o_totalprice, o_orderdate, FALSE
            FROM base WHERE o_orderkey % 100 = 7
            UNION ALL
            SELECT o_orderkey, o_totalprice, o_orderdate, TRUE
            FROM base WHERE o_orderkey % 100 = 55
        )
        SELECT coalesce(b.o_orderkey, u.o_orderkey) AS o_orderkey,
               CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice,
               CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderdate
                    ELSE b.o_orderdate END AS o_orderdate,
               CASE WHEN u.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                         THEN 'updated'
                    WHEN u.o_orderkey IS NOT NULL THEN 'inserted'
                    ELSE 'kept' END AS _action
        FROM base b FULL JOIN upd u ON b.o_orderkey = u.o_orderkey
        WHERE NOT coalesce(u.is_del, FALSE)
    """,
    note="MERGE INTO semantics (update + insert + tombstone delete) as "
    "one full-outer join — the Delta/Iceberg incremental-maintenance "
    "primitive; the changes side broadcasts when small so the base "
    "never shuffles",
)
def u4_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.merge import merge_upsert

    base = T(spark, sf, "orders").select("o_orderkey", "o_totalprice", "o_orderdate")
    k = F.col("o_orderkey")
    amend = (
        base.where(k % 10 == 3)
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("is_del", F.lit(False))
    )
    ins = (
        base.where(k % 100 == 7)
        .withColumn("o_orderkey", k + 100000000)
        .withColumn("is_del", F.lit(False))
    )
    dele = base.where(k % 100 == 55).withColumn("is_del", F.lit(True))
    upd = amend.unionByName(ins).unionByName(dele)
    return merge_upsert(base, upd, ["o_orderkey"], delete_col="is_del")


@probe(
    "a13_rollup",
    sql="""
        SELECT coalesce(l_returnflag, '(all)') AS flag,
               coalesce(l_linestatus, '(all)') AS status,
               count(*) AS n, round(sum(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    note="hierarchical rollup (absent in reference; free from Spark, "
    "SURVEY §2.4 closing note). Subtotal rows distinguished via coalesce "
    "sentinels so the row set is engine-portable.",
)
def a13_rollup(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("status"),
            "n",
            "qty",
        )
    )


@probe(
    "a14_cube",
    sql="""
        SELECT coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    note="cube over two dims (free from Spark; SURVEY §2.4 closing note)",
)
def a14_cube(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n",
        )
    )


@probe(
    "a15_pivot",
    sql="""
        SELECT l_returnflag AS flag,
               round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS F,
               round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS O
        FROM lineitem GROUP BY l_returnflag
    """,
    note="pivot to wide form (Spark groupBy().pivot(); oracle via portable "
    "conditional aggregation)",
)
def a15_pivot(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2))
    )


@probe(
    "f16_hof_norm",
    sql="""
        SELECT vec_id,
               round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                  x -> x * x))), 4) AS l2
        FROM embeddings
    """,
    note="higher-order array functions (transform/aggregate) — the JVM-side "
    "vector-math path used by the similarity operators, probed directly",
)
def f16_hof_norm(spark: SparkSession, sf: str) -> DataFrame:
    emb = T(spark, sf, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return emb.select("vec_id", F.round(F.sqrt(sq_sum), 4).alias("l2"))
