"""Round-2 operator surface: grouping sets, unpivot, conditional and
arg-max aggregation, distribution window functions, fuzzy matching,
regex/array/date scalar families, SCD2 history, and non-parquet
source round-trips.

Same contract as every probe module: the Spark body and the DuckDB
oracle alias every computed column identically, and float outputs are
rounded identically on both sides (see scalars.portable_round for the
.5-boundary rationale).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flytemosaic_spark.plans.prefix import bounded_window
from flytemosaic_spark.probes.registry import T, probe

# --------------------------------------------------------------------------
# §2.4 aggregation extensions
# --------------------------------------------------------------------------


@probe(
    "a19_grouping_sets",
    sql="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """,
    note="explicit GROUPING SETS — the general form a13 rollup / a14 "
    "cube specialize; one hash-agg pass expands grouping ids, no "
    "re-scan per set",
)
def a19_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM {o}
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """,
        o=T(spark, sf, "orders"),
    )


@probe(
    "a20_unpivot",
    sql="""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
               l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem
    """,
    note="unpivot/melt wide→long (Spark native unpivot; oracle is the "
    "UNION ALL expansion it desugars to)",
)
def a20_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )


@probe(
    "a21_conditional_agg",
    sql="""
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
               bool_or(o_orderstatus = 'O') AS any_open,
               bool_and(o_totalprice > 0) AS all_pos,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'),
                     2) AS total_f
        FROM orders GROUP BY o_orderpriority
    """,
    note="conditional aggregates: count_if / bool_or / bool_and / "
    "filtered sum — all partial-aggregatable, map-side combined",
)
def a21_conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
            F.bool_or(F.col("o_orderstatus") == "O").alias("any_open"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
            F.round(
                F.sum(
                    F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
                ),
                2,
            ).alias("total_f"),
        )
    )


@probe(
    "a22_arg_max",
    sql="""
        SELECT c_mktsegment, c_custkey AS top_cust,
               round(c_acctbal, 2) AS top_bal
        FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
            FROM customer
        ) WHERE rn = 1
    """,
    note="arg-max per group via max_by with a struct tie-break — a "
    "single hash-agg (no sort, no window) where the oracle needs a "
    "per-group window; ties broken by key so re-runs are identical",
)
def a22_arg_max(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.expr(
                "max_by(c_custkey, struct(c_acctbal, c_custkey))"
            ).alias("top_cust"),
            F.round(F.max("c_acctbal"), 2).alias("top_bal"),
        )
    )


# --------------------------------------------------------------------------
# §2.5 window extensions
# --------------------------------------------------------------------------


@probe(
    "w9_distribution_rank",
    sql="""
        SELECT o_orderkey,
               ntile(4) OVER w AS quartile,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey)
    """,
    note="distribution window functions (ntile/percent_rank/cume_dist); "
    "total order via the unique-key tie-break makes ntile deterministic",
)
def w9_distribution_rank(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return T(spark, sf, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


# --------------------------------------------------------------------------
# §2.7 scalar-function extensions
# --------------------------------------------------------------------------


@probe(
    "f17_fuzzy_pairs",
    sql="""
        SELECT a.p_brand AS block, a.p_partkey AS a_key,
               b.p_partkey AS b_key,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
          AND levenshtein(a.p_name, b.p_name) <= 2
    """,
    note="blocked fuzzy join (operators/fuzzy.py): block on brand, "
    "length-gap prune, bounded levenshtein refine — the record-linkage "
    "plan whose pair count is sum(block²), not n²",
)
def f17_fuzzy_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.fuzzy import blocked_fuzzy_pairs

    return blocked_fuzzy_pairs(
        T(spark, sf, "part"),
        key_col="p_partkey",
        text_col="p_name",
        block_col="p_brand",
        max_dist=2,
    )


@probe(
    "f18_regexp_extract_all",
    sql=r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '\b(s[a-z]+)\b', 1)) AS n_s,
               list_extract(regexp_extract_all(text, '\b(s[a-z]+)\b', 1),
                            1) AS first_s
        FROM documents
    """,
    note="regexp_extract_all over documents; scalar projections "
    "(count + first match) keep the row hashable for the comparator",
)
def f18_regexp_extract_all(spark: SparkSession, sf: str) -> DataFrame:
    hits = F.regexp_extract_all("text", F.lit(r"\b(s[a-z]+)\b"), 1)
    return T(spark, sf, "documents").select(
        "doc_id",
        F.size(hits).alias("n_s"),
        F.try_element_at(hits, F.lit(1)).alias("first_s"),
    )


@probe(
    "f19_array_setops",
    sql="""
        SELECT o_orderkey,
               len(list_intersect(generate_series(1, 1 + o_orderkey % 7),
                                  generate_series(1 + o_orderkey % 3, 8)))
                   AS n_both,
               len(list_distinct(list_concat(
                       generate_series(1, 1 + o_orderkey % 7),
                       generate_series(1 + o_orderkey % 3, 8)))) AS n_union,
               len(list_filter(generate_series(1, 1 + o_orderkey % 7),
                               x -> NOT list_contains(
                                   generate_series(1 + o_orderkey % 3, 8),
                                   x))) AS n_only_a
        FROM orders
    """,
    note="array set algebra (intersect/union/except) — cardinality "
    "projections because element order differs across engines",
)
def f19_array_setops(spark: SparkSession, sf: str) -> DataFrame:
    a = F.sequence(F.lit(1), 1 + F.col("o_orderkey") % 7)
    b = F.sequence(1 + F.col("o_orderkey") % 3, F.lit(8))
    return T(spark, sf, "orders").select(
        "o_orderkey",
        F.size(F.array_intersect(a, b)).alias("n_both"),
        F.size(F.array_union(a, b)).alias("n_union"),
        F.size(F.array_except(a, b)).alias("n_only_a"),
    )


@probe(
    "f21_date_arith",
    sql="""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                   AS plus3m,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               datediff('day', CAST(o_orderdate AS DATE),
                        DATE '2002-01-01') AS days_left
        FROM orders
    """,
    note="calendar arithmetic: add_months (end-of-month clamped the "
    "same way in both engines), last_day, day diff",
)
def f21_date_arith(spark: SparkSession, sf: str) -> DataFrame:
    d = F.to_date("o_orderdate")
    return T(spark, sf, "orders").select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus3m"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_left"),
    )


# --------------------------------------------------------------------------
# history / sources
# --------------------------------------------------------------------------


@probe(
    "x30_scd2",
    sql="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev
            FROM events
        ), changes AS (
            SELECT user_id, event_type, ts, event_id FROM ordered
            WHERE prev IS NULL OR prev <> event_type
        )
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS valid_to,
               lead(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) IS NULL AS is_current
        FROM changes
    """,
    note="SCD2 history from a change log (operators/scd.py): collapse "
    "consecutive repeats, close intervals with lead() — one exchange, "
    "both windows share the sort",
)
def x30_scd2(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.scd import scd2_from_changes

    return scd2_from_changes(
        T(spark, sf, "events"),
        key_col="user_id",
        ts_col="ts",
        attr_col="event_type",
        tie_col="event_id",
    )


def _roundtrip_dir(sf: str, fmt: str) -> str:
    tag = re.sub(r"\W+", "_", sf.strip("/"))
    return f"/tmp/flytemosaic_roundtrip_{fmt}_{tag}"


_NATION_DDL = "n_nationkey bigint, n_name string, n_regionkey bigint"


@probe(
    "s12_csv_roundtrip",
    sql="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    note="CSV sink+source round-trip: write the nation table as CSV, "
    "read it back with an explicit schema — non-parquet source "
    "coverage proven through the same oracle gate",
)
def s12_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    path = _roundtrip_dir(sf, "csv")
    T(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(_NATION_DDL).option("header", True).csv(path)


@probe(
    "s13_json_roundtrip",
    sql="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    note="JSON-lines sink+source round-trip with explicit schema",
)
def s13_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    path = _roundtrip_dir(sf, "json")
    T(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("overwrite").json(path)
    return spark.read.schema(_NATION_DDL).json(path)


@probe(
    "a24_string_agg",
    sql="""
        SELECT c_nationkey,
               string_agg(c_name, ',' ORDER BY c_name) AS names
        FROM customer WHERE c_custkey % 100 = 0
        GROUP BY c_nationkey
    """,
    note="ordered string aggregation (listagg): collect_list + "
    "array_sort + array_join — sort happens per group AFTER the "
    "hash-agg, so the shuffle carries lists, not a global sort",
)
def a24_string_agg(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "customer")
        .where(F.col("c_custkey") % 100 == 0)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
                "names"
            )
        )
    )


@probe(
    "j8_lateral_topn",
    sql="""
        SELECT n_name, c.c_name, round(c.c_acctbal, 2) AS bal
        FROM nation, LATERAL (
            SELECT c_name, c_acctbal FROM customer
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) c
    """,
    note="correlated LATERAL top-n per dimension row; the Spark plan "
    "decorrelates to one window over the fact side + broadcast dim "
    "join — no per-row re-execution, unlike a naive nested loop",
)
def j8_lateral_topn(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    top = (
        T(spark, sf, "customer")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 2)
    )
    return (
        T(spark, sf, "nation")
        .join(top, F.col("n_nationkey") == F.col("c_nationkey"))
        .select("n_name", "c_name", F.round("c_acctbal", 2).alias("bal"))
    )


@probe(
    "s14_partitioned_write",
    sql="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderstatus = 'F'
    """,
    note="hive-partitioned parquet sink + partition-pruned scan: write "
    "orders partitioned by status, read back filtered — the filter "
    "must become a PartitionFilter (zero data files of other "
    "partitions opened), the layout primitive for 100 TB tables",
)
def s14_partitioned_write(spark: SparkSession, sf: str) -> DataFrame:
    path = _roundtrip_dir(sf, "part_orders")
    T(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    ).write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    return (
        spark.read.parquet(path)
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )


@probe(
    "w10_gap_fill",
    sql="""
        SELECT event_id, user_id,
               last_value(CASE WHEN event_type = 'view' THEN NULL
                               ELSE value END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled
        FROM events
    """,
    note="forward-fill / LOCF gap filling per key (the timeseries "
    "staple): last(... ignorenulls) over a running frame — one "
    "exchange on the key, streaming frame evaluation, no self-join",
)
def w10_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    sparse = F.when(F.col("event_type") != "view", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return T(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.last(sparse, ignorenulls=True).over(w).alias("filled"),
    )


@probe(
    "w2b_distributed_cumsum",
    sql="""
        SELECT o_orderkey,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   OVER (ORDER BY o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cents
        FROM orders
    """,
    note="scale-path twin of w2: two-pass range-bucketed prefix sum "
    "(plans/prefix.py) — per-bucket parallel running sums + a "
    "metadata-scale offset cumsum, no single-partition global sort; "
    "bit-identical to the oracle's global window on integer values",
)
def w2b_distributed_cumsum(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.plans.prefix import distributed_cumsum

    orders = T(spark, sf, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("_cents"),
    )
    return distributed_cumsum(
        orders, "o_orderkey", "_cents", out_col="cum_cents"
    ).select("o_orderkey", "cum_cents")


@probe(
    "x31_udtf_tokens",
    sql="""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
        )
        SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, ws[i] AS token
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(ws))) AS i
        ) g
    """,
    note="Python UDTF surface (SURVEY §2.9): an Arrow-optimized "
    "table function exploding documents into (pos, token) rows via "
    "SQL LATERAL — the API for custom row-generating logic Spark's "
    "built-in generators can't express (here equivalent to posexplode, "
    "which IS how a production tokenizer should run; the probe pins "
    "the UDTF machinery itself against that oracle)",
)
def x31_udtf_tokens(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, token: string", useArrow=True)
    class TokenizeUDTF:
        def eval(self, text: str):
            for i, w in enumerate(text.strip().split(" ")):
                yield i, w

    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    T(spark, sf, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM _udtf_docs d, LATERAL tokenize_udtf(d.text) t
        """
    )


@probe(
    "x32_model_score",
    sql="""
        SELECT doc_id,
               floor(
                   (1.0 / (1.0 + exp(-(
                       -1.0
                       + 2.0 * least(len(string_split_regex(trim(text),
                                                            '\\s+'))
                               / 100.0, 1.0)
                       + 1.5 * ((length(text)
                                 - length(replace(replace(replace(text, '.',
                                           ''), ',', ''), '!', '')))
                                / greatest(length(text), 1))
                   )))) * 10000.0 + 0.5
               ) / 10000.0 AS score
        FROM documents
    """,
    note="literal-weight model scoring (the fasttext-style quality-"
    "classifier shape): features as column expressions, sigmoid of "
    "the dot product — whole-stage-codegen'd scoring at scan "
    "speed, the pattern for applying any exported linear model "
    "without a UDF",
)
def x32_model_score(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round, token_count

    text = F.col("text")
    f_len = F.least(token_count(text).cast("double") / 100.0, F.lit(1.0))
    n_punct = (
        F.length(text)
        - F.length(
            F.replace(
                F.replace(F.replace(text, F.lit("."), F.lit("")), F.lit(","),
                          F.lit("")),
                F.lit("!"),
                F.lit(""),
            )
        )
    ).cast("double")
    f_punct = n_punct / F.greatest(F.length(text), F.lit(1)).cast("double")
    logit = F.lit(-1.0) + 2.0 * f_len + 1.5 * f_punct
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return T(spark, sf, "documents").select(
        "doc_id", portable_round(score).alias("score")
    )


@probe(
    "x33_domain_mix",
    sql="""
        WITH ranked AS (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4),
                                doc_id) AS rn
            FROM documents
        )
        SELECT doc_id, lang FROM ranked
        WHERE (lang = 'en' AND rn <= 100)
           OR (lang = 'es' AND rn <= 60)
           OR (lang = 'zh' AND rn <= 40)
    """,
    note="curriculum domain mixing with exact per-domain counts "
    "(operators/sampling.py:domain_mix): deterministic md5-order rank "
    "per stratum, keep floor(weight*total) — reproducible under "
    "retry, one exchange, no global sort",
)
def x33_domain_mix(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sampling import domain_mix

    return domain_mix(
        T(spark, sf, "documents").select("doc_id", "lang"),
        weights={"en": 0.5, "es": 0.3, "zh": 0.2},
        strata_col="lang",
        key_col="doc_id",
        total=200,
    )


@probe(
    "j9_null_safe_join",
    sql="""
        SELECT coalesce(a.k, '<null>') AS key, count(*) AS n_pairs
        FROM (SELECT nullif(lang, 'zh') AS k FROM documents) a
        JOIN (SELECT nullif(lang, 'zh') AS k FROM documents) b
          ON a.k IS NOT DISTINCT FROM b.k
        GROUP BY coalesce(a.k, '<null>')
    """,
    note="null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other — still a hash join (the null-safe comparator "
    "is a join key transform, not a theta join)",
)
def j9_null_safe_join(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents").select(
        F.nullif("lang", F.lit("zh")).alias("k")
    )
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(b, F.col("a.k").eqNullSafe(F.col("b.k")))
        .groupBy(F.coalesce(F.col("a.k"), F.lit("<null>")).alias("key"))
        .agg(F.count("*").alias("n_pairs"))
    )


@probe(
    "x34_incremental_rollup",
    sql="""
        SELECT o_custkey, count(*) AS n,
               round(sum(o_totalprice), 2) AS total_r,
               round(min(o_totalprice), 2) AS mn_r,
               round(max(o_totalprice), 2) AS mx_r
        FROM orders GROUP BY o_custkey
    """,
    note="incremental rollup maintenance (operators/incremental.py:"
    "merge_rollup): the aggregate of pre-1997 history is MERGED with "
    "the aggregate of the 1997+ delta — algebraic partial-state "
    "combine, never rescanning history; the oracle is the full "
    "recompute the merge must equal",
)
def x34_incremental_rollup(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.incremental import (
        merge_rollup,
        rollup_state,
    )

    orders = T(spark, sf, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    hist = rollup_state(
        orders.where(F.col("o_orderdate") < cutoff), ["o_custkey"], "o_totalprice"
    )
    delta = rollup_state(
        orders.where(F.col("o_orderdate") >= cutoff), ["o_custkey"], "o_totalprice"
    )
    merged = merge_rollup(hist, delta, ["o_custkey"])
    return merged.select(
        "o_custkey",
        "n",
        F.round("total", 2).alias("total_r"),
        F.round("mn", 2).alias("mn_r"),
        F.round("mx", 2).alias("mx_r"),
    )


@probe(
    "a25_multi_distinct",
    sql="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS nd_part,
               count(DISTINCT l_suppkey) AS nd_supp,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    note="multiple DISTINCT aggregates in one pass — Catalyst expands "
    "rows per distinct set (Expand) then two-phase aggregates; one "
    "scan, not one scan per distinct column",
)
def a25_multi_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd_part"),
            F.countDistinct("l_suppkey").alias("nd_supp"),
            F.count("*").alias("n"),
        )
    )


@probe(
    "x35_sliding_window",
    sql="""
        WITH buckets AS (
            SELECT ts, value,
                   time_bucket(INTERVAL '5 minutes', ts)
                       - INTERVAL (g.i * 5) MINUTE AS w_start
            FROM events, LATERAL (
                SELECT unnest(generate_series(0, 1)) AS i
            ) g
            WHERE ts < time_bucket(INTERVAL '5 minutes', ts)
                       - INTERVAL (g.i * 5) MINUTE + INTERVAL 10 MINUTE
        )
        SELECT w_start AS bucket, count(*) AS n,
               round(sum(value), 2) AS total
        FROM buckets GROUP BY w_start
    """,
    note="sliding (hopping) event windows — 10-minute window, 5-minute "
    "hop: each event lands in window/hop buckets (Spark expands, then "
    "a plain hash-agg; identical plan shape streams with a watermark)",
)
def x35_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("bucket"), "n", "total")
    )


@probe(
    "x36_snapshot_diff",
    sql="""
        WITH old AS (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_orderkey % 97 <> 0
        ),
        new AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 31 = 0
                        THEN o_totalprice + 1.0 ELSE o_totalprice END
                       AS o_totalprice
            FROM orders WHERE o_orderkey % 89 <> 0
        )
        SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
               CASE WHEN old.o_orderkey IS NULL THEN 'added'
                    WHEN new.o_orderkey IS NULL THEN 'removed'
                    WHEN old.o_totalprice <> new.o_totalprice THEN 'changed'
               END AS change
        FROM old FULL OUTER JOIN new USING (o_orderkey)
        WHERE CASE WHEN old.o_orderkey IS NULL THEN 'added'
                   WHEN new.o_orderkey IS NULL THEN 'removed'
                   WHEN old.o_totalprice <> new.o_totalprice THEN 'changed'
              END IS NOT NULL
    """,
    note="snapshot diff / reconciliation (operators/diff.py): one "
    "full-outer join on the key with scan-side row digests — the join "
    "carries (key, hash), never payloads; deterministic synthetic old/"
    "new derived from orders so the oracle replays the same diff",
)
def x36_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.diff import snapshot_diff

    orders = T(spark, sf, "orders")
    old = orders.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    new = orders.where(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 31 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    return snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice"])


_BOX_A_SQL = """
    SELECT p_partkey AS a_id,
           CAST(p_partkey * 37 % 1000 AS DOUBLE) AS minx,
           CAST(p_partkey * 61 % 1000 AS DOUBLE) AS miny,
           CAST(p_partkey * 37 % 1000 + 1 + p_partkey % 20 AS DOUBLE) AS maxx,
           CAST(p_partkey * 61 % 1000 + 1 + p_partkey % 15 AS DOUBLE) AS maxy
    FROM part
"""
_BOX_B_SQL = """
    SELECT s_suppkey AS b_id,
           CAST(s_suppkey * 53 % 1000 AS DOUBLE) AS minx,
           CAST(s_suppkey * 29 % 1000 AS DOUBLE) AS miny,
           CAST(s_suppkey * 53 % 1000 + 1 + s_suppkey % 40 AS DOUBLE) AS maxx,
           CAST(s_suppkey * 29 % 1000 + 1 + s_suppkey % 35 AS DOUBLE) AS maxy
    FROM supplier
"""


@probe(
    "j10_grid_spatial_join",
    sql=f"""
        WITH a AS ({_BOX_A_SQL}), b AS ({_BOX_B_SQL})
        SELECT a_id, b_id FROM a JOIN b
          ON a.minx <= b.maxx AND b.minx <= a.maxx
         AND a.miny <= b.maxy AND b.miny <= a.maxy
    """,
    note="grid-binned bbox join (operators/spatial.py): boxes explode "
    "to covered grid cells, candidates meet via an EQUI-join on the "
    "cell, exact overlap refines, owner-cell filter dedupes without a "
    "distinct — the scalable form of J1's spatial intersects (oracle "
    "is the naive theta join it must equal); deterministic synthetic "
    "boxes derived from part/supplier keys",
)
def j10_grid_spatial_join(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.spatial import grid_bbox_join

    def boxes(df: DataFrame, key: str, mx: int, my: int, wx: int, wy: int, out: str):
        k = F.col(key)
        minx = (k * mx % 1000).cast("double")
        miny = (k * my % 1000).cast("double")
        return df.select(
            k.alias(out),
            minx.alias("minx"),
            miny.alias("miny"),
            (minx + 1 + k % wx).cast("double").alias("maxx"),
            (miny + 1 + k % wy).cast("double").alias("maxy"),
        )

    a = boxes(T(spark, sf, "part"), "p_partkey", 37, 61, 20, 15, "a_id")
    b = boxes(T(spark, sf, "supplier"), "s_suppkey", 53, 29, 40, 35, "b_id")
    return grid_bbox_join(a, b, cell=64.0)


@probe(
    "x37_quantile_sketch",
    sql="""
        WITH b AS (
            SELECT l_returnflag,
                   min(CAST(l_extendedprice AS DOUBLE)) AS mn,
                   max(CAST(l_extendedprice AS DOUBLE)) AS mx
            FROM lineitem GROUP BY l_returnflag
        ),
        binned AS (
            SELECT l.l_returnflag,
                   least(greatest(CAST(floor(
                       (CAST(l_extendedprice AS DOUBLE) - mn)
                       / (CASE WHEN mx > mn THEN mx - mn ELSE 1.0 END)
                       * 128) AS INT), 0), 127) AS bin
            FROM lineitem l JOIN b USING (l_returnflag)
        ),
        hist AS (
            SELECT l_returnflag, bin, count(*) AS c
            FROM binned GROUP BY 1, 2
        ),
        cum AS (
            SELECT l_returnflag, bin,
                   sum(c) OVER (PARTITION BY l_returnflag
                                ORDER BY bin) AS cum,
                   sum(c) OVER (PARTITION BY l_returnflag) AS n
            FROM hist
        ),
        sel AS (
            SELECT l_returnflag, CAST(min(bin) AS BIGINT) AS bin0,
                   min(n) AS n
            FROM cum WHERE CAST(cum AS DOUBLE) > 0.5 * (n - 1)
            GROUP BY l_returnflag
        )
        SELECT s.l_returnflag, CAST(s.n AS BIGINT) AS n,
               least(greatest(
                   b.mn + (CAST(s.bin0 AS DOUBLE) + 1.0 - 0.5)
                       * ((CASE WHEN b.mx > b.mn THEN b.mx - b.mn
                           ELSE 1.0 END) / 128.0),
                   b.mn), b.mx) AS q_est
        FROM sel s JOIN b USING (l_returnflag)
    """,
    note="portable mergeable quantile sketch (operators/qsketch.py): "
    "fixed-bin histogram state (vector-add merge, any engine can "
    "finalize) — the oracle REPLAYS the whole estimator in SQL "
    "(binning, cumulative walk, midpoint interpolation) and the "
    "result hash-matches bit-for-bit; error-vs-exact bound and "
    "merge==direct are property-tested in tests/test_qsketch.py",
)
def x37_quantile_sketch(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.qsketch import (
        quantile_sketch_estimate,
        quantile_sketch_state,
    )

    li = T(spark, sf, "lineitem")
    st = quantile_sketch_state(li, "l_extendedprice", ["l_returnflag"])
    return quantile_sketch_estimate(st, ["l_returnflag"], 0.5)


@probe(
    "f22_string_ops",
    sql="""
        SELECT c_custkey, upper(c_name) AS u, lower(c_mktsegment) AS l,
               reverse(c_name) AS r,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
               translate(c_name, '#0', '_x') AS tr,
               ascii(c_name) AS first_code
        FROM customer
    """,
    note="string-function surface batch: upper/lower/reverse/lpad/"
    "translate/ascii — all JVM expressions inside one codegen stage",
)
def f22_string_ops(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("u"),
        F.lower("c_mktsegment").alias("l"),
        F.reverse("c_name").alias("r"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.translate("c_name", "#0", "_x").alias("tr"),
        F.ascii("c_name").alias("first_code"),
    )


@probe(
    "f23_from_json_typed",
    sql="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(json_extract_string(props, '$.k') AS BIGINT) * 2
                   AS k_doubled
        FROM events
    """,
    note="typed JSON parsing: from_json with a declared schema (vs "
    "f15's string extraction) — the parsed struct is a real column, "
    "downstream arithmetic stays JVM-typed",
)
def f23_from_json_typed(spark: SparkSession, sf: str) -> DataFrame:
    parsed = F.from_json("props", "k bigint")
    return T(spark, sf, "events").select(
        "event_id",
        parsed["k"].alias("k"),
        (parsed["k"] * 2).alias("k_doubled"),
    )


@probe(
    "f24_date_series",
    sql="""
        SELECT o_orderkey,
               CAST(unnest(generate_series(CAST(o_orderdate AS DATE),
                    CAST(o_orderdate AS DATE) + INTERVAL 3 DAY,
                    INTERVAL 1 DAY)) AS DATE) AS d
        FROM orders WHERE o_orderkey % 50 = 0
    """,
    note="date-typed interval expansion: explode(sequence(date, "
    "date+3d, 1d)) — the date-grid twin of j7's integer periods "
    "(reference temporal grid, glad.py:163-186)",
)
def f24_date_series(spark: SparkSession, sf: str) -> DataFrame:
    d0 = F.to_date("o_orderdate")
    return (
        T(spark, sf, "orders")
        .where(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            F.explode(
                F.sequence(d0, F.date_add(d0, 3), F.expr("interval 1 day"))
            ).alias("d"),
        )
    )


@probe(
    "f25_try_ops",
    sql="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice / nullif(l_discount, 0.0) AS ratio,
               try_cast(l_returnflag AS BIGINT) AS flag_num
        FROM lineitem
    """,
    note="ANSI-mode safety surface: try_divide / try_cast return NULL "
    "where strict ANSI evaluation would fail the job — the error-"
    "quarantine idiom for dirty data at scale (Spark 4 runs ANSI ON)",
)
def f25_try_ops(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", "l_discount").alias("ratio"),
        F.try_to_number("l_returnflag", F.lit("999")).cast("bigint").alias(
            "flag_num"
        ),
    )


@probe(
    "x38_substring_dedup",
    sql="""
        WITH w AS (
            SELECT doc_id, md5(substr(text, p, 40)) AS h
            FROM documents, LATERAL (
                SELECT unnest(generate_series(
                    1, greatest(length(text) - 39, 1), 20)) AS p
            ) g
        ), dd AS (SELECT DISTINCT doc_id, h FROM w)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        FROM dd a JOIN dd b USING (h)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    """,
    note="substring-level dedup (operators/dedup.py:"
    "shared_substring_pairs): hashed character windows as an inverted "
    "index — catches copied PASSAGES that document-level shingle "
    "similarity misses; md5 windows replay exactly in the oracle",
)
def x38_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.dedup import shared_substring_pairs

    return shared_substring_pairs(T(spark, sf, "documents"))


@probe(
    "x39_boilerplate_scrub",
    sql=r"""
        WITH toks AS (
            SELECT doc_id,
                   string_split_regex(trim(text), '\s+') AS w,
                   text
            FROM documents
        ),
        grams AS (
            SELECT concat_ws(' ', w[i], w[i+1], w[i+2]) AS g
            FROM toks, LATERAL (
                SELECT unnest(generate_series(1, greatest(len(w) - 2, 1)))
                    AS i
            ) x
        ),
        top1 AS (
            SELECT g FROM grams GROUP BY g ORDER BY count(*) DESC, g LIMIT 1
        )
        SELECT d.doc_id, t.g AS phrase,
               CAST((length(d.text) - length(replace(d.text, t.g, '')))
                    / length(t.g) AS BIGINT) AS n_hits,
               length(replace(d.text, t.g, '')) AS scrubbed_len
        FROM documents d CROSS JOIN top1 t
    """,
    note="corpus-level boilerplate removal: heavy-hitter phrase mining "
    "(x26's TakeOrderedAndProject) feeds a broadcast scalar into a "
    "per-row scrub — the two-phase corpus-stat -> row-transform "
    "composition every curation pipeline runs; one corpus pass per "
    "phase, no per-row Python",
)
def x39_boilerplate_scrub(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import tokens

    docs = T(spark, sf, "documents")
    w = tokens(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - 2, F.lit(1))),
        lambda i: F.array_join(F.slice(w, i, 3), " "),
    )
    top1 = (
        docs.select(F.explode(grams).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("g"))
        .limit(1)
        .select("g")
    )
    stripped = F.replace(F.col("text"), F.col("g"))
    return (
        docs.crossJoin(F.broadcast(top1))
        .select(
            "doc_id",
            F.col("g").alias("phrase"),
            (
                (F.length("text") - F.length(stripped)) / F.length("g")
            ).cast("bigint").alias("n_hits"),
            F.length(stripped).alias("scrubbed_len"),
        )
    )


@probe(
    "w11_value_window",
    sql="""
        SELECT o_orderkey,
               first_value(o_orderkey) OVER w AS first_k,
               last_value(o_orderkey) OVER w AS last_k,
               nth_value(o_orderkey, 2) OVER w AS second_k
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    note="value window functions (first/last/nth over an explicit "
    "running frame) — deterministic via the unique-key tie-break",
)
def w11_value_window(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return T(spark, sf, "orders").select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_k"),
        F.last("o_orderkey").over(w).alias("last_k"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_k"),
    )


@probe(
    "x40_funnel",
    sql="""
        WITH v AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts >= v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS t_buy
            FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM v) AS n_view,
               (SELECT count(*) FROM c) AS n_click_after_view,
               (SELECT count(*) FROM p) AS n_buy_after_click
    """,
    note="ordered funnel (view -> click -> purchase): each stage is an "
    "aggregate of the previous stage's users with a time bound — "
    "three passes, each a groupBy + semi-shaped join, no window over "
    "the whole event stream",
)
def x40_funnel(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")

    def stage(etype: str, prev: DataFrame | None, prev_ts: str) -> DataFrame:
        src = ev.where(F.col("event_type") == etype)
        if prev is not None:
            src = src.join(prev, "user_id").where(F.col("ts") >= F.col(prev_ts))
        return src.groupBy("user_id").agg(F.min("ts").alias(f"t_{etype}"))

    v = stage("view", None, "")
    c = stage("click", v, "t_view")
    p = stage("purchase", c, "t_click")
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_buy_after_click")))
    )


@probe(
    "x41_retention_cohorts",
    sql="""
        WITH first_seen AS (
            SELECT user_id,
                   date_trunc('week', CAST(min(ts) AS DATE)) AS cohort
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT e.user_id, f.cohort,
                   date_trunc('week', CAST(e.ts AS DATE)) AS week
            FROM events e JOIN first_seen f USING (user_id)
        )
        SELECT CAST(cohort AS DATE) AS cohort, CAST(week AS DATE) AS week,
               count(*) AS n_active
        FROM activity GROUP BY 1, 2
    """,
    note="retention cohort matrix: cohort = first-seen week per user "
    "(one agg), activity = distinct (user, week) joined back to the "
    "cohort — counts per (cohort, week); the cohort table is "
    "user-cardinality, broadcast when small, co-partitioned when not",
)
def x41_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.to_date(F.min("ts"))).cast("date").alias("cohort")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort",
            F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"),
        )
        .distinct()
    )
    return activity.groupBy("cohort", "week").agg(F.count("*").alias("n_active"))


@probe(
    "w12_linear_interpolate",
    sql="""
        WITH s AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'error' THEN NULL
                        ELSE value END AS v
            FROM events
        ),
        w AS (
            SELECT *,
                last_value(v IGNORE NULLS) OVER wp AS pv,
                last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
                    OVER wp AS pt,
                first_value(v IGNORE NULLS) OVER wf AS nv,
                first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
                    OVER wf AS nt
            FROM s
            WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   wf AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        )
        SELECT event_id,
               floor((CASE
                   WHEN v IS NOT NULL THEN v
                   WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                       pv + (nv - pv)
                       * (CAST(epoch_ms(ts) - epoch_ms(pt) AS DOUBLE)
                          / CAST(epoch_ms(nt) - epoch_ms(pt) AS DOUBLE))
               END) * 10000.0 + 0.5) / 10000.0 AS filled
        FROM w
    """,
    note="linear interpolation of gaps per key (the telemetry repair "
    "beyond w10's LOCF): previous/next known value+time via "
    "ignore-nulls frames — two windows sharing one sort, no self-"
    "join; edges (no neighbor) stay NULL",
)
def w12_linear_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    v = F.when(F.col("event_type") != "error", F.col("value"))
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    base = T(spark, sf, "events").select(
        "event_id", "user_id", "ts", v.alias("v"), ms.alias("ms")
    )
    order = [F.col("ts"), F.col("event_id")]
    wp = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    known_ms = F.when(F.col("v").isNotNull(), F.col("ms"))
    w = base.select(
        "event_id",
        "v",
        "ms",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(known_ms, ignorenulls=True).over(wp).alias("pt"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(known_ms, ignorenulls=True).over(wf).alias("nt"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("ms") - F.col("pt")).cast("double")
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    filled = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
    )
    return w.select("event_id", portable_round(filled).alias("filled"))


@probe(
    "x42_data_quality",
    sql="""
        SELECT 'not_null(o_custkey)' AS check,
               count(*) FILTER (WHERE o_custkey IS NULL) AS violations
        FROM orders
        UNION ALL
        SELECT 'accepted_values(o_orderstatus)',
               count(*) FILTER (WHERE o_orderstatus IS NULL
                   OR o_orderstatus NOT IN ('O', 'F', 'P'))
        FROM orders
        UNION ALL
        SELECT 'in_range(o_totalprice)',
               count(*) FILTER (WHERE o_totalprice IS NULL
                   OR o_totalprice < 0 OR o_totalprice > 1000000)
        FROM orders
        UNION ALL
        SELECT 'unique(o_orderkey)',
               coalesce(sum(n - 1), 0)
        FROM (SELECT o_orderkey, count(*) AS n FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1)
        UNION ALL
        SELECT 'references(o_custkey)', count(*)
        FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
    note="declarative data-quality suite (operators/quality.py): all "
    "expression checks compile into ONE scan's aggregates (count_if, "
    "map-side combined); uniqueness and FK checks add one groupBy and "
    "one broadcast anti-join — the dbt-test shape at scan cost",
)
def x42_data_quality(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators import quality as Q

    orders = T(spark, sf, "orders")
    return Q.run_checks(
        orders,
        scan_checks=[
            Q.not_null("o_custkey"),
            Q.accepted_values("o_orderstatus", ["O", "F", "P"]),
            Q.in_range("o_totalprice", 0, 1000000),
        ],
        unique_cols=["o_orderkey"],
        fk=("o_custkey", T(spark, sf, "customer"), "c_custkey"),
    )


_SHINGLE3_SQL = r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(w) - 4, 1) + 1),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])
               )) AS shingles
        FROM toks
    ),
    ex AS (
        SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
        FROM sh
    )
"""


@probe(
    "x43_containment",
    sql=_SHINGLE3_SQL
    + """
    , pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a,
               count(*) AS n_inter
        FROM ex a JOIN ex b USING (shingle)
        WHERE a.doc_id <> b.doc_id
        GROUP BY 1, 2, 3
    )
    SELECT id_a, id_b, round(n_inter / n_a, 4) AS containment
    FROM pairs WHERE round(n_inter / n_a, 4) >= 0.8
    """,
    note="asymmetric containment dedup (|A∩B|/|A|): catches a short "
    "doc fully embedded in a longer one, which symmetric Jaccard "
    "misses; directed pairs, same inverted-index plan as x2",
)
def x43_containment(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.dedup import containment_pairs

    return containment_pairs(T(spark, sf, "documents"), threshold=0.8)


@probe(
    "x44_ngram_novelty",
    sql=_SHINGLE3_SQL
    + """
    , first AS (
        SELECT shingle, min(doc_id) AS first_id FROM ex GROUP BY shingle
    )
    SELECT e.doc_id,
           round(count(*) FILTER (WHERE f.first_id = e.doc_id)
                 / any_value(e.n_sh), 4) AS novelty
    FROM ex e JOIN first f USING (shingle)
    GROUP BY e.doc_id
    """,
    note="per-doc n-gram novelty (fraction of shingles first seen in "
    "this doc, by id order) — the contribution score dedup-aware "
    "sampling ranks by; gram-table shuffle compressed by partial agg",
)
def x44_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.dedup import ngram_novelty

    return ngram_novelty(T(spark, sf, "documents"), n=5)


@probe(
    "x45_unigram_logprob",
    sql=r"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
                AS word
            FROM documents
        ),
        freq AS (
            SELECT word, count(*) AS c FROM toks GROUP BY word
        ),
        tot AS (SELECT sum(c) AS n FROM freq)
        SELECT t.doc_id,
               floor(avg(ln(f.c / tot.n)) * 10000.0 + 0.5) / 10000.0
                   AS avg_logprob
        FROM toks t JOIN freq f USING (word) CROSS JOIN tot
        GROUP BY t.doc_id
    """,
    note="unigram LM scoring (the KenLM-style perplexity proxy for "
    "quality filtering): corpus word frequencies -> per-token log-"
    "prob join -> per-doc average; the vocabulary aggregate is the "
    "only corpus-wide state and it is broadcast-sized",
)
def x45_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round, tokens

    toks = T(spark, sf, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    )
    freq = toks.groupBy("word").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    return (
        toks.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            portable_round(
                F.avg(F.log(F.col("c") / F.col("n")))
            ).alias("avg_logprob")
        )
    )


@probe(
    "j11_star_join",
    sql="""
        SELECT r_name, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    note="star join: fact x three broadcast dimensions in one stage — "
    "the canonical warehouse shape; every dim join is broadcast so "
    "the fact table never shuffles until the final rollup",
)
def j11_star_join(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@probe(
    "x46_entity_resolution",
    sql="""
        WITH RECURSIVE good AS (
            SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
              AND levenshtein(a.p_name, b.p_name) <= 2
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
        comp AS (SELECT node, min(lbl) AS canonical FROM reach GROUP BY node)
        SELECT p.p_partkey, coalesce(c.canonical, p.p_partkey) AS canonical
        FROM part p LEFT JOIN comp c ON c.node = p.p_partkey
    """,
    note="entity resolution / golden-record assignment: blocked fuzzy "
    "edges (f17) -> iterative min-label connected components (x21's "
    "machinery) -> canonical id per record; oracle = recursive-CTE "
    "reachability closure over the same edges",
)
def x46_entity_resolution(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.dedup import connected_components
    from flytemosaic_spark.operators.fuzzy import blocked_fuzzy_pairs

    part = T(spark, sf, "part")
    edges = blocked_fuzzy_pairs(part, "p_partkey", "p_name", "p_brand", 2)
    comp = connected_components(edges, src="a_key", dst="b_key")
    return (
        part.select("p_partkey")
        .join(comp.withColumnRenamed("node", "p_partkey"), "p_partkey", "left")
        .select(
            "p_partkey", F.coalesce("lbl", "p_partkey").alias("canonical")
        )
    )


@probe(
    "x47_event_transitions",
    sql="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS next_type
            FROM events
        )
        SELECT event_type, next_type, count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    """,
    note="behavioral transition matrix (Markov counts of event_type -> "
    "next event_type per user): one lead() over the per-user sort + a "
    "pair rollup — the feature extraction behind session modeling",
)
def x47_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        T(spark, sf, "events")
        .select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


@probe(
    "x48_profile_card",
    sql="""
        SELECT 'o_custkey' AS col,
               count(*) AS n,
               count(*) FILTER (WHERE o_custkey IS NULL) AS n_null,
               count(DISTINCT o_custkey) AS n_distinct,
               CAST(min(o_custkey) AS DOUBLE) AS mn,
               CAST(max(o_custkey) AS DOUBLE) AS mx
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*),
               count(*) FILTER (WHERE o_totalprice IS NULL),
               count(DISTINCT o_totalprice),
               round(min(o_totalprice), 2), round(max(o_totalprice), 2)
        FROM orders
    """,
    note="dataset profile card (per-column null/distinct/min/max): the "
    "stats summary every ingestion gate records — one scan per the "
    "multi-distinct Expand, no per-column passes",
)
def x48_profile_card(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    k = o.agg(
        F.lit("o_custkey").alias("col"),
        F.count("*").alias("n"),
        F.count_if(F.col("o_custkey").isNull()).alias("n_null"),
        F.countDistinct("o_custkey").alias("n_distinct"),
        F.min("o_custkey").cast("double").alias("mn"),
        F.max("o_custkey").cast("double").alias("mx"),
    )
    p = o.agg(
        F.lit("o_totalprice").alias("col"),
        F.count("*").alias("n"),
        F.count_if(F.col("o_totalprice").isNull()).alias("n_null"),
        F.countDistinct("o_totalprice").alias("n_distinct"),
        F.round(F.min("o_totalprice"), 2).alias("mn"),
        F.round(F.max("o_totalprice"), 2).alias("mx"),
    )
    return k.unionByName(p)


@probe(
    "x49_pmi_bigrams",
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
        bi AS (
            SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS c_ab
            FROM toks, LATERAL (
                SELECT unnest(generate_series(1, greatest(len(w) - 1, 1)))
                    AS i
            ) g
            WHERE i + 1 <= len(w)
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT w1, w2, c_ab,
                   floor(ln((c_ab * tot.n) / (a.c * b.c)) * 10000.0 + 0.5)
                       / 10000.0 AS pmi
            FROM bi JOIN uni a ON a.word = w1
                    JOIN uni b ON b.word = w2
                    CROSS JOIN tot
            WHERE c_ab >= 5
        )
        SELECT w1, w2, c_ab, pmi FROM scored
    """,
    note="pointwise mutual information over adjacent bigrams (the "
    "collocation/phrase-mining statistic): unigram + bigram counts "
    "(both map-side combined) -> broadcast join -> PMI; min-count "
    "cut keeps the output the interesting tail",
)
def x49_pmi_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round, tokens

    docs = T(spark, sf, "documents").select(tokens(F.col("text")).alias("w"))
    uni = docs.select(F.explode("w").alias("word")).groupBy("word").agg(
        F.count("*").alias("c")
    )
    total = uni.agg(F.sum("c").alias("n"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("w") - 1, F.lit(1))),
        lambda i: F.struct(
            F.element_at("w", i).alias("w1"),
            F.try_element_at("w", i + 1).alias("w2"),
        ),
    )
    bi = (
        docs.select(F.explode(grams).alias("g"))
        .where(F.col("g.w2").isNotNull())
        .groupBy(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= 5)
    )
    a = uni.select(F.col("word").alias("w1"), F.col("c").alias("c_a"))
    b = uni.select(F.col("word").alias("w2"), F.col("c").alias("c_b"))
    pmi = F.log(
        (F.col("c_ab") * F.col("n")) / (F.col("c_a") * F.col("c_b"))
    )
    return (
        bi.join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "c_ab", portable_round(pmi).alias("pmi"))
    )


@probe(
    "x50_salted_agg",
    sql="""
        SELECT l_suppkey, count(*) AS n,
               round(sum(l_quantity), 2) AS total_qty
        FROM lineitem GROUP BY l_suppkey
    """,
    note="salted two-phase aggregation (operators/skew.py): the skewed-"
    "key groupBy spread over 32 salts then merged — results identical "
    "to the plain groupBy (the oracle), which is the point: salting "
    "changes the exchange topology, never the algebra",
)
def x50_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.skew import salted_agg

    return salted_agg(
        T(spark, sf, "lineitem"),
        ["l_suppkey"],
        {
            "n": (F.count("*"), F.sum("n")),
            "total_qty": (F.sum("l_quantity"), F.round(F.sum("total_qty"), 2)),
        },
    )


@probe(
    "u5_intersect_all",
    sql="""
        SELECT c_nationkey AS k FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier
    """,
    note="bag-semantics INTERSECT ALL (duplicates preserved up to the "
    "min multiplicity) — a different operator from u2's set intersect: "
    "Spark plans a multiplicity-tracking aggregate, not a semi join",
)
def u5_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersectAll(s)


@probe(
    "u6_except_all",
    sql="""
        SELECT c_nationkey AS k FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier
    """,
    note="bag-semantics EXCEPT ALL (each left occurrence cancels one "
    "right occurrence) — the multiplicity subtraction u3's set except "
    "cannot express",
)
def u6_except_all(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.exceptAll(s)


@probe(
    "x51_cluster_keeper",
    sql="""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
            FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(w) - 4, 1) + 1),
                       i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
                                      w[i+4])
                   )) AS shingles
            FROM toks
        ),
        ex AS (
            SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
            FROM sh
        ),
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
        member AS (
            SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster,
                   d.n_chars
            FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        )
        SELECT cluster, doc_id AS keeper, n_chars AS keeper_chars
        FROM (
            SELECT *, row_number() OVER (PARTITION BY cluster
                ORDER BY n_chars DESC, doc_id) AS rn
            FROM member
        ) WHERE rn = 1
    """,
    note="quality-weighted keeper per duplicate cluster: connected "
    "components (x21) + arg-max on a quality signal (longest doc, "
    "id tie-break) — the 'which duplicate survives' policy curation "
    "pipelines actually need (min-id keepers discard the best copy)",
)
def x51_cluster_keeper(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators import dedup
    from flytemosaic_spark.operators.dedup import connected_components

    docs = T(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    member = (
        docs.select("doc_id", "n_chars")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("lbl", "doc_id").alias("cluster"),
        )
    )
    return (
        member.groupBy("cluster")
        .agg(
            F.expr(
                "max_by(doc_id, struct(n_chars, -doc_id))"
            ).alias("keeper"),
            F.max(F.struct("n_chars", (-F.col("doc_id")).alias("neg")))[
                "n_chars"
            ].alias("keeper_chars"),
        )
    )


@probe(
    "x52_windowed_distinct",
    sql="""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events GROUP BY bucket
    """,
    note="distinct users per tumbling hour (the DAU/WAU shape): "
    "window bucket + distinct aggregate in one pass; the KMV sketch "
    "(x28) is the drop-in when per-window distinct state outgrows "
    "memory",
)
def x52_windowed_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .select(F.col("w.start").alias("bucket"), "n_users", "n_events")
    )


@probe(
    "a28_weighted_avg",
    sql="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
                   AS wavg_price
        FROM lineitem GROUP BY l_returnflag
    """,
    note="weighted mean per group — two partial-aggregatable sums, one "
    "division at finalize; never a UDF or a two-pass plan",
)
def a28_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity"),
                4,
            ).alias("wavg_price")
        )
    )


@probe(
    "x53_per_class_examples",
    sql="""
        SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4),
                                doc_id) AS rn
            FROM documents
        ) WHERE rn <= 8
    """,
    note="exactly-k-per-class sampling (few-shot / eval-set building): "
    "deterministic md5-order rank per class, k kept — reservoir-"
    "sampling semantics without randomness, reproducible under retry",
)
def x53_per_class_examples(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sampling import hash_bucket

    w = Window.partitionBy("lang").orderBy(
        hash_bucket(F.col("doc_id")), F.col("doc_id")
    )
    return (
        T(spark, sf, "documents")
        .select("doc_id", "lang")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 8)
        .drop("_rn")
    )


@probe(
    "x54_class_weights",
    sql="""
        WITH c AS (SELECT lang, count(*) AS n_class FROM documents
                   GROUP BY lang),
        t AS (SELECT sum(n_class) AS n_total, count(*) AS k FROM c)
        SELECT lang, n_class,
               floor((CAST(n_total AS DOUBLE) / (k * n_class)) * 10000.0
                     + 0.5) / 10000.0 AS weight
        FROM c CROSS JOIN t
    """,
    note="inverse-frequency class weights (n_total / (k * n_class), "
    "the sklearn 'balanced' formula): one scan + one hash-agg, then "
    "the global sums come from a whole-frame window over the "
    "class-cardinality rows (metadata-scale by construction) — the "
    "loss-reweighting table for imbalanced training data",
)
def x54_class_weights(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    c = T(spark, sf, "documents").groupBy("lang").agg(
        F.count("*").alias("n_class")
    )
    # global totals via a window over the (few) class rows: the fact
    # table is scanned ONCE; the agg+crossJoin form scans it twice
    from flytemosaic_spark.plans.prefix import bounded_total

    wall = bounded_total("lang")
    n_total = F.sum("n_class").over(wall)
    k = F.count("*").over(wall)
    w = n_total.cast("double") / (k * F.col("n_class"))
    return c.select("lang", "n_class", portable_round(w).alias("weight"))


@probe(
    "x55_normalized_dedup",
    sql="""
        WITH norm AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
            FROM documents
        )
        SELECT h AS norm_hash, min(doc_id) AS keeper, count(*) AS n_copies
        FROM norm GROUP BY h
    """,
    note="normalization-invariant exact dedup: lowercase, strip "
    "punctuation, collapse whitespace, then content-hash — catches "
    "the case/punctuation variants byte-exact dedup (x1) misses, "
    "still one hash-groupBy (Spark regexp_replace is global; the "
    "oracle needs DuckDB's 'g' flag)",
)
def x55_normalized_dedup(spark: SparkSession, sf: str) -> DataFrame:
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), r"[^a-z0-9 ]", " "),
            r" +",
            " ",
        )
    )
    return (
        T(spark, sf, "documents")
        .select("doc_id", F.md5(norm).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
    )


@probe(
    "w13_moving_avg",
    sql="""
        SELECT event_id,
               floor(avg(value) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
                   * 10000.0 + 0.5) / 10000.0 AS smooth
        FROM events
    """,
    note="centered moving average (±2 rows) — the smoothing frame "
    "shape (w2 is running, w8 is trailing-by-time; this is the "
    "symmetric third)",
)
def w13_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
    )
    return T(spark, sf, "events").select(
        "event_id", portable_round(F.avg("value").over(w)).alias("smooth")
    )


@probe(
    "x56_zscore_anomalies",
    sql="""
        WITH stats AS (
            SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd
            FROM events GROUP BY user_id
        )
        SELECT e.event_id,
               floor(((e.value - s.mu) / s.sd) * 10000.0 + 0.5) / 10000.0
                   AS z
        FROM events e JOIN stats s USING (user_id)
        WHERE s.sd > 0 AND abs((e.value - s.mu) / s.sd) > 2.5
    """,
    note="per-key z-score anomaly flags: one stats aggregate joined "
    "back to the stream (broadcast at dimension scale, co-partitioned "
    "otherwise) — the telemetry outlier gate",
)
def x56_zscore_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    ev = T(spark, sf, "events")
    stats = ev.groupBy("user_id").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.join(stats, "user_id")
        .where((F.col("sd") > 0) & (F.abs(z) > 2.5))
        .select("event_id", portable_round(z).alias("z"))
    )


@probe(
    "x57_ohlc",
    sql="""
        WITH b AS (
            SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket,
                   ts, event_id, value
            FROM events
        ),
        r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY bucket
                       ORDER BY ts, event_id) AS rn_open,
                   row_number() OVER (PARTITION BY bucket
                       ORDER BY ts DESC, event_id DESC) AS rn_close
            FROM b
        )
        SELECT bucket,
               round(min(CASE WHEN rn_open = 1 THEN value END), 2) AS open,
               round(max(value), 2) AS high,
               round(min(value), 2) AS low,
               round(min(CASE WHEN rn_close = 1 THEN value END), 2) AS close,
               count(*) AS n
        FROM r GROUP BY bucket
    """,
    note="hourly OHLC bars: open/close via min_by/max_by on a "
    "(ts, id) struct — one hash-agg, no window, where the oracle "
    "needs two row_number passes; the financial-rollup shape",
)
def x57_ohlc(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.round(
                F.expr("min_by(value, struct(ts, event_id))"), 2
            ).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(
                F.expr("max_by(value, struct(ts, event_id))"), 2
            ).alias("close"),
            F.count("*").alias("n"),
        )
        .select(F.col("w.start").alias("bucket"), "open", "high", "low",
                "close", "n")
    )


@probe(
    "x58_histogram2d",
    sql="""
        SELECT CAST(floor(c_acctbal / 2000) AS BIGINT) AS bx,
               CAST(floor(c_nationkey / 5) AS BIGINT) AS by,
               count(*) AS n
        FROM customer GROUP BY 1, 2
    """,
    note="2-D histogram (heatmap bins) over two columns — one "
    "hash-agg on the composite bin key; the density-report twin of "
    "a18's 1-D binning",
)
def x58_histogram2d(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "customer")
        .groupBy(
            F.floor(F.col("c_acctbal") / 2000).cast("bigint").alias("bx"),
            F.floor(F.col("c_nationkey") / 5).cast("bigint").alias("by"),
        )
        .agg(F.count("*").alias("n"))
    )


@probe(
    "j12_left_outer",
    sql="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c LEFT OUTER JOIN (
            SELECT * FROM orders WHERE o_totalprice > 450000
        ) o ON o.o_custkey = c.c_custkey
    """,
    note="left outer join with an unmatched majority (nulls "
    "preserved) — the explicit outer-join probe the inner/semi/anti "
    "family (j3/j4/j5) does not cover",
)
def j12_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").where(F.col("o_totalprice") > 450000)
    return c.join(o, o.o_custkey == c.c_custkey, "left_outer").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@probe(
    "x59_interevent_gaps",
    sql="""
        WITH g AS (
            SELECT event_type,
                   epoch_ms(ts) - epoch_ms(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms
            FROM events
        )
        SELECT event_type,
               count(gap_ms) AS n_gaps,
               CAST(min(gap_ms) AS BIGINT) AS min_ms,
               floor(quantile_cont(gap_ms, 0.5) * 10000.0 + 0.5) / 10000.0
                   AS median_ms
        FROM g WHERE gap_ms IS NOT NULL GROUP BY event_type
    """,
    note="inter-event think-time distribution: per-user lag diff in "
    "ms, rolled up per event type with an exact median — the arrival-"
    "process stats behind session-gap and rate-limit tuning",
)
def x59_interevent_gaps(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gaps = T(spark, sf, "events").select(
        "event_type",
        (ms - F.lag(ms).over(w)).alias("gap_ms"),
    ).where(F.col("gap_ms").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_ms").alias("n_gaps"),
        F.min("gap_ms").cast("bigint").alias("min_ms"),
        portable_round(
            F.percentile("gap_ms", F.lit(0.5))
        ).alias("median_ms"),
    )


@probe(
    "x60_share_of_total",
    sql="""
        WITH n AS (
            SELECT n_name, round(sum(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        )
        SELECT n_name, revenue,
               floor(revenue / sum(revenue) OVER () * 10000.0 + 0.5)
                   / 10000.0 AS share
        FROM n
    """,
    note="percent-of-total contribution: the whole-frame window runs "
    "over the ALREADY-aggregated (dimension-sized) rows, so the "
    "single-partition window is metadata-scale by construction",
)
def x60_share_of_total(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    from flytemosaic_spark.plans.prefix import bounded_total

    w = bounded_total("n_name")
    return rev.select(
        "n_name",
        "revenue",
        portable_round(F.col("revenue") / F.sum("revenue").over(w)).alias(
            "share"
        ),
    )


@probe(
    "x61_mom_growth",
    sql="""
        WITH m AS (
            SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE))
                   AS DATE) AS month,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT month, revenue,
               floor((revenue - lag(revenue) OVER (ORDER BY month))
                     / lag(revenue) OVER (ORDER BY month)
                     * 10000.0 + 0.5) / 10000.0 AS mom
        FROM m
    """,
    note="period-over-period growth: monthly rollup (data-scale agg) "
    "then lag over the month axis — the window input is months, not "
    "rows, so the global order is metadata-scale",
)
def x61_mom_growth(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    m = (
        T(spark, sf, "orders")
        .groupBy(
            F.date_trunc("month", F.to_date("o_orderdate"))
            .cast("date")
            .alias("month")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    # month axis: bounded cardinality
    w = bounded_window("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        portable_round((F.col("revenue") - prev) / prev).alias("mom"),
    )


@probe(
    "x62_user_growth",
    sql="""
        WITH f AS (
            SELECT user_id,
                   CAST(date_trunc('month', CAST(min(ts) AS DATE)) AS DATE)
                       AS cohort
            FROM events GROUP BY user_id
        ),
        m AS (SELECT cohort, count(*) AS new_users FROM f GROUP BY cohort)
        SELECT cohort, new_users,
               sum(new_users) OVER (ORDER BY cohort
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS total_users
        FROM m
    """,
    note="cumulative user growth curve: first-seen month per user "
    "(one agg), monthly new-user counts, running total over the "
    "month axis — the ubiquitous growth chart, window input is "
    "months so the global order costs nothing",
)
def x62_user_growth(spark: SparkSession, sf: str) -> DataFrame:
    f = (
        T(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.date_trunc("month", F.to_date(F.min("ts")))
            .cast("date")
            .alias("cohort")
        )
    )
    m = f.groupBy("cohort").agg(F.count("*").alias("new_users"))
    # cohort (month) axis: bounded cardinality
    w = bounded_window("cohort").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return m.select(
        "cohort", "new_users", F.sum("new_users").over(w).alias("total_users")
    )


@probe(
    "x63_skew_report",
    sql="""
        WITH k AS (
            SELECT l_suppkey, count(*) AS n FROM lineitem
            GROUP BY l_suppkey
        )
        SELECT count(*) AS n_keys,
               CAST(max(n) AS BIGINT) AS max_rows,
               floor(avg(n) * 10000.0 + 0.5) / 10000.0 AS avg_rows,
               floor(max(n) / avg(n) * 10000.0 + 0.5) / 10000.0
                   AS skew_factor
        FROM k
    """,
    note="partition-skew diagnostics: per-key cardinality rollup -> "
    "max/avg skew factor — the report that tells you whether a key "
    "needs salting (operators/skew.py) before the real job runs",
)
def x63_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    k = T(spark, sf, "lineitem").groupBy("l_suppkey").agg(
        F.count("*").alias("n")
    )
    return k.agg(
        F.count("*").alias("n_keys"),
        F.max("n").cast("bigint").alias("max_rows"),
        portable_round(F.avg("n")).alias("avg_rows"),
        portable_round(F.max("n") / F.avg("n")).alias("skew_factor"),
    )


@probe(
    "x64_column_entropy",
    sql="""
        WITH c AS (
            SELECT o_orderpriority AS v, count(*) AS n FROM orders
            GROUP BY 1
        ),
        t AS (SELECT sum(n) AS total FROM c)
        SELECT floor(-sum((n / total) * ln(n / total)) * 10000.0 + 0.5)
                   / 10000.0 AS entropy,
               count(*) AS n_values
        FROM c CROSS JOIN t
    """,
    note="Shannon entropy of a categorical column (profile-card "
    "depth): value histogram + one fold — flags near-constant or "
    "near-unique columns before they become bad partition keys; the "
    "normalizing total comes from a window over the histogram rows, "
    "so the fact table is scanned once",
)
def x64_column_entropy(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    c = T(spark, sf, "orders").groupBy("o_orderpriority").agg(
        F.count("*").alias("n")
    )
    from flytemosaic_spark.plans.prefix import bounded_total

    p = F.col("n") / F.sum("n").over(bounded_total("o_orderpriority"))
    return c.select(p.alias("_p")).agg(
        portable_round(-F.sum(F.col("_p") * F.log("_p"))).alias("entropy"),
        F.count("*").alias("n_values"),
    )


@probe(
    "w14_dense_rank",
    sql="""
        SELECT l_orderkey, l_linenumber,
               dense_rank() OVER (PARTITION BY l_returnflag
                   ORDER BY CAST(l_quantity AS BIGINT) DESC) AS drnk
        FROM lineitem
    """,
    note="dense_rank over a tied ordering (no gaps after ties — the "
    "behavior rank() in w5 cannot express); tie-heavy integer "
    "quantities make the distinction observable",
)
def w14_dense_rank(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc(F.col("l_quantity").cast("bigint"))
    )
    return T(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@probe(
    "x65_retention_rate",
    sql="""
        WITH first_seen AS (
            SELECT user_id,
                   CAST(date_trunc('week', CAST(min(ts) AS DATE)) AS DATE)
                       AS cohort
            FROM events GROUP BY user_id
        ),
        size_ AS (
            SELECT cohort, count(*) AS cohort_size FROM first_seen
            GROUP BY cohort
        ),
        activity AS (
            SELECT DISTINCT e.user_id, f.cohort,
                   CAST(date_trunc('week', CAST(e.ts AS DATE)) AS DATE)
                       AS week
            FROM events e JOIN first_seen f USING (user_id)
        ),
        counts AS (
            SELECT cohort, week, count(*) AS n_active FROM activity
            GROUP BY cohort, week
        )
        SELECT c.cohort, c.week, c.n_active,
               floor(c.n_active / CAST(s.cohort_size AS DOUBLE)
                     * 10000.0 + 0.5) / 10000.0 AS retention
        FROM counts c JOIN size_ s USING (cohort)
    """,
    note="normalized retention rates (x41's matrix / cohort size): "
    "single-scan form — cohort = min(ts) window per user (no agg+join "
    "back), and cohort_size is recovered from the counts themselves "
    "(every user is active in their own cohort week by construction, "
    "so n_active at week==cohort IS the cohort size); one fact scan, "
    "no second aggregate branch",
)
def x65_retention_rate(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import portable_round

    ev = T(spark, sf, "events")
    week = lambda c: F.date_trunc("week", F.to_date(c)).cast("date")  # noqa: E731
    w_user = Window.partitionBy("user_id")
    activity = ev.select(
        "user_id",
        week(F.min("ts").over(w_user)).alias("cohort"),
        week("ts").alias("week"),
    ).distinct()
    counts = activity.groupBy("cohort", "week").agg(
        F.count("*").alias("n_active")
    )
    # cohort_size = n_active of the cohort's own first week
    w_cohort = Window.partitionBy("cohort")
    size = F.max(
        F.when(F.col("week") == F.col("cohort"), F.col("n_active"))
    ).over(w_cohort)
    return counts.select(
        "cohort",
        "week",
        "n_active",
        portable_round(F.col("n_active") / size.cast("double")).alias(
            "retention"
        ),
    )


@probe(
    "x66_ab_lift",
    sql="""
        WITH assigned AS (
            SELECT value,
                   CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 4)
                        < '8000' THEN 'A' ELSE 'B' END AS arm
            FROM events WHERE event_type = 'purchase'
        )
        SELECT arm, count(*) AS n,
               floor(avg(value) * 10000.0 + 0.5) / 10000.0 AS mean_value,
               floor(stddev_samp(value) * 10000.0 + 0.5) / 10000.0
                   AS sd_value
        FROM assigned GROUP BY arm
    """,
    note="A/B experiment readout on the deterministic md5-bucket "
    "assignment (x19's machinery): per-arm mean/sd of the success "
    "metric — assignment reproducible under retry, never rand()",
)
def x66_ab_lift(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.sampling import hash_bucket
    from flytemosaic_spark.operators.text import portable_round

    arm = F.when(hash_bucket(F.col("user_id")) < "8000", "A").otherwise("B")
    return (
        T(spark, sf, "events")
        .where(F.col("event_type") == "purchase")
        .select("value", arm.alias("arm"))
        .groupBy("arm")
        .agg(
            F.count("*").alias("n"),
            portable_round(F.avg("value")).alias("mean_value"),
            portable_round(F.stddev_samp("value")).alias("sd_value"),
        )
    )


@probe(
    "x67_first_touch",
    sql="""
        WITH c AS (
            SELECT user_id, ts AS click_ts, event_id AS click_id
            FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
            FROM events WHERE event_type = 'purchase'
        ),
        joined AS (
            SELECT p.user_id, purchase_id, click_id,
                   row_number() OVER (PARTITION BY purchase_id
                       ORDER BY click_ts, click_id) AS rn
            FROM p JOIN c ON p.user_id = c.user_id
                AND c.click_ts <= p.purchase_ts
                AND c.click_ts >= p.purchase_ts - INTERVAL 12 HOURS
        )
        SELECT user_id, purchase_id, click_id FROM joined WHERE rn = 1
    """,
    note="FIRST-touch attribution (earliest click in the window) — "
    "the marketing counterpart of x22/x29's last-touch as-of; the "
    "interval join is shared, only the pick rule changes",
)
def x67_first_touch(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.streaming.events import attribute_purchases

    pairs = attribute_purchases(T(spark, sf, "events"))
    w = Window.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "purchase_id", "click_id")
    )


@probe(
    "x68_value_deciles",
    sql="""
        WITH d AS (
            SELECT o_totalprice,
                   ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                       AS decile
            FROM orders
        )
        SELECT decile, count(*) AS n,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi,
               round(sum(o_totalprice), 2) AS total
        FROM d GROUP BY decile
    """,
    note="decile table (the value-distribution report): exact ntile "
    "semantics via the plans/prefix.py distributed row_number (range "
    "buckets + per-bucket windows + count offsets) and the closed-form "
    "SQL-standard tile allocation — no single-partition window; the "
    "only broadcast is the 1-row global count",
)
def x68_value_deciles(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.plans.prefix import distributed_row_number, ntile_from_rn

    base = T(spark, sf, "orders").select("o_totalprice", "o_orderkey")
    rn = distributed_row_number(base, ("o_totalprice", "o_orderkey"), out_col="_rn")
    n_df = base.agg(F.count("*").alias("_N"))
    return (
        rn.crossJoin(F.broadcast(n_df))
        .select(
            "o_totalprice",
            ntile_from_rn(F.col("_rn"), F.col("_N"), 10).cast("int").alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@probe(
    "x69_length_buckets",
    sql=r"""
        WITH n AS (
            SELECT CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END
                   AS n_tok
            FROM documents
        )
        SELECT CAST(floor(n_tok / 16) AS BIGINT) AS bucket,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens
        FROM n GROUP BY 1
    """,
    note="token-length distribution buckets (the dataloader-planning "
    "report feeding x25's packing: how many docs per length band, "
    "how many tokens they carry)",
)
def x69_length_buckets(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import token_count

    n = token_count(F.col("text"))
    return (
        T(spark, sf, "documents")
        .select(F.floor(n / 16).cast("bigint").alias("bucket"), n.alias("n"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
        )
    )


@probe(
    "x70_langid_confusion",
    sql=r"""
        WITH toks AS (
            SELECT doc_id, lang,
                   string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        hits AS (
            SELECT doc_id, lang,
                   len(list_filter(w, t -> t IN ('the','and','of','a','to',
                       'in','is'))) AS h_en,
                   len(list_filter(w, t -> t IN ('le','la','les','et','de',
                       'un','est'))) AS h_fr,
                   len(list_filter(w, t -> t IN ('der','die','das','und',
                       'ist','ein'))) AS h_de,
                   len(list_filter(w, t -> t IN ('el','la','los','y','de',
                       'es','un'))) AS h_es
            FROM toks
        ),
        pred AS (
            SELECT lang,
                   CASE WHEN greatest(h_en, h_fr, h_de, h_es) = 0 THEN 'und'
                        WHEN h_en = greatest(h_en, h_fr, h_de, h_es)
                            THEN 'en'
                        WHEN h_fr = greatest(h_en, h_fr, h_de, h_es)
                            THEN 'fr'
                        WHEN h_de = greatest(h_en, h_fr, h_de, h_es)
                            THEN 'de'
                        ELSE 'es' END AS lang_pred
            FROM hits
        )
        SELECT lang, lang_pred, count(*) AS n
        FROM pred GROUP BY lang, lang_pred
    """,
    note="classifier-evaluation confusion matrix: the x8 heuristic's "
    "predictions rolled up against the labeled lang column — the "
    "eval-against-labels shape every heuristic gate needs before "
    "it filters a corpus",
)
def x70_langid_confusion(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.text import lang_id

    return (
        T(spark, sf, "documents")
        .select("lang", lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


@probe(
    "x71_trending",
    sql="""
        WITH c AS (
            SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT bucket, event_type, n FROM (
            SELECT *, row_number() OVER (PARTITION BY bucket
                ORDER BY n DESC, event_type) AS rn
            FROM c
        ) WHERE rn <= 2
    """,
    note="trending-per-window (top-k event types per hour): window "
    "counts then a rank over the (bucket, type) AGGREGATE — the "
    "window's input is already bucket-cardinality, so the per-bucket "
    "sort is tiny no matter the event volume",
)
def x71_trending(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        T(spark, sf, "events")
        .groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n")
    )
    rank_w = Window.partitionBy("bucket").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return (
        c.withColumn("_rn", F.row_number().over(rank_w))
        .where(F.col("_rn") <= 2)
        .drop("_rn")
    )
