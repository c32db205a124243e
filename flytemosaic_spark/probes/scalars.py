"""Scalar-function probes (SURVEY §2.7 F1-F14 + JSON extension).

All pure Catalyst column expressions — never Python UDFs — so the
whole probe stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.functions.paths import path_join, relative_to, url_template, vsi_rewrite
from flytemosaic_spark.functions.temporal import clamp, date_to_period, period_to_date
from flytemosaic_spark.probes.registry import T, probe


@probe(
    "f1_vsi_rewrite",
    sql="""
        SELECT doc_id,
               regexp_replace('s3://bucket/' || source, '^s3://', '/vsis3/') AS vsi_url
        FROM documents
    """,
    note="url scheme rewrite gs://→/vsigs/ (ref mosaics.py:74-76)",
)
def f1_vsi_rewrite(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    url = F.concat(F.lit("s3://bucket/"), F.col("source"))
    return d.select("doc_id", vsi_rewrite(url).alias("vsi_url"))


@probe(
    "f2_split_part",
    sql="SELECT c_custkey, split_part(c_name, '#', 2) AS tail FROM customer",
    note="split+last token, tile→lat (ref glad.py:52)",
)
def f2_split_part(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "customer").select(
        "c_custkey", F.element_at(F.split("c_name", "#"), -1).alias("tail")
    )


@probe(
    "f3_url_template",
    sql="""
        SELECT event_id,
               's3://data/tiles/' || event_type || '/' || CAST(event_id AS VARCHAR)
                   || '.tif' AS url
        FROM events
    """,
    note="url templating (ref glad.py:25,54-57)",
)
def f3_url_template(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "events").select(
        "event_id",
        url_template("s3://data/tiles/%s/%d.tif", F.col("event_type"), F.col("event_id")).alias(
            "url"
        ),
    )


@probe(
    "f4_prefix_strip",
    sql="SELECT doc_id, regexp_replace(source, '^src', '') AS rel FROM documents",
    note="path relative-to / prefix strip (ref protocols.py:84-85)",
)
def f4_prefix_strip(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "documents").select(
        "doc_id", relative_to(F.col("source"), "src").alias("rel")
    )


@probe(
    "f5_path_join",
    sql="""
        SELECT doc_id, concat_ws('/', 's3://bucket', lang, CAST(doc_id AS VARCHAR)) AS path
        FROM documents
    """,
    note="path join (ref protocols.py:36-37,244-245)",
)
def f5_path_join(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "documents").select(
        "doc_id",
        path_join(F.lit("s3://bucket"), F.col("lang"), F.col("doc_id").cast("string")).alias(
            "path"
        ),
    )


@probe(
    "f6_date_to_period",
    sql="""
        SELECT o_orderkey,
               392 + 23 * (CAST(year(o_orderdate) AS BIGINT) - 1997)
                   + (CAST(dayofyear(o_orderdate) AS BIGINT) - 1) // 16 AS period
        FROM orders
    """,
    note="date→16-day period grid (ref glad.py:34-36)",
)
def f6_date_to_period(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").select(
        "o_orderkey", date_to_period(F.col("o_orderdate")).alias("period")
    )


@probe(
    "f7_period_to_date",
    sql="""
        WITH periods AS (
            SELECT DISTINCT
                   392 + 23 * (CAST(year(o_orderdate) AS BIGINT) - 1997)
                       + (CAST(dayofyear(o_orderdate) AS BIGINT) - 1) // 16 AS period
            FROM orders
        )
        SELECT period,
               make_date(1997 + CAST(floor((period - 392) / 23.0) AS INT), 1, 1)
                   + CAST(16 * (period - 392
                       - 23 * CAST(floor((period - 392) / 23.0) AS BIGINT)) AS INT)
                   AS period_start
        FROM periods
    """,
    note="period→date inverse (ref glad.py:28-31)",
)
def f7_period_to_date(spark: SparkSession, sf: str) -> DataFrame:
    periods = (
        T(spark, sf, "orders")
        .select(date_to_period(F.col("o_orderdate")).alias("period"))
        .distinct()
    )
    return periods.select("period", period_to_date(F.col("period")).alias("period_start"))


@probe(
    "f8_snap_to_year",
    sql="SELECT DISTINCT date_trunc('year', o_orderdate) AS year_start FROM orders",
    note="snap-to-year temporal grid (ref glad.py:233-234)",
)
def f8_snap_to_year(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .select(F.date_trunc("year", F.col("o_orderdate")).alias("year_start"))
        .distinct()
    )


@probe(
    "f9_clamp",
    sql="""
        SELECT o_orderkey,
               least(greatest(o_orderdate, TIMESTAMP '1996-01-01'),
                     TIMESTAMP '2000-12-31') AS clamped
        FROM orders
    """,
    note="clamp to [earliest, latest] (ref glad.py:182-185,251-252)",
)
def f9_clamp(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").select(
        "o_orderkey",
        clamp(
            F.col("o_orderdate"),
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("2000-12-31").cast("timestamp"),
        ).alias("clamped"),
    )


@probe(
    "f10_date_format",
    sql="SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d') AS ymd FROM orders",
    note="date formatting %Y%m%d (ref protocols.py:263-265)",
)
def f10_date_format(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").select(
        "o_orderkey", F.date_format("o_orderdate", "yyyyMMdd").alias("ymd")
    )


@probe(
    "f12_chunk_budget_math",
    sql="""
        SELECT o_orderkey,
               greatest(1, CAST(floor(sqrt(o_totalprice / 100.0)) AS BIGINT)) AS mult
        FROM orders
    """,
    note="bytes-per-chunk sqrt multiplier (ref mosaics.py:277-281)",
)
def f12_chunk_budget_math(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").select(
        "o_orderkey",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor(F.sqrt(F.col("o_totalprice") / 100.0)).cast("bigint"),
        ).alias("mult"),
    )


@probe(
    "f13_row_digest",
    sql="SELECT count(DISTINCT md5(CAST(o_orderkey AS VARCHAR))) AS n_hashes FROM orders",
    note="frame digest via row hashes (ref scenes.py:252-253); md5 is engine-portable",
)
def f13_row_digest(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").agg(
        F.countDistinct(F.md5(F.col("o_orderkey").cast("string"))).alias("n_hashes")
    )


@probe(
    "f14_enum_filter",
    sql="""
        SELECT o_orderstatus, count(*) AS n FROM orders
        WHERE o_orderstatus IN ('O', 'F') GROUP BY o_orderstatus
    """,
    note="enum validate via IN-set (ref datasets/__init__.py:22-25)",
)
def f14_enum_filter(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .filter(F.col("o_orderstatus").isin("O", "F"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@probe(
    "f15_json_extract",
    sql="SELECT event_id, json_extract_string(props, '$.k') AS k FROM events",
    note="JSON extraction (extension; events.props per TESTDATA)",
)
def f15_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "events").select(
        "event_id", F.get_json_object("props", "$.k").alias("k")
    )
