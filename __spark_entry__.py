"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the pricing-summary-style
masked composite aggregation — the Spark re-expression of the
reference's QA-masked temporal mean/median flagship, SURVEY §2.4
A6/A7) on sf0.001. ``queries()``/``oracle_sql()`` expose the full
probe registry from :mod:`flytemosaic_spark.probes` — one entry per
implemented operator from SURVEY.md §2, each paired with DuckDB
oracle SQL where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.probes import all_probes
from flytemosaic_spark.sources.tables import load_table

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: QA-masked grouped composite over lineitem (the long-model
    form of the reference's masked temporal mean/median kernel,
    /root/reference/flytemosaic/datasets/glad.py:259-282)."""
    li = load_table(spark, SF0001, "lineitem")
    masked_qty = F.when(F.col("l_returnflag") == "A", F.col("l_quantity"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg(masked_qty), 4).alias("masked_avg_qty"),
            F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_revenue"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: p.fn for name, p in all_probes().items()}


def oracle_sql() -> dict[str, str]:
    return {name: p.sql for name, p in all_probes().items() if p.sql is not None}
