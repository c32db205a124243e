"""SQL frontend: the engine's full relational surface (SURVEY §2.2-
§2.7 and the extension operators) as plain ANSI SQL over registered
views — the reference exposes Python workflows only; Catalyst
optimizes the SQL form exactly like the DataFrame form."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flytemosaic_spark.sources.tables import load_tables


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register one view per testdata table, then run ``query``."""
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(query)
