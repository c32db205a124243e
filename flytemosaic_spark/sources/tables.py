"""Parquet table access for the driver test data.

Mirrors the reference's S1 parquet scan of its checked-in tile index
(reference: flytemosaic/datasets/glad.py:39-47) — in Spark a plain
``spark.read.parquet`` whose column pruning and predicate pushdown
Catalyst handles (PushedFilters/ReadSchema visible in .explain).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from flytemosaic_spark.shipping import ship_package

    ship_package(spark)  # workers must import this package (pandas UDFs)
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    parquet reader rejects. Read nanos as long (legacy conf) and convert
    losslessly to a microsecond timestamp with integer arithmetic
    (``div``, not float division — nanos exceed 2^53)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = False
) -> dict[str, DataFrame]:
    dfs = {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
    if register_views:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
    return dfs
