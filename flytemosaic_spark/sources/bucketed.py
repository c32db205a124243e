"""Bucketed table layout — co-located joins and aggregations with NO
shuffle at read time.

The reference manually replicates its small tile index everywhere and
re-sorts per task (SURVEY §4 broadcast row); for fact-to-fact joins at
100 TB neither broadcasting nor shuffling is acceptable — the classic
answer is bucketing: both tables are written pre-hashed into the same
number of buckets on the join key, so a later join/groupBy on that key
is a zero-exchange zipper over bucket pairs. One shuffle at write
time is amortized over every subsequent query.

Spark specifics: bucketed tables must go through ``saveAsTable`` (the
bucket metadata lives in the session catalog);
``spark.sql.sources.bucketing.enabled`` is on by default and AQE
respects bucketed scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """One-time shuffle: write ``df`` bucketed (and sorted) by ``key``.
    Sorting within buckets additionally enables zero-sort sort-merge
    joins."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle Exchange — the
    property bucketed co-located joins must NOT have."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return any(
        line.strip().startswith(("Exchange", "+- Exchange"))
        or " Exchange " in line
        or line.lstrip("+- ").startswith("Exchange")
        for line in plan.splitlines()
    )
