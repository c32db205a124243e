"""Declarative data-quality checks (the dbt-test / Great-Expectations
shape): each check compiles to ONE aggregate expression, so a whole
suite runs as a single scan with map-side partial aggregation — at
100 TB you cannot afford one pass per assertion.

Checks return a long violation count (0 = pass):

- ``not_null(col)`` — count of NULLs;
- ``accepted_values(col, values)`` — count outside the set;
- ``unique(col)`` — duplicate row count (needs its own groupBy pass,
  the one check that can't be a plain scan aggregate; it shares the
  scan via the same input frame);
- ``in_range(col, lo, hi)`` — count outside [lo, hi];
- ``references(col, dim, dim_col)`` — FK violations via left-anti
  against the (broadcastable) dimension.

``run_checks`` evaluates everything and returns a tidy
(check, violations) report — the thing you gate a pipeline on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.count_if(F.col(col).isNull())


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    return (
        f"accepted_values({col})",
        F.count_if(~F.col(col).isin(values) | F.col(col).isNull()),
    )


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return (
        f"in_range({col})",
        F.count_if(
            F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi)
        ),
    )


def run_checks(
    df: DataFrame,
    scan_checks: list[tuple[str, Column]],
    unique_cols: list[str] | None = None,
    fk: tuple[str, DataFrame, str] | None = None,
) -> DataFrame:
    """One scan for all expression checks + optional uniqueness and FK
    passes, unioned into a (check, violations) report."""
    spark = df.sparkSession
    parts = []
    if scan_checks:
        agg = df.agg(
            *[expr.cast("long").alias(f"_c{i}") for i, (_, expr) in enumerate(scan_checks)]
        )
        names = F.array(*[F.lit(name) for name, _ in scan_checks])
        vals = F.array(*[F.col(f"_c{i}") for i in range(len(scan_checks))])
        parts.append(
            agg.select(
                F.explode(F.arrays_zip(names.alias("check"), vals.alias("violations"))).alias("z")
            ).select(F.col("z.check").alias("check"), F.col("z.violations").alias("violations"))
        )
    if unique_cols:
        dups = (
            df.groupBy(*unique_cols)
            .count()
            .where(F.col("count") > 1)
            .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("violations"))
            .select(
                F.lit(f"unique({','.join(unique_cols)})").alias("check"),
                F.col("violations").cast("long"),
            )
        )
        parts.append(dups)
    if fk is not None:
        col, dim, dim_col = fk
        orphans = (
            df.join(
                F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
                col,
                "left_anti",
            )
            .agg(F.count("*").alias("violations"))
            .select(
                F.lit(f"references({col})").alias("check"),
                F.col("violations").cast("long"),
            )
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Clip a metric to its per-group [lower, upper] quantiles — the
    standard outlier-robust normalization before averaging a noisy
    signal (revenue, latency, score).

    Physical shape: the quantile table is group-cardinality (one exact
    interpolated-percentile aggregate), broadcast back onto the fact
    rows — no re-shuffle of the fact table by group, which matters
    when one group dominates (the same skew that makes a window over
    partitionBy(group) a straggler at 100 TB). Swap F.percentile for
    percentile_approx when group cardinality explodes; the plan is
    unchanged.
    """
    q = df.groupBy(*group_cols).agg(
        F.percentile(value_col, F.lit(lower)).alias("_q_lo"),
        F.percentile(value_col, F.lit(upper)).alias("_q_hi"),
    )
    clipped = F.least(F.greatest(F.col(value_col), F.col("_q_lo")), F.col("_q_hi"))
    return (
        df.join(F.broadcast(q), group_cols)
        .withColumn("_clipped", clipped)
        .drop("_q_lo", "_q_hi")
    )
