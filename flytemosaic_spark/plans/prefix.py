"""Distributed prefix sums (global cumsum without a global sort).

The reference computes chunk boundaries with a driver-side
``np.cumsum`` (/root/reference/flytemosaic/mosaics.py:287-289) — fine
at metadata scale. The relational probe (w2) mirrors it with
``sum() OVER (ORDER BY key)``, which Spark executes by sorting EVERY
row into ONE partition: correct, and the right plan at catalog scale,
but the classic scale cliff for data-sized inputs (the scale sweep
measures it as the only headline op whose cost concentrates on one
core).

:func:`distributed_cumsum` is the two-pass prefix-sum that removes
the cliff:

1. bucket rows by range of the order key (quantile boundaries from
   ``approxQuantile`` — a sketch, driver-side, metadata-sized);
2. per-bucket running sums in PARALLEL (the window partitions by
   bucket, so each bucket sorts locally);
3. bucket offsets: the per-bucket totals (n_buckets rows) get their
   own tiny exclusive cumsum and broadcast-join back.

Total cost: one exchange on bucket id + a metadata-scale window — vs
the single-partition global sort. Float caveat: summation order
inside a bucket matches the global order, but across buckets the
offset is added as one term, so float results can differ from the
single-window plan in the last ulp; on integer/decimal values the
result is bit-identical (equivalence-tested both ways).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket_expr(order_col: str, bounds: list[float]) -> Column:
    b = F.lit(0)
    for t in bounds:
        b = b + (F.col(order_col) > F.lit(t)).cast("int")
    return b


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    n_buckets: int | None = None,
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Running sum of ``value_col`` in ``order_col`` order (ties broken
    by ``tie_cols``), computed with bounded per-task state at any input
    size. ``order_col`` must be numeric (range-bucketable)."""
    spark = df.sparkSession
    n = n_buckets or spark.sparkContext.defaultParallelism
    probs = [i / n for i in range(1, n)]
    bounds = sorted(set(df.approxQuantile(order_col, probs, 0.001)))

    order = [F.col(order_col), *[F.col(c) for c in tie_cols]]
    w_local = (
        Window.partitionBy("_bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("_bucket", _bucket_expr(order_col, bounds)).withColumn(
        "_local", F.sum(value_col).over(w_local)
    )
    # exclusive cumsum over the per-bucket totals: n rows, driver scale
    w_off = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("_bucket")
        .agg(F.sum(value_col).alias("_t"))
        .select(
            "_bucket",
            F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_bucket")
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_bucket", "_local", "_off")
    )
