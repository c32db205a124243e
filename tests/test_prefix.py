"""Equivalence + plan tests for the distributed prefix sum
(plans/prefix.py) against the single-partition global-window cumsum."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flytemosaic_spark.plans.prefix import distributed_cumsum
from flytemosaic_spark.sources.tables import load_table

SF001 = "/root/testdata/sf0.01"


def _global_cumsum(df, order_col, value_col):
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("cumsum", F.sum(value_col).over(w))


def test_integer_cumsum_is_bit_identical(spark):
    """On integer values the two-pass result equals the global window
    exactly, row for row."""
    orders = load_table(spark, SF001, "orders").select(
        "o_orderkey", (F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    want = {
        r.o_orderkey: r.cumsum
        for r in _global_cumsum(orders, "o_orderkey", "cents").collect()
    }
    got = {
        r.o_orderkey: r.cumsum
        for r in distributed_cumsum(
            orders, "o_orderkey", "cents", n_buckets=16
        ).collect()
    }
    assert got == want


def test_float_cumsum_matches_within_tolerance(spark):
    orders = load_table(spark, SF001, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    want = {
        r.o_orderkey: r.cumsum
        for r in _global_cumsum(orders, "o_orderkey", "o_totalprice").collect()
    }
    got = distributed_cumsum(
        orders, "o_orderkey", "o_totalprice", n_buckets=16
    ).collect()
    for r in got:
        assert abs(r.cumsum - want[r.o_orderkey]) <= 1e-6 * max(
            1.0, abs(want[r.o_orderkey])
        )


def test_no_single_partition_global_sort(spark):
    """The distributed plan must not contain a global (non-partitioned)
    Sort+Window: every Window partitions by the bucket column."""
    import contextlib
    import io

    orders = load_table(spark, SF001, "orders").select(
        "o_orderkey", (F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    df = distributed_cumsum(orders, "o_orderkey", "cents", n_buckets=16)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    # the only SinglePartition exchange allowed is the metadata-scale
    # offsets aggregation (n_buckets rows), which feeds a broadcast
    for line in plan.splitlines():
        if "Sort" in line and "_bucket" not in line and "ASC" in line:
            # global-order sorts must be over the tiny offsets side only
            assert "_t" in line or "_off" in line or "_bucket" in plan
