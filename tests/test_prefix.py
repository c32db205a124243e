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


def test_distributed_row_number_matches_global_window(spark):
    from flytemosaic_spark.plans.prefix import distributed_row_number

    orders = load_table(spark, SF001, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {
        r.o_orderkey: r.rn
        for r in orders.withColumn(
            "rn", F.row_number().over(w).cast("bigint")
        ).collect()
    }
    got = {
        r.o_orderkey: r.rn
        for r in distributed_row_number(
            orders, ("o_totalprice", "o_orderkey"), n_buckets=16
        ).collect()
    }
    assert got == want


def test_ntile_closed_form_matches_window(spark):
    from flytemosaic_spark.plans.prefix import (
        distributed_row_number,
        ntile_from_rn,
    )

    for n_tiles in (3, 7, 10):
        orders = load_table(spark, SF001, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        w = Window.orderBy("o_totalprice", "o_orderkey")
        want = {
            r.o_orderkey: r.t
            for r in orders.withColumn("t", F.ntile(n_tiles).over(w)).collect()
        }
        rn = distributed_row_number(
            orders, ("o_totalprice", "o_orderkey"), n_buckets=8
        )
        n_df = orders.agg(F.count("*").alias("_N"))
        got = {
            r.o_orderkey: r.t
            for r in rn.crossJoin(F.broadcast(n_df))
            .select(
                "o_orderkey",
                ntile_from_rn(F.col("rn"), F.col("_N"), n_tiles)
                .cast("int")
                .alias("t"),
            )
            .collect()
        }
        assert got == want


def test_ntile_closed_form_fewer_rows_than_tiles(spark):
    # N < n_tiles: the SQL standard puts row k in tile k
    from flytemosaic_spark.plans.prefix import ntile_from_rn

    df = spark.range(1, 4).select(
        F.col("id").cast("bigint").alias("rn"), F.lit(3).cast("bigint").alias("n")
    )
    got = sorted(
        (r.rn, r.t)
        for r in df.select(
            "rn", ntile_from_rn(F.col("rn"), F.col("n"), 10).cast("int").alias("t")
        ).collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_multi_value_cumsum_equals_two_single_passes(spark):
    import numpy as np

    from flytemosaic_spark.plans.prefix import distributed_cumsum

    rng = np.random.default_rng(17)
    rows = [
        (int(t), int(rng.integers(0, 100)), int(rng.integers(-50, 50)))
        for t in rng.permutation(5000)
    ]
    df = spark.createDataFrame(rows, "t long, a long, b long")
    multi = {
        r.t: (r.ca, r.cb)
        for r in distributed_cumsum(
            df, "t", ["a", "b"], out_col=["ca", "cb"]
        ).collect()
    }
    sa = {
        r.t: r.ca
        for r in distributed_cumsum(df, "t", "a", out_col="ca").collect()
    }
    sb = {
        r.t: r.cb
        for r in distributed_cumsum(df, "t", "b", out_col="cb").collect()
    }
    assert len(multi) == 5000
    for t, (ca, cb) in multi.items():
        assert (ca, cb) == (sa[t], sb[t])


def test_multi_value_cumsum_mismatched_lists_raise(spark):
    import pytest

    from flytemosaic_spark.plans.prefix import distributed_cumsum

    df = spark.createDataFrame([(1, 2)], "t long, a long")
    with pytest.raises(ValueError, match="align"):
        distributed_cumsum(df, "t", ["a"], out_col=["x", "y"])
