"""Bucketed co-location: a join and an aggregation on the bucket key
must produce NO shuffle Exchange in the physical plan, and results
must match the unbucketed plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flytemosaic_spark.sources.bucketed import (
    plan_has_exchange,
    read_table,
    write_bucketed,
)
from flytemosaic_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("warehouse")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "orders_b", "o_orderkey", 8, str(base / "orders_b"))
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
        str(base / "lineitem_b"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    o = read_table(spark, "orders_b")
    l = read_table(spark, "lineitem_b")
    joined = o.join(l, "o_orderkey").groupBy("o_orderpriority").count()
    # defeat broadcast to prove co-location (not broadcast) removes the
    # shuffle of the join itself
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j2 = o.join(l.hint("merge"), "o_orderkey")
        assert not plan_has_exchange(j2)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert joined.count() > 0


def test_bucketed_results_match_plain(spark, sf_dir, bucketed):
    o = read_table(spark, "orders_b")
    l = read_table(spark, "lineitem_b")
    got = (
        o.join(l, "o_orderkey")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
        .collect()[0]
    )
    op = load_table(spark, sf_dir, "orders")
    lp = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    want = (
        op.join(lp, "o_orderkey")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
        .collect()[0]
    )
    assert (got.n, got.q) == (want.n, want.q)


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    l = read_table(spark, "lineitem_b")
    agg = l.groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert not plan_has_exchange(agg)
