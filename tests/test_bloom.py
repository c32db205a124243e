"""Bloom pre-filter anti-join: equivalence with the plain anti-join,
no-false-negative guarantee, and actual pruning effectiveness."""

from __future__ import annotations

from pyspark.sql import functions as F

from flytemosaic_spark.operators.bloom import (
    bloom_anti_join,
    build_bloom,
    might_contain,
)


def test_no_false_negatives(spark):
    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    words = build_bloom(keys, "k", m_bits=1 << 16)
    # every inserted key must pass the filter
    misses = keys.where(~might_contain(F.col("k"), words, 1 << 16)).count()
    assert misses == 0


def test_false_positive_rate_is_small(spark):
    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    m = 1 << 16  # ~13 bits/key at k=3 -> ~1.5% theoretical FP
    words = build_bloom(keys, "k", m_bits=m)
    probe = spark.range(100000, 120000)  # disjoint from inserted keys
    fp = probe.where(might_contain(F.col("id"), words, m)).count()
    assert fp / 20000 < 0.05


def test_bloom_anti_join_equals_plain_anti_join(spark, sf_dir):
    from flytemosaic_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    got = bloom_anti_join(orders, lineitem, "o_orderkey", "l_orderkey").select(
        "o_orderkey"
    )
    want = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey, "left_anti"
    ).select("o_orderkey")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_definite_misses_bypass_the_join(spark):
    """The filter must actually prune: with disjoint key ranges nearly
    everything is a definite miss, so the exact-join input is tiny."""
    big = spark.range(0, 10000).select(F.col("id").alias("key"))
    existing = spark.range(50000, 51000).select(F.col("id").alias("k"))
    words = build_bloom(existing, "k", m_bits=1 << 16)
    pruned = big.where(~might_contain(F.col("key"), words, 1 << 16)).count()
    assert pruned > 9000  # almost all rows never see the join
    out = bloom_anti_join(big, existing, "key", "k")
    assert out.count() == 10000  # disjoint -> everything survives
