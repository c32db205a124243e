"""Quantile-sketch contracts: bounded error vs the exact percentile,
and bit-exact merge (sketching halves with a shared bin frame, then
merging, equals sketching everything)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flytemosaic_spark.operators.qsketch import (
    quantile_sketch_estimate,
    quantile_sketch_merge,
    quantile_sketch_state,
)
from flytemosaic_spark.sources.tables import load_table

SF001 = "/root/testdata/sf0.01"
BINS = 128


def test_estimate_within_one_bin_of_exact(spark):
    li = load_table(spark, SF001, "lineitem")
    st = quantile_sketch_state(li, "l_extendedprice", ["l_returnflag"], bins=BINS)
    est = {
        r.l_returnflag: r.q_est
        for r in quantile_sketch_estimate(st, ["l_returnflag"], 0.5).collect()
    }
    exact = {
        r.l_returnflag: (r.med, r.mn, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("med"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    for flag, (med, mn, mx) in exact.items():
        bin_w = (mx - mn) / BINS
        assert abs(est[flag] - med) <= bin_w, (flag, est[flag], med, bin_w)


def test_merge_equals_direct_bit_exact(spark):
    li = load_table(spark, SF001, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.min(F.col("l_extendedprice").cast("double")).alias("mn"),
        F.max(F.col("l_extendedprice").cast("double")).alias("mx"),
    )
    cut = F.lit("1997-06-01").cast("timestamp")
    sa = quantile_sketch_state(
        li.where(F.col("l_shipdate") < cut),
        "l_extendedprice",
        ["l_returnflag"],
        bins=BINS,
        bounds=bounds,
    )
    sb = quantile_sketch_state(
        li.where(F.col("l_shipdate") >= cut),
        "l_extendedprice",
        ["l_returnflag"],
        bins=BINS,
        bounds=bounds,
    )
    merged = quantile_sketch_merge(sa, sb, ["l_returnflag"])
    direct = quantile_sketch_state(
        li, "l_extendedprice", ["l_returnflag"], bins=BINS, bounds=bounds
    )
    got = {r.l_returnflag: (r.mn, r.mx, r.counts) for r in merged.collect()}
    want = {r.l_returnflag: (r.mn, r.mx, r.counts) for r in direct.collect()}
    assert got == want
