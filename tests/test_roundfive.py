"""Unit tests for the round-5 operators: label propagation semantics,
int8 quantization error bound, semdedup partition invariants, and
packing-efficiency bounds. The full-value correctness of every probe
is oracle-checked by the driver gate; these tests pin the semantic
properties the oracle cannot express (hand-built graphs, error
bounds, invariants under permutation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flytemosaic_spark.operators.graph import label_propagation
from flytemosaic_spark.probes.registry import all_probes

SF001 = "/root/testdata/sf0.01"


def test_lpa_majority_wins(spark):
    # hub node 5 (init label 5) is connected to three label-1 nodes
    # (11, 21, 31) and one label-2 node (12): majority label 1 wins.
    und = [(5, 11), (5, 21), (5, 31), (5, 12), (11, 21)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], ["src", "dst"]
    )
    out = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=1, init_mod=10).collect()
    }
    assert out[5] == 1
    # 11's neighbors are 5 (label 5) and 21 (label 1): tie -> min label 1
    assert out[11] == 1
    # 12's only neighbor is 5 (label 5)
    assert out[12] == 5


def test_lpa_tie_breaks_to_smallest_label(spark):
    und = [(100, 11), (100, 22)]  # neighbor labels {1, 2}, one vote each
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], ["src", "dst"]
    )
    out = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=1, init_mod=10).collect()
    }
    assert out[100] == 1


def test_lpa_deterministic_across_runs(spark):
    edges = spark.range(0, 200).select(
        (F.col("id") % 50).alias("src"), ((F.col("id") * 7) % 50).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    a = sorted(label_propagation(edges, iterations=2).collect())
    b = sorted(label_propagation(edges, iterations=2).collect())
    assert a == b


def test_int8_quant_error_bounded_by_half_step(spark):
    # reconstruction error of round-to-nearest on a 255-step grid is
    # at most step/2 (+ the 1e-9 reporting grain)
    probe = all_probes()["x134_int8_quantization"]
    rows = probe.fn(spark, SF001).collect()
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    mm = (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy((F.col("pos") + 1).alias("dim"))
        .agg((F.max("col") - F.min("col")).alias("rng"))
    )
    rng = {r["dim"]: r["rng"] for r in mm.collect()}
    assert len(rows) == 64
    for r in rows:
        half_step = rng[r["dim"]] / 255.0 / 2.0
        assert r["max_abs_err_u"] <= half_step + 1e-6
        assert 0.0 <= r["avg_abs_err_u"] <= r["max_abs_err_u"]


def test_semdedup_partition_invariants(spark):
    probe = all_probes()["x129_semdedup"]
    rows = probe.fn(spark, SF001).collect()
    # every vector lands in exactly one cluster
    assert sum(r["n_members"] for r in rows) == 500
    for r in rows:
        # can never drop more members than exist beyond the keeper
        assert 0 <= r["n_dropped"] <= max(r["n_members"] - 1, 0)
        assert r["n_dup_pairs"] >= r["n_dropped"]


def test_packing_efficiency_bounds(spark):
    probe = all_probes()["x135_packing_efficiency"]
    rows = probe.fn(spark, SF001).collect()
    assert {r["bucket"] for r in rows} == set(range(8))
    for r in rows:
        assert 0.0 < r["fill_ratio"] <= 1.0
        # n_packs is exactly ceil(total/256)
        assert r["n_packs"] == -(-r["total_tokens"] // 256)
