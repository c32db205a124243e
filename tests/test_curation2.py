"""Unit tests for the round-2 continuation operators: PageRank,
weighted sampling, winsorization, per-dimension scaling, BM25, and
the cross-split leakage expression. Value-level oracle parity runs in
tools/check_correctness.py; these pin semantics on hand-built inputs
where the right answer is computable by hand (or numpy)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flytemosaic_spark.operators.graph import pagerank
from flytemosaic_spark.operators.quality import winsorize
from flytemosaic_spark.operators.sampling import split_assign, split_label, weighted_sample
from flytemosaic_spark.operators.similarity import standard_scale_long
from flytemosaic_spark.operators.text import bm25_scores


# ---------------------------------------------------------------- pagerank
def _numpy_pagerank(edges, iterations=3, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = {s: sum(1 for a, _ in edges if a == s) for s, _ in edges}
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1.0 - d) / n)
        for s, t in edges:
            nxt[idx[t]] += d * r[idx[s]] / out_deg[s]
        # mirror the operator's 1e-10 half-up per-iteration rounding
        r = np.floor(nxt * 1e10 + 0.5) / 1e10
    return {node: r[idx[node]] for node in nodes}


def test_pagerank_matches_numpy_reference(spark):
    # symmetric triangle + a pendant pair: hand-checkable, no dangling
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (3, 4), (4, 3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["node"]: r["pagerank"] for r in pagerank(df).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-9)


def test_pagerank_mass_is_conserved(spark):
    edges = [(a, b) for a in range(6) for b in range(6) if a != b]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    total = sum(r["pagerank"] for r in pagerank(df, iterations=2).collect())
    assert total == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------- weighted sample
def test_weighted_sample_extremes_and_determinism(spark):
    df = spark.range(0, 2000).withColumn("w1", F.lit(1.0)).withColumn(
        "w0", F.lit(0.0)
    )
    assert weighted_sample(df, "id", F.col("w1")).count() == 2000
    assert weighted_sample(df, "id", F.col("w0")).count() == 0
    half_a = {r["id"] for r in weighted_sample(df, "id", F.lit(0.5)).collect()}
    half_b = {r["id"] for r in weighted_sample(df, "id", F.lit(0.5)).collect()}
    assert half_a == half_b  # deterministic, retry-stable
    assert 800 < len(half_a) < 1200  # ~Binomial(2000, .5)


def test_weighted_sample_rate_tracks_weight(spark):
    df = spark.range(0, 4000).withColumn(
        "w", F.when(F.col("id") < 2000, 0.25).otherwise(0.75)
    )
    kept = weighted_sample(df, "id", F.col("w")).groupBy(
        (F.col("id") < 2000).alias("lo")
    ).count().collect()
    rates = {r["lo"]: r["count"] / 2000 for r in kept}
    assert rates[True] == pytest.approx(0.25, abs=0.05)
    assert rates[False] == pytest.approx(0.75, abs=0.05)


def test_split_label_matches_split_assign(spark):
    df = spark.range(0, 500)
    via_assign = split_assign(df, "id").select("id", "split")
    via_label = df.select("id", split_label(F.col("id")).alias("split"))
    assert via_assign.exceptAll(via_label).count() == 0
    assert via_label.exceptAll(via_assign).count() == 0


# --------------------------------------------------------------- winsorize
def test_winsorize_clips_only_the_tails(spark):
    rows = [("g", float(v)) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, "grp string, v double")
    out = winsorize(df, "v", ["grp"], lower=0.05, upper=0.95).collect()
    clipped = sorted(r["_clipped"] for r in out)
    # exact interpolated percentiles of 1..100: p05 = 5.95, p95 = 95.05
    assert clipped[0] == pytest.approx(5.95)
    assert clipped[-1] == pytest.approx(95.05)
    # interior values untouched
    by_v = {r["v"]: r["_clipped"] for r in out}
    assert by_v[50.0] == 50.0
    # order statistics preserved (winsorizing is monotone)
    ordered = [r["_clipped"] for r in sorted(out, key=lambda r: r["v"])]
    assert ordered == sorted(ordered)


# ----------------------------------------------------------- standard scale
def test_standard_scale_moments_are_zero_one(spark):
    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(5.0, 2.0, 8).tolist()) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = standard_scale_long(df)
    stats = (
        out.groupBy("dim")
        .agg(F.avg("zval").alias("mu"), F.stddev_pop("zval").alias("sd"))
        .collect()
    )
    assert len(stats) == 8
    for r in stats:
        assert r["mu"] == pytest.approx(0.0, abs=1e-3)
        assert r["sd"] == pytest.approx(1.0, abs=1e-3)


# -------------------------------------------------------------------- bm25
def test_bm25_hand_computed_single_term(spark):
    rows = [
        (0, "cat cat cat dog"),
        (1, "dog bird fish"),
        (2, "cat mouse"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in bm25_scores(df, ["cat"]).collect()}
    assert set(out) == {0, 2}  # doc 1 has no query term
    # N=3, df(cat)=2, idf = ln(1 + (3-2+0.5)/(2+0.5))
    idf = math.log(1 + 1.5 / 2.5)
    avgdl = 3.0  # (4+3+2)/3
    k1, b = 1.2, 0.75

    def score(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[0]["bm25"] == pytest.approx(score(3, 4), abs=1e-3)
    assert out[2]["bm25"] == pytest.approx(score(1, 2), abs=1e-3)
    assert out[0]["n_terms_hit"] == 1
    # saturation: tripled tf must score higher, but sublinearly
    assert out[0]["bm25"] < 3 * out[2]["bm25"]
    assert out[0]["bm25"] > out[2]["bm25"]
