"""Unit tests for the round-7 operators on hand fixtures — the oracle
gate covers the real-corpus path; these pin the semantics: k-core
equivalence vs brute-force peeling, split-gain math vs numpy,
k-anonymity on a constructed table, Laplace-noise distribution and
determinism, MaxSim vs a numpy reference, KMV similarity accuracy,
MRR/MAP on a hand-ranked fixture, and KS on known distributions.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flytemosaic_spark.operators.drift import ks_two_sample
from flytemosaic_spark.operators.graph import kcore
from flytemosaic_spark.operators.metrics import mrr_map_at_k
from flytemosaic_spark.operators.privacy import dp_noisy_counts, k_anonymity_report
from flytemosaic_spark.operators.sketch import kmv_set_similarity
from flytemosaic_spark.operators.similarity import maxsim_topk
from flytemosaic_spark.operators.trees import best_splits


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _kcore_brute(pairs, k):
    """Reference peeling in plain Python."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        deg: dict[int, int] = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(u, v) for u, v in edges if u in keep and v in keep}
        if nxt == edges:
            return deg if all(d >= k for d in deg.values()) else {
                n: d for n, d in deg.items() if n in keep
            }
        edges = nxt


class TestKcore:
    def test_matches_brute_force_peeling(self, spark):
        rng = np.random.default_rng(5)
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, 40, size=(150, 2)).tolist()
        ]
        for k in (2, 3, 4):
            got = {
                (r.node, r.deg) for r in kcore(_edges(spark, pairs), k=k).collect()
            }
            want = set(_kcore_brute(pairs, k).items())
            assert got == want, f"k={k}"

    def test_triangle_plus_pendant(self, spark):
        # triangle 1-2-3 with a pendant 4: the 2-core is exactly the triangle
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
        got = {(r.node, r.deg) for r in kcore(_edges(spark, pairs), k=2).collect()}
        assert got == {(1, 2), (2, 2), (3, 2)}

    def test_path_graph_empty_2core(self, spark):
        pairs = [(i, i + 1) for i in range(6)]
        assert kcore(_edges(spark, pairs), k=2).count() == 0

    def test_duplicate_and_directed_edges_canonicalized(self, spark):
        # same triangle given as duplicated directed edges + a self-loop
        pairs = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (2, 2)]
        got = {(r.node, r.deg) for r in kcore(_edges(spark, pairs), k=2).collect()}
        assert got == {(1, 2), (2, 2), (3, 2)}

    def test_nonconvergence_raises(self, spark):
        # a long path peels one layer per round at k=2: max_iter=1 on a
        # 6-path cannot converge
        pairs = [(i, i + 1) for i in range(6)]
        with pytest.raises(RuntimeError, match="no fixpoint"):
            kcore(_edges(spark, pairs), k=2, max_iter=1)


class TestBestSplits:
    def test_matches_numpy_reference(self, spark):
        rng = np.random.default_rng(11)
        bins = rng.integers(0, 5, size=200)
        y = (bins * 3 + rng.integers(0, 4, size=200)).astype(float)
        df = spark.createDataFrame(
            [(int(b), float(v)) for b, v in zip(bins, y)], "b long, y double"
        )
        out = best_splits(df, {"f": F.col("b")}, F.col("y")).collect()
        assert len(out) == 1
        row = out[0]

        def gain_at(cut):
            left, right = y[bins <= cut], y[bins > cut]
            if len(right) == 0:
                return None
            return (
                left.sum() ** 2 / len(left)
                + right.sum() ** 2 / len(right)
                - y.sum() ** 2 / len(y)
            )
        gains = {c: gain_at(c) for c in range(5) if gain_at(c) is not None}
        best_cut = max(gains, key=lambda c: (gains[c], -c))
        assert row.feature == "f"
        assert row.split_bin == best_cut
        assert row.gain == pytest.approx(gains[best_cut], abs=1e-3)
        assert row.n_left == int((bins <= best_cut).sum())
        assert row.n_right == int((bins > best_cut).sum())

    def test_perfect_split_dominates(self, spark):
        # y jumps at bin boundary 1|2: the gain argmax must be bin 1
        rows = [(b, 0.0) for b in (0, 1) for _ in range(50)] + [
            (b, 10.0) for b in (2, 3) for _ in range(50)
        ]
        df = spark.createDataFrame(rows, "b long, y double")
        row = best_splits(df, {"f": F.col("b")}, F.col("y")).collect()[0]
        assert row.split_bin == 1
        assert row.n_left == 100 and row.n_right == 100

    def test_single_bin_feature_drops_out(self, spark):
        df = spark.createDataFrame([(1, 2.0), (1, 3.0)], "b long, y double")
        assert best_splits(df, {"f": F.col("b")}, F.col("y")).count() == 0


class TestKAnonymity:
    def test_hand_computed(self, spark):
        # groups: (a: 3 rows), (b: 1 row), (c: 6 rows)
        rows = [("a",)] * 3 + [("b",)] * 1 + [("c",)] * 6
        df = spark.createDataFrame(rows, "qi string")
        out = {r.k: r for r in k_anonymity_report(df, ["qi"], [2, 5]).collect()}
        assert out[2].n_groups == 3
        assert out[2].n_violating_groups == 1  # only b
        assert out[2].rows_at_risk == 1
        assert out[2].suppression_rate == pytest.approx(0.1)
        assert out[5].n_violating_groups == 2  # a and b
        assert out[5].rows_at_risk == 4
        assert out[5].suppression_rate == pytest.approx(0.4)

    def test_fully_anonymous(self, spark):
        df = spark.createDataFrame([("x",)] * 10, "qi string")
        row = k_anonymity_report(df, ["qi"], [5]).collect()[0]
        assert row.n_violating_groups == 0 and row.rows_at_risk == 0


class TestDpNoise:
    def test_deterministic_and_unbiased_ish(self, spark):
        df = spark.createDataFrame(
            [(f"g{i}", j) for i in range(400) for j in range(3)], "g string, x long"
        )
        out1 = {r.g: r.noisy_n for r in dp_noisy_counts(df, ["g"], 1.0).collect()}
        out2 = {r.g: r.noisy_n for r in dp_noisy_counts(df, ["g"], 1.0).collect()}
        assert out1 == out2  # reproducible
        noises = np.array([v - 3.0 for v in out1.values()])
        # Laplace(0, 1): mean ~0, E|x| = 1
        assert abs(noises.mean()) < 0.2
        assert abs(np.abs(noises).mean() - 1.0) < 0.2

    def test_epsilon_scales_noise(self, spark):
        df = spark.createDataFrame(
            [(f"g{i}", 0) for i in range(200)], "g string, x long"
        )
        wide = [r.noisy_n - 1.0 for r in dp_noisy_counts(df, ["g"], 0.5).collect()]
        narrow = [r.noisy_n - 1.0 for r in dp_noisy_counts(df, ["g"], 5.0).collect()]
        assert np.abs(wide).mean() > np.abs(narrow).mean() * 2


class TestMaxSim:
    def test_matches_numpy(self, spark):
        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((12, 16)).astype(np.float64)
        df = spark.createDataFrame(
            [(i, vecs[i].tolist()) for i in range(12)],
            "vec_id long, embedding array<double>",
        )
        out = maxsim_topk(
            df, df.where(F.col("vec_id") < 2), k=3, n_tokens=4
        ).collect()
        toks = vecs.reshape(12, 4, 4)
        for q in range(2):
            dots = np.einsum("td,ncd->ntc", toks[q], toks)  # (12, 4q, 4d)
            # the operator rounds each token dot (and the sum) at 1e-4;
            # with random data no value sits at a rounding boundary, so
            # plain np.round is an equivalent reference
            scores = np.round(np.round(dots, 4).max(axis=2).sum(axis=1), 4)
            order = [
                n for n in sorted(range(12), key=lambda n: (-scores[n], n))
                if n != q
            ][:3]
            got = sorted(
                [(r.rank, r.doc_id) for r in out if r.q_id == q]
            )
            assert [doc for _, doc in got] == order

    def test_self_similarity_excluded(self, spark):
        rng = np.random.default_rng(4)
        vecs = rng.standard_normal((6, 8))
        df = spark.createDataFrame(
            [(i, vecs[i].tolist()) for i in range(6)],
            "vec_id long, embedding array<double>",
        )
        out = maxsim_topk(df, df, k=2, n_tokens=2).collect()
        assert all(r.q_id != r.doc_id for r in out)


class TestKmvSetSimilarity:
    def test_estimates_track_exact(self, spark):
        # side A: values 0..999, side B: 500..1499 — Jaccard = 1/3
        rows = [(v, "A") for v in range(1000)] + [
            (v, "B") for v in range(500, 1500)
        ]
        df = spark.createDataFrame(rows, "v long, s string")
        row = kmv_set_similarity(df, "v", "s", "A", "B", k=256).collect()[0]
        assert row.n_distinct_a == 1000 and row.n_distinct_b == 1000
        assert row.jaccard_exact == pytest.approx(1 / 3, abs=1e-4)
        # KMV with k=256 over 1500 distinct: ~1/sqrt(k) relative error
        assert row.jaccard_est == pytest.approx(1 / 3, rel=0.25)
        assert row.union_est == pytest.approx(1500, rel=0.2)
        assert row.inter_est == pytest.approx(500, rel=0.35)

    def test_small_sets_exact(self, spark):
        rows = [(v, "A") for v in range(20)] + [(v, "B") for v in range(10, 30)]
        df = spark.createDataFrame(rows, "v long, s string")
        row = kmv_set_similarity(df, "v", "s", "A", "B", k=64).collect()[0]
        # below k the sketch degenerates to the truth
        assert row.jaccard_est == pytest.approx(10 / 30, abs=1e-6)
        assert row.union_est == pytest.approx(30.0)

    def test_partitioning_invariant(self, spark):
        # the bounded two-level sketch (per-partition top-k, then
        # merge) must give the SAME minima and EXACT distinct counts
        # at any physical partitioning — and duplicates must not
        # inflate the distinct counts
        rows = [(v % 700, "A") for v in range(2100)] + [
            (v % 900, "B") for v in range(350, 2150)
        ]
        df = spark.createDataFrame(rows, "v long, s string")
        one = kmv_set_similarity(
            df.coalesce(1), "v", "s", "A", "B", k=128
        ).collect()[0]
        many = kmv_set_similarity(
            df.repartition(13), "v", "s", "A", "B", k=128
        ).collect()[0]
        assert one == many
        assert one.n_distinct_a == 700 and one.n_distinct_b == 900


class TestMrrMap:
    def test_hand_ranked(self, spark):
        # q1: rel at ranks 1,3 of 3 (n_relevant 2) -> RR 1, AP = (1/1 + 2/3)/2
        # q2: rel at rank 2 only (n_relevant 1)    -> RR 1/2, AP = (1/2)/1
        rows = [
            (1, 1, 1, 2), (1, 2, 0, 2), (1, 3, 1, 2),
            (2, 1, 0, 1), (2, 2, 1, 1), (2, 3, 0, 1),
        ]
        df = spark.createDataFrame(rows, "q_id long, rank long, rel int, n_relevant long")
        row = mrr_map_at_k(df, k=3).collect()[0]
        assert row.n_queries == 2
        assert row.mrr == pytest.approx((1.0 + 0.5) / 2, abs=1e-6)
        ap1 = (1.0 + 2.0 / 3.0) / 2.0
        ap2 = 0.5
        assert row.map_at_k == pytest.approx((ap1 + ap2) / 2, abs=1e-6)

    def test_no_relevant_query_scores_zero(self, spark):
        rows = [(1, 1, 0, 0), (1, 2, 0, 0)]
        df = spark.createDataFrame(rows, "q_id long, rank long, rel int, n_relevant long")
        row = mrr_map_at_k(df, k=2).collect()[0]
        assert row.mrr == 0.0 and row.map_at_k == 0.0


class TestKs:
    def test_identical_distributions(self, spark):
        rows = [(float(v % 50), "a") for v in range(500)] + [
            (float(v % 50), "b") for v in range(500)
        ]
        df = spark.createDataFrame(rows, "value double, side string")
        row = ks_two_sample(df, "value", "side", "a", "b").collect()[0]
        assert row.d_stat == 0.0 and row.drifted == 0

    def test_disjoint_distributions(self, spark):
        rows = [(float(v), "a") for v in range(100)] + [
            (float(v + 1000), "b") for v in range(100)
        ]
        df = spark.createDataFrame(rows, "value double, side string")
        row = ks_two_sample(df, "value", "side", "a", "b").collect()[0]
        assert row.d_stat == 1.0 and row.drifted == 1

    def test_matches_scipy_formula_on_shifted(self, spark):
        rng = np.random.default_rng(9)
        a = rng.normal(0, 1, 300)
        b = rng.normal(0.5, 1, 250)
        rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
        df = spark.createDataFrame(rows, "value double, side string")
        row = ks_two_sample(df, "value", "side", "a", "b").collect()[0]
        # reference: classic two-sample KS on pooled sample points
        xs = np.sort(np.concatenate([a, b]))
        fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
        want = np.abs(fa - fb).max()
        assert row.d_stat == pytest.approx(want, abs=1e-6)
        assert row.n_a == 300 and row.n_b == 250
        crit = 1.358 * math.sqrt((300 + 250) / (300 * 250))
        assert row.d_crit_05 == pytest.approx(crit, abs=1e-6)
