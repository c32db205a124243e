"""Round-10 operators: exact isotonic calibration (minimax == PAVA)
and covariate-shift importance weights."""

from __future__ import annotations

import numpy as np
import pytest

from flytemosaic_spark.operators.linear import quantile_reg_gd
from flytemosaic_spark.operators.metrics import isotonic_fit
from flytemosaic_spark.operators.sampling import importance_weights


def _pava(y, w):
    """Sequential pool-adjacent-violators reference."""
    stack = []  # (sum, weight, n_buckets)
    for yi, wi in zip(y, w):
        cs, cw, cn = yi * wi, wi, 1
        while stack and stack[-1][0] / stack[-1][1] >= cs / cw:
            ps, pw, pn = stack.pop()
            cs += ps
            cw += pw
            cn += pn
        stack.append((cs, cw, cn))
    out = []
    for cs, cw, cn in stack:
        out.extend([cs / cw] * cn)
    return out


class TestIsotonicFit:
    def test_matches_sequential_pava(self, spark):
        rng = np.random.default_rng(7)
        rows = []
        for _ in range(4000):
            score = float(rng.random())
            p = min(1.0, max(0.0, score * 0.8 + rng.normal(0, 0.2)))
            rows.append((score, int(rng.random() < p)))
        df = spark.createDataFrame(rows, "score double, label int")
        got = isotonic_fit(df, "score", "label", n_buckets=100).collect()

        agg: dict[int, list[int]] = {}
        for s_, l_ in rows:
            b = int(np.floor(s_ * 100 + 0.5))
            agg.setdefault(b, [0, 0])
            agg[b][0] += l_
            agg[b][1] += 1
        bs = sorted(agg)
        ref = _pava(
            [agg[b][0] / agg[b][1] for b in bs], [agg[b][1] for b in bs]
        )
        ref_map = dict(zip(bs, ref))
        assert len(got) == len(bs)
        for r in got:
            assert r.iso_rate == pytest.approx(ref_map[r.bucket], abs=1e-6)

    def test_monotone_and_pools_violation(self, spark):
        # rates 0.2, 0.8, 0.4 -> middle pair pools to (0.8+0.4)/2 = 0.6
        rows = (
            [(0.0, 1)] * 2 + [(0.0, 0)] * 8
            + [(0.5, 1)] * 8 + [(0.5, 0)] * 2
            + [(1.0, 1)] * 4 + [(1.0, 0)] * 6
        )
        df = spark.createDataFrame(rows, "score double, label int")
        got = {
            r.bucket: r
            for r in isotonic_fit(df, "score", "label", n_buckets=2).collect()
        }
        assert got[0].iso_rate == pytest.approx(0.2, abs=1e-6)
        assert got[1].iso_rate == pytest.approx(0.6, abs=1e-6)
        assert got[2].iso_rate == pytest.approx(0.6, abs=1e-6)
        assert got[1].rate == pytest.approx(0.8, abs=1e-6)

    def test_already_monotone_is_identity(self, spark):
        rows = [(b / 4.0, lab) for b in range(5) for lab in [1] * b + [0] * (5 - b)]
        df = spark.createDataFrame(rows, "score double, label int")
        for r in isotonic_fit(df, "score", "label", n_buckets=4).collect():
            assert r.iso_rate == pytest.approx(r.rate, abs=1e-6)


class TestImportanceWeights:
    def test_hand_computed(self, spark):
        rows = (
            [("a", "S")] * 30 + [("a", "T")] * 10
            + [("b", "S")] * 10 + [("b", "T")] * 30
        )
        df = spark.createDataFrame(rows, "c string, s string")
        got = {
            r.category: r
            for r in importance_weights(
                df, "c", "s", "S", "T", alpha=1.0, clip=10.0
            ).collect()
        }
        # K=2, Ns=Nt=40: w(a) = (11/42)/(31/42) = 11/31
        assert got["a"].weight == pytest.approx(11 / 31, abs=1e-6)
        assert got["b"].weight == pytest.approx(31 / 11, abs=1e-6)
        assert got["a"].n_source == 30 and got["a"].n_target == 10

    def test_clipping_bounds_unseen_category(self, spark):
        rows = [("only_t", "T")] * 500 + [("both", "S")] * 500 + [
            ("both", "T")
        ] * 5
        df = spark.createDataFrame(rows, "c string, s string")
        got = {
            r.category: r.weight
            for r in importance_weights(
                df, "c", "s", "S", "T", alpha=1.0, clip=10.0
            ).collect()
        }
        # never in source -> ratio explodes -> clipped to 10
        assert got["only_t"] == pytest.approx(10.0, abs=1e-6)
        assert 0.1 <= got["both"] <= 10.0

    def test_weighted_target_reconstruction(self, spark):
        # reweighting the source histogram by w must move it toward the
        # target mix: sum_c n_source(c) * w(c) proportions ~ target
        rows = (
            [("x", "S")] * 80 + [("y", "S")] * 20
            + [("x", "T")] * 30 + [("y", "T")] * 70
        )
        df = spark.createDataFrame(rows, "c string, s string")
        got = {
            r.category: r
            for r in importance_weights(
                df, "c", "s", "S", "T", alpha=0.5, clip=100.0
            ).collect()
        }
        wx = got["x"].n_source * got["x"].weight
        wy = got["y"].n_source * got["y"].weight
        assert wy / (wx + wy) == pytest.approx(0.7, abs=0.03)


class TestQuantileRegGd:
    def _replay(self, rows, feats, tau, lr, iters):
        import math

        names = feats + ["_bias"]
        data = [tuple(r) + (1.0,) for r in rows]  # append bias
        w = {c: 0.0 for c in names}
        idx = {c: i for i, c in enumerate(feats)}
        n = len(rows)
        for _ in range(iters):
            g = {c: 0 for c in names}
            for r in data:
                y = r[len(feats)]
                z = sum(
                    w[c] * (r[idx[c]] if c in idx else 1.0) for c in names
                )
                gr = (1.0 - tau) if z >= y else -tau
                for c in names:
                    x = r[idx[c]] if c in idx else 1.0
                    g[c] += math.floor(gr * x * 1e9 + 0.5)
            for c in names:
                step = lr * ((float(g[c]) / 1e9) / n)
                w[c] = math.floor((w[c] - step) * 1e9 + 0.5) / 1e9
        return w, n

    def test_matches_python_replay(self, spark):
        import numpy as np

        from flytemosaic_spark.operators.linear import quantile_reg_gd

        rng = np.random.default_rng(23)
        rows = [
            (float(rng.integers(0, 2)), float(rng.gamma(2.0, 0.2)))
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "x double, y double")
        r = quantile_reg_gd(
            df, ["x"], label_col="y", tau=0.9, lr=0.1, iterations=4
        ).collect()[0]
        w, n = self._replay(rows, ["x"], 0.9, 0.1, 4)
        assert r.n == n
        assert r.w_x == w["x"] and r.w_bias == w["_bias"]

    def test_moves_toward_quantile(self, spark):
        # constant features, many iterations: the bias should head
        # toward the tau-quantile of y (subgradient flips sign there)
        ys = [float(v) for v in range(1, 101)]  # median 50.5
        df = spark.createDataFrame([(y,) for y in ys], "y double")
        lo = quantile_reg_gd(
            df, [], label_col="y", tau=0.5, lr=20.0, iterations=40
        ).collect()[0]
        assert 40 <= lo.w_bias <= 61  # converges near the median
        hi = quantile_reg_gd(
            df, [], label_col="y", tau=0.9, lr=20.0, iterations=40
        ).collect()[0]
        assert hi.w_bias > lo.w_bias  # higher quantile -> higher fit
