"""Unit tests for the round-8 operators on hand fixtures — the oracle
gate covers the real-corpus path; these pin the semantics: Naive Bayes
vs a plain-Python reference (same md5 folds, smoothing, quantization),
association-rule metrics by hand, HITS vs a numpy power iteration with
the same per-round rounding, conformal qhat/coverage on constructed
residuals, chi-square on a hand table, and SPRT crossing by replay.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flytemosaic_spark.operators.bayes import naive_bayes_confusion
from flytemosaic_spark.operators.conformal import split_conformal
from flytemosaic_spark.operators.drift import chi2_independence, sprt_bernoulli
from flytemosaic_spark.operators.graph import hits
from flytemosaic_spark.operators.recsys import association_rules


def _bucket(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()[:4]


def _q(x: float, digits: int) -> float:
    return math.floor(x * 10**digits + 0.5) / 10**digits


class TestNaiveBayes:
    def _reference(self, rows, alpha=1.0):
        """Plain-Python NB with the operator's exact split/quantization."""
        test = [r for r in rows if _bucket("nb:" + r["k"]) < "4000"]
        train = [r for r in rows if _bucket("nb:" + r["k"]) >= "4000"]
        feats = sorted(k for k in rows[0] if k not in ("k", "y"))
        n_c: dict[str, int] = {}
        cnt: dict[tuple, int] = {}
        for r in train:
            n_c[r["y"]] = n_c.get(r["y"], 0) + 1
            for f in feats:
                key = (r["y"], f, str(r[f]))
                cnt[key] = cnt.get(key, 0) + 1
        vocab = {
            f: len({str(r[f]) for r in train}) for f in feats
        }
        n_train = sum(n_c.values())
        conf: dict[tuple, int] = {}
        for r in test:
            scores = {}
            for c in n_c:
                s = _q(math.log(n_c[c] / n_train), 9)
                for f in feats:
                    c_fv = cnt.get((c, f, str(r[f])), 0)
                    s += _q(
                        math.log((c_fv + alpha) / (n_c[c] + alpha * vocab[f])), 9
                    )
                scores[c] = _q(s, 6)
            pred = min(scores, key=lambda c: (-scores[c], c))
            conf[(r["y"], pred)] = conf.get((r["y"], pred), 0) + 1
        return conf

    def test_matches_python_reference(self, spark):
        rng = np.random.default_rng(11)
        rows = []
        for i in range(400):
            y = ["a", "b", "c"][int(rng.integers(0, 3))]
            # f1 is informative (= label 80% of the time), f2 is noise
            f1 = y if rng.random() < 0.8 else ["a", "b", "c"][int(rng.integers(0, 3))]
            f2 = int(rng.integers(0, 4))
            rows.append({"k": str(i), "y": y, "f1": f1, "f2": f2})
        df = spark.createDataFrame(
            [(r["k"], r["y"], r["f1"], r["f2"]) for r in rows],
            "k string, y string, f1 string, f2 long",
        )
        got = {
            (r.actual, r.predicted): r.n
            for r in naive_bayes_confusion(
                df,
                key=F.col("k"),
                label=F.col("y"),
                features={"f1": F.col("f1"), "f2": F.col("f2")},
            ).collect()
        }
        assert got == self._reference(rows)

    def test_unseen_value_falls_back_to_smoothed_zero(self, spark):
        # value 'zz' never appears in training; scoring must not drop
        # the row — the smoothed-zero default applies
        rows = [(str(i), "a" if i % 2 else "b", "x") for i in range(40)]
        # craft a test-fold key with an unseen feature value
        test_keys = [k for k, _, _ in rows if _bucket("nb:" + k) < "4000"]
        assert test_keys
        data = [
            (k, y, "zz" if k == test_keys[0] else v) for k, y, v in rows
        ]
        df = spark.createDataFrame(data, "k string, y string, f1 string")
        out = naive_bayes_confusion(
            df, key=F.col("k"), label=F.col("y"), features={"f1": F.col("f1")}
        )
        assert sum(r.n for r in out.collect()) == len(test_keys)


class TestAssociationRules:
    def test_hand_metrics(self, spark):
        # baskets: {1,2} x3, {1,3} x1, {2,3} x1, {1} x1 -> N=6
        baskets = [
            (1, 1), (1, 2),
            (2, 1), (2, 2),
            (3, 1), (3, 2),
            (4, 1), (4, 3),
            (5, 2), (5, 3),
            (6, 1),
        ]
        df = spark.createDataFrame(baskets, "bk long, it long")
        rows = {
            (r.antecedent, r.consequent): r
            for r in association_rules(
                df, "bk", "it", min_pair_support=3, top_n=10
            ).collect()
        }
        # only the {1,2} pair has support >= 3; n_1 = 5, n_2 = 4, N = 6
        assert set(rows) == {(1, 2), (2, 1)}
        r12 = rows[(1, 2)]
        assert r12.n_ab == 3
        assert r12.support == _q(3 / 6, 6)
        assert r12.confidence == _q(3 / 5, 6)
        assert r12.lift == _q(3 * 6 / (5 * 4), 6)
        assert rows[(2, 1)].confidence == _q(3 / 4, 6)

    def test_basket_plan_equivalent_to_selfjoin(self, spark):
        rng = np.random.default_rng(17)
        rows = [
            (int(b), int(i))
            for b, i in rng.integers(0, 60, size=(500, 2)).tolist()
        ]
        df = spark.createDataFrame(rows, "bk long, it long")
        kw = dict(min_pair_support=2, top_n=100)
        sj = association_rules(df, "bk", "it", plan="selfjoin", **kw).collect()
        bk = association_rules(df, "bk", "it", plan="basket", **kw).collect()
        key = lambda r: (r.antecedent, r.consequent)  # noqa: E731
        assert sorted(map(tuple, sj), key=lambda t: t[:2]) == sorted(
            map(tuple, bk), key=lambda t: t[:2]
        )
        assert {key(r) for r in sj} == {key(r) for r in bk}

    def test_basket_distinct_semantics(self, spark):
        # the same item twice in one basket counts once
        df = spark.createDataFrame(
            [(1, 7), (1, 7), (1, 8), (2, 7), (2, 8), (3, 7), (3, 8)],
            "bk long, it long",
        )
        out = association_rules(df, "bk", "it", min_pair_support=3, top_n=5)
        r = {(x.antecedent, x.consequent): x.n_ab for x in out.collect()}
        assert r == {(7, 8): 3, (8, 7): 3}


class TestHits:
    def test_matches_numpy_power_iteration(self, spark):
        rng = np.random.default_rng(3)
        edges = {
            (int(u), int(v))
            for u, v in rng.integers(0, 12, size=(40, 2)).tolist()
        }
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        got = {
            (r.kind, r.node): r.score
            for r in hits(df, iterations=4, top_n=50).collect()
        }
        # reference with the operator's exact per-round rounding
        auths = sorted({v for _, v in edges})
        a = {v: 1.0 for v in auths}
        for _ in range(4):
            h_raw = {}
            for u, v in edges:
                if v in a:
                    h_raw[u] = h_raw.get(u, 0.0) + a[v]
            h_raw = {u: _q(x, 10) for u, x in h_raw.items()}
            nrm = sum(h_raw.values())
            h = {u: _q(x / nrm, 10) for u, x in h_raw.items()}
            a_raw = {}
            for u, v in edges:
                if u in h:
                    a_raw[v] = a_raw.get(v, 0.0) + h[u]
            a_raw = {v: _q(x, 10) for v, x in a_raw.items()}
            nrm = sum(a_raw.values())
            a = {v: _q(x / nrm, 10) for v, x in a_raw.items()}
        want = {("hub", u): _q(s, 6) for u, s in h.items()} | {
            ("authority", v): _q(s, 6) for v, s in a.items()
        }
        assert got == want
        # L1-normalized: each role sums to ~1
        for kind in ("hub", "authority"):
            np.testing.assert_allclose(
                sum(s for (k, _), s in got.items() if k == kind), 1.0, atol=1e-4
            )


class TestConformal:
    def test_perfect_predictor_gives_zero_width(self, spark):
        # y is constant per group -> every residual 0 -> qhat 0, coverage 1
        rows = [(i, "g%d" % (i % 3), float(100 * (i % 3))) for i in range(400)]
        df = spark.createDataFrame(rows, "k long, g string, y double")
        out = split_conformal(
            df, key=F.col("k"), group=F.col("g"), y=F.col("y"), alpha=0.1
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r.qhat == 0.0 and r.coverage == 1.0 and r.avg_width == 0.0
        assert r.n_train + r.n_cal + r.n_test == 400

    def test_qhat_is_the_corrected_order_statistic(self, spark):
        rng = np.random.default_rng(9)
        rows = [
            (i, "g", float(rng.normal(50.0, 10.0))) for i in range(2000)
        ]
        df = spark.createDataFrame(rows, "k long, g string, y double")
        r = split_conformal(
            df, key=F.col("k"), group=F.col("g"), y=F.col("y"), alpha=0.2
        ).collect()[0]
        # replicate: folds by md5(str(k)), pred = train mean (1e-6), qhat
        folds = {
            k: (
                "cal"
                if _bucket(str(k)) < "4000"
                else ("test" if _bucket(str(k)) < "8000" else "train")
            )
            for k, _, _ in rows
        }
        train_y = [y for k, _, y in rows if folds[k] == "train"]
        pred = _q(sum(train_y) / len(train_y), 6)
        cal = sorted(
            (_q(abs(y - pred), 6), str(k))
            for k, _, y in rows
            if folds[k] == "cal"
        )
        n_cal = len(cal)
        rank = min(math.ceil((n_cal + 1) * 0.8), n_cal)
        assert r.n_cal == n_cal
        assert r.qhat == cal[rank - 1][0]
        test_r = [
            _q(abs(y - pred), 6) for k, _, y in rows if folds[k] == "test"
        ]
        assert r.coverage == _q(
            sum(1 for x in test_r if x <= r.qhat) / len(test_r), 6
        )


class TestChi2:
    def test_hand_table(self, spark):
        # 2x2: a=(10, 20), b=(20, 10) -> chi2 = 60*(10*10-20*20)^2/(30*30*30*30)
        rows = (
            [("x", "p")] * 10 + [("x", "q")] * 20 + [("y", "p")] * 20 + [("y", "q")] * 10
        )
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi2_independence(df, "a", "b", crit_05=3.841).collect()[0]
        n = 60
        expected = 0.0
        for (na, nb, o) in [(30, 30, 10), (30, 30, 20), (30, 30, 20), (30, 30, 10)]:
            e = na * nb / n
            expected += _q((o - e) ** 2 / e, 9)
        assert r.n == 60 and r.dof == 1
        assert r.chi2 == _q(expected, 6)
        assert r.independent == 0  # chi2 = 6.667 > 3.841

    def test_observed_zero_cells_counted(self, spark):
        # (y, q) never observed -> expected > 0 must still contribute
        rows = [("x", "p")] * 5 + [("x", "q")] * 5 + [("y", "p")] * 5
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi2_independence(df, "a", "b", crit_05=3.841).collect()[0]
        # full grid: e(y,q) = 5*10/15; the (0-e)^2/e term must be in chi2
        n = 15
        cells = [(10, 10, 5), (10, 5, 5), (5, 10, 5), (5, 5, 0)]
        want = sum(_q((o - na * nb / n) ** 2 / (na * nb / n), 9) for na, nb, o in cells)
        assert r.chi2 == _q(want, 6)


class TestSprt:
    def _replay(self, xs, p0, p1, alpha, beta):
        l1 = math.log(p1 / p0)
        l0 = math.log((1 - p1) / (1 - p0))
        hi = math.log((1 - beta) / alpha)
        lo = math.log(beta / (1 - alpha))
        s = 0
        for n, x in enumerate(xs, start=1):
            s += x
            llr = s * l1 + (n - s) * l0
            if llr >= hi:
                return ("accept_h1", n, s, llr)
            if llr <= lo:
                return ("accept_h0", n, s, llr)
        return ("continue", len(xs), s, llr)

    def test_crossing_matches_replay(self, spark):
        rng = np.random.default_rng(21)
        xs = (rng.random(500) < 0.18).astype(int).tolist()
        df = spark.createDataFrame(
            [(i, bool(x)) for i, x in enumerate(xs)], "t long, x boolean"
        )
        r = sprt_bernoulli(
            df, "t", F.col("x"), p0=0.3, p1=0.2, alpha=0.05, beta=0.2
        ).collect()[0]
        dec, n, s, llr = self._replay(xs, 0.3, 0.2, 0.05, 0.2)
        assert (r.decision, r.n_obs, r.successes) == (dec, n, s)
        assert r.llr == _q(llr, 6)

    def test_no_crossing_reports_final_state(self, spark):
        # alternate successes at exactly between p0 and p1 rates over a
        # short stream: bounds are far, no decision
        xs = [1, 0, 0, 0] * 5  # p = 0.25, 20 obs
        df = spark.createDataFrame(
            [(i, bool(x)) for i, x in enumerate(xs)], "t long, x boolean"
        )
        r = sprt_bernoulli(
            df, "t", F.col("x"), p0=0.3, p1=0.2, alpha=0.01, beta=0.01
        ).collect()[0]
        dec, n, s, llr = self._replay(xs, 0.3, 0.2, 0.01, 0.01)
        assert (r.decision, r.n_obs, r.successes) == (dec, n, s)


class TestAdamicAdar:
    def test_matches_python_reference(self, spark):
        rng = np.random.default_rng(7)
        edges = {
            (int(u), int(v))
            for u, v in rng.integers(0, 15, size=(40, 2)).tolist()
            if u != v
        }
        und = {(min(u, v), max(u, v)) for u, v in edges}
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        got = {
            (r.u, r.v): r.aa_score
            for r in __import__(
                "flytemosaic_spark.operators.graph", fromlist=["adamic_adar"]
            ).adamic_adar(df, top_n=1000).collect()
        }
        adj: dict[int, set] = {}
        for u, v in und:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        want = {}
        nodes = sorted(adj)
        for i, u in enumerate(nodes):
            for v in nodes[i + 1 :]:
                if (u, v) in und:
                    continue
                common = adj[u] & adj[v]
                if not common:
                    continue
                s = sum(_q(1.0 / math.log(len(adj[w])), 9) for w in common)
                want[(u, v)] = _q(s, 6)
        assert got == want

    def test_existing_edges_excluded(self, spark):
        # triangle plus a pendant: the only predicted link closes the
        # wedge, never re-proposes an existing edge
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
        )
        from flytemosaic_spark.operators.graph import adamic_adar

        got = {(r.u, r.v) for r in adamic_adar(df, top_n=10).collect()}
        assert got == {(1, 4), (2, 4)}

    def test_max_center_degree_drops_hub_wedges(self, spark):
        # star: hub 0 adjacent to 1..5 (deg 5); every predicted pair
        # routes through the hub, so capping centers at deg 4 leaves
        # nothing, while the uncapped run predicts all C(5,2) pairs
        df = spark.createDataFrame(
            [(0, i) for i in range(1, 6)], "src long, dst long"
        )
        from flytemosaic_spark.operators.graph import adamic_adar

        full = adamic_adar(df, top_n=100).collect()
        assert len(full) == 10
        capped = adamic_adar(df, top_n=100, max_center_degree=4).collect()
        assert capped == []

    def test_cap_above_max_degree_is_exact(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
        )
        from flytemosaic_spark.operators.graph import adamic_adar

        want = adamic_adar(df, top_n=10).collect()
        got = adamic_adar(df, top_n=10, max_center_degree=1000).collect()
        assert got == want


class TestHitsGuards:
    def test_zero_iterations_raises(self, spark):
        from flytemosaic_spark.operators.graph import hits

        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError, match="iterations"):
            hits(df, iterations=0)


class TestPoissonBootstrap:
    def test_matches_python_reference(self, spark):
        from flytemosaic_spark.operators.sampling import (
            _POISSON1_CDF,
            poisson_bootstrap_ci,
        )

        rng = np.random.default_rng(13)
        rows = [(i, "g%d" % (i % 2), float(rng.normal(10, 2))) for i in range(300)]
        df = spark.createDataFrame(rows, "k long, g string, y double")
        out = {
            r.grp: r
            for r in poisson_bootstrap_ci(
                df,
                key=F.col("k"),
                group=F.col("g"),
                y=F.col("y"),
                n_replicates=16,
                ci=0.9,
            ).collect()
        }

        def uniform(k, b):
            h = hashlib.md5(f"pb:{k}:{b}".encode()).hexdigest()[:13]
            return int(h, 16) / 16**13

        def weight(k, b):
            u = uniform(k, b)
            return sum(1 for c in _POISSON1_CDF if u >= c)

        for g in ("g0", "g1"):
            grp = [(k, y) for k, gg, y in rows if gg == g]
            means = []
            for b in range(16):
                ws = [(weight(k, b), y) for k, y in grp]
                sw = sum(w for w, _ in ws)
                means.append(
                    (_q(sum(w * y for w, y in ws) / sw, 6), b)
                )
            means.sort()
            lo_rank = max(1, math.ceil(16 * 0.05))  # 1
            hi_rank = 16 + 1 - lo_rank  # 16
            assert out[g].ci_lo == means[lo_rank - 1][0]
            assert out[g].ci_hi == means[hi_rank - 1][0]
            assert out[g].n == len(grp)
            assert out[g].mean == _q(sum(y for _, y in grp) / len(grp), 6)
            # the CI brackets the point estimate
            assert out[g].ci_lo <= out[g].mean <= out[g].ci_hi

    def test_weights_mean_near_one(self, spark):
        # Poisson(1) weights should average ~1 so replicate sizes match
        from flytemosaic_spark.operators.sampling import _POISSON1_CDF

        rng = np.random.default_rng(5)
        us = rng.random(20000)
        w = np.zeros_like(us)
        for c in _POISSON1_CDF:
            w += us >= c
        assert abs(w.mean() - 1.0) < 0.02
        assert abs(w.var() - 1.0) < 0.05


class TestCuped:
    def test_matches_python_reference(self, spark):
        from flytemosaic_spark.operators.metrics import cuped_ab

        rng = np.random.default_rng(31)
        rows = []
        for i in range(500):
            x = int(rng.integers(0, 20))
            y = 50.0 * x + float(rng.normal(100, 25))  # strongly covariate-driven
            rows.append((i, x, round(y, 2)))
        df = spark.createDataFrame(rows, "k long, x long, y double")
        out = {
            r.arm: r
            for r in cuped_ab(
                df, key=F.col("k"), x=F.col("x"), y=F.col("y")
            ).collect()
        }
        # python reference with exact integer moments
        arms: dict[str, list] = {"A": [], "B": []}
        for k, x, y in rows:
            arm = (
                "A"
                if hashlib.md5(f"cuped:{k}".encode()).hexdigest()[:4] < "8000"
                else "B"
            )
            arms[arm].append((x, math.floor(y * 100 + 0.5)))
        tn = sum(len(v) for v in arms.values())
        tsx = sum(x for v in arms.values() for x, _ in v)
        tsy = sum(y for v in arms.values() for _, y in v)
        tsxy = sum(x * y for v in arms.values() for x, y in v)
        tsxx = sum(x * x for v in arms.values() for x, _ in v)
        theta = _q((tn * tsxy - tsx * tsy) / (tn * tsxx - tsx * tsx), 6)
        xbar = _q(tsx / tn, 6)
        for arm, vals in arms.items():
            n = len(vals)
            sx = sum(x for x, _ in vals)
            sy = sum(y for _, y in vals)
            sxy = sum(x * y for x, y in vals)
            sxx = sum(x * x for x, _ in vals)
            syy = sum(y * y for _, y in vals)
            mean_y = sy / n
            var_y = syy / n - mean_y**2
            cov = sxy / n - (sx / n) * mean_y
            var_x = sxx / n - (sx / n) ** 2
            var_adj = var_y - 2 * theta * cov + theta * theta * var_x
            r = out[arm]
            assert r.n == n
            assert r.mean_y == _q(mean_y / 100.0, 6)
            assert r.mean_y_cuped == _q(
                (mean_y - theta * (sx / n - xbar)) / 100.0, 6
            )
            assert r.var_y == _q(var_y / 10000.0, 4)
            assert r.var_y_cuped == _q(var_adj / 10000.0, 4)
            # the covariate explains most of the variance here
            assert r.var_reduction_pct > 90.0


class TestMutualInfo:
    def test_identical_columns_give_entropy(self, spark):
        from flytemosaic_spark.operators.drift import mutual_info

        rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20
        df = spark.createDataFrame(rows, "v string").select(
            F.col("v").alias("p"), F.col("v").alias("q")
        )
        r = mutual_info(df, "p", "q").collect()[0]
        want_h = _q(
            sum(
                _q(-(c / 100) * math.log(c / 100), 9) for c in (50, 30, 20)
            ),
            6,
        )
        assert r.h_a == want_h and r.h_b == want_h
        assert abs(r.mi - want_h) < 2e-6  # MI(X, X) = H(X)
        assert abs(r.nmi - 1.0) < 1e-5

    def test_independent_columns_give_zero(self, spark):
        from flytemosaic_spark.operators.drift import mutual_info

        # perfectly independent: uniform product distribution
        rows = [(a, b) for a in "xy" for b in "pq" for _ in range(25)]
        df = spark.createDataFrame(rows, "a string, b string")
        r = mutual_info(df, "a", "b").collect()[0]
        assert r.mi == 0.0 and r.nmi == 0.0
