"""Unit tests for the round-9 operators on hand fixtures — the oracle
gate covers the real-corpus path; these pin the semantics: ACF vs a
numpy reference with the same quantization, Theil–Sen vs a plain-Python
median-of-slopes replay (same md5 sample, same 1e-9 slope grain, both
parities of the pair count), frequent triples vs itertools.combinations
(including the max_basket guard), and l-diversity on a constructed
table with known violating classes.
"""

from __future__ import annotations

import hashlib
import itertools
import math

import numpy as np
from pyspark.sql import functions as F

from flytemosaic_spark.operators.drift import (
    conditional_entropy_rate,
    js_divergence,
)
from flytemosaic_spark.operators.dedup import survivorship
from flytemosaic_spark.operators.linear import grouped_ols, spearman_corr
from flytemosaic_spark.operators.metrics import (
    brown_forsythe,
    cliffs_delta,
    diff_in_diff,
    hhi_by,
    weighted_median_by,
    winsorized_mean_by,
)
from flytemosaic_spark.operators.privacy import l_diversity_report, t_closeness_report
from flytemosaic_spark.operators.recsys import (
    bias_baseline,
    coldstart_coverage,
    frequent_triples,
)
from flytemosaic_spark.operators.text import zipf_fit
from flytemosaic_spark.operators.timeseries import (
    autocorrelation,
    cross_correlation,
    ljung_box,
    mann_kendall,
    mean_shift_split,
    seasonal_strength,
    theil_sen_slope,
)


def _q(x: float, digits: int) -> float:
    return math.floor(x * 10**digits + 0.5) / 10**digits


def _bucket(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()[:4]


class TestAutocorrelation:
    def _reference(self, counts, max_lag):
        c = np.asarray(counts, dtype=float)
        mean = c.sum() / len(c)
        den = float(((c - mean) ** 2).sum())
        out = {}
        for lag in range(1, max_lag + 1):
            head, tail = c[:-lag], c[lag:]
            num = float(((head - mean) * (tail - mean)).sum())
            out[lag] = (len(head), _q(num / den, 6))
        return out

    def test_matches_numpy(self, spark):
        rng = np.random.default_rng(7)
        # weekly-seasonal series: acf should peak at lag 7
        counts = [
            100 + 40 * (t % 7 == 0) + int(rng.integers(0, 10))
            for t in range(60)
        ]
        df = spark.createDataFrame(
            [(t, c) for t, c in enumerate(counts)], "t long, c long"
        )
        got = {
            r.lag: (r.n_pairs, r.acf)
            for r in autocorrelation(df, "t", "c", max_lag=7).collect()
        }
        assert got == self._reference(counts, 7)
        # the constructed weekly pattern is visible
        assert got[7][1] > got[1][1]

    def test_constant_series_pairs(self, spark):
        # trend series: lag-1 acf near 1, monotone decay
        df = spark.createDataFrame(
            [(t, 10 * t) for t in range(30)], "t long, c long"
        )
        rows = autocorrelation(df, "t", "c", max_lag=3).collect()
        assert [r.n_pairs for r in rows] == [29, 28, 27]
        assert rows[0].acf > 0.85
        assert rows[0].acf > rows[1].acf > rows[2].acf


class TestTheilSen:
    def _reference(self, pts, budget, seed_tag):
        tt = (budget * 65536 + len(pts) - 1) // len(pts)
        s = [
            (k, t, v)
            for k, t, v in pts
            if tt >= 65536 or _bucket(f"{seed_tag}:{k}") < format(tt, "04x")
        ]
        slopes = []
        for (ka, ta, va), (kb, tb, vb) in itertools.combinations(
            sorted(s), 2
        ):
            if tb != ta:
                slopes.append((_q((vb - va) / (tb - ta), 9), ka, kb))
        slopes.sort()
        n = len(slopes)
        lo = slopes[(n + 1) // 2 - 1][0]
        hi = slopes[n // 2][0]
        return len(s), n, _q((lo + hi) / 2, 6)

    def _run(self, spark, pts, budget):
        df = spark.createDataFrame(pts, "k long, t double, v double")
        row = theil_sen_slope(
            df, "t", "v", sample_budget=budget, seed_tag="ts", key_col="k"
        ).collect()[0]
        return row.n_sample, row.n_pairs, row.slope

    def test_matches_python_reference(self, spark):
        rng = np.random.default_rng(3)
        pts = [
            (k, float(k), 2.5 * k + float(rng.normal(0, 1)))
            for k in range(300)
        ]
        # budget >= n takes everything (threshold saturates at 65536)
        assert self._run(spark, pts, 10**6) == self._reference(
            pts, 10**6, "ts"
        )

    def test_fixed_budget_subsample(self, spark):
        rng = np.random.default_rng(4)
        pts = [
            (k, float(k), 1.5 * k + float(rng.normal(0, 1)))
            for k in range(300)
        ]
        got = self._run(spark, pts, 50)
        ref = self._reference(pts, 50, "ts")
        assert got == ref
        # the budget actually bounds the sample (within md5 variance)
        assert got[0] < 120

    def test_outlier_immune(self, spark):
        pts = [(k, float(k), 1.0 * k) for k in range(50)]
        pts[10] = (10, 10.0, 1e6)  # one wild outlier
        _, _, slope = self._run(spark, pts, 10**6)
        assert abs(slope - 1.0) < 0.05

    def test_duplicate_timestamps_skipped(self, spark):
        pts = [(0, 1.0, 1.0), (1, 1.0, 9.0), (2, 2.0, 2.0), (3, 3.0, 3.0)]
        n_sample, n_pairs, slope = self._run(spark, pts, 10**6)
        assert n_sample == 4
        assert n_pairs == 5  # C(4,2)=6 minus the dt==0 pair
        assert self._reference(pts, 10**6, "ts") == (4, 5, slope)


class TestFrequentTriples:
    def _reference(self, baskets, min_support, top_n, max_basket):
        cnt: dict[tuple, int] = {}
        for items in baskets.values():
            ps = sorted(set(items))
            if not (3 <= len(ps) <= max_basket):
                continue
            for tri in itertools.combinations(ps, 3):
                cnt[tri] = cnt.get(tri, 0) + 1
        rows = [
            (a, b, c, n) for (a, b, c), n in cnt.items() if n >= min_support
        ]
        rows.sort(key=lambda r: (-r[3], r[0], r[1], r[2]))
        return rows[:top_n]

    def test_matches_itertools(self, spark):
        rng = np.random.default_rng(5)
        baskets = {
            bk: [int(rng.integers(0, 12)) for _ in range(int(rng.integers(1, 9)))]
            for bk in range(80)
        }
        rows = [(bk, it) for bk, items in baskets.items() for it in items]
        df = spark.createDataFrame(rows, "o long, i long")
        got = [
            (r.item_a, r.item_b, r.item_c, r.n_baskets)
            for r in frequent_triples(
                df, "o", "i", min_support=2, top_n=10, max_basket=64
            ).collect()
        ]
        assert got == self._reference(baskets, 2, 10, 64)

    def test_max_basket_guard(self, spark):
        # one mega-basket holding items 0..99 plus two small baskets
        rows = [(0, i) for i in range(100)]
        rows += [(1, i) for i in (1, 2, 3)] + [(2, i) for i in (1, 2, 3)]
        df = spark.createDataFrame(rows, "o long, i long")
        got = [
            (r.item_a, r.item_b, r.item_c, r.n_baskets)
            for r in frequent_triples(
                df, "o", "i", min_support=2, top_n=10, max_basket=10
            ).collect()
        ]
        # mega-basket dropped before expansion: only the small pair survives
        assert got == [(1, 2, 3, 2)]

    def test_apriori_prune_lossless(self, spark):
        # denser fixture + higher support so the pair prune genuinely
        # removes items, then the result must still match brute force
        rng = np.random.default_rng(11)
        baskets = {
            bk: [int(rng.integers(0, 8)) for _ in range(int(rng.integers(3, 7)))]
            for bk in range(120)
        }
        rows = [(bk, it) for bk, items in baskets.items() for it in items]
        df = spark.createDataFrame(rows, "o long, i long")
        for s in (2, 3, 5):
            got = [
                (r.item_a, r.item_b, r.item_c, r.n_baskets)
                for r in frequent_triples(
                    df, "o", "i", min_support=s, top_n=50, max_basket=64
                ).collect()
            ]
            assert got == self._reference(baskets, s, 50, 64), s


class TestLDiversity:
    def test_hand_fixture(self, spark):
        # class A: 4 rows, 1 distinct sensitive -> violates l=2 and l=3
        # class B: 3 rows, 2 distinct -> violates only l=3
        # class C: 3 rows, 3 distinct -> never violates
        rows = (
            [("A", "x")] * 4
            + [("B", "x"), ("B", "x"), ("B", "y")]
            + [("C", "x"), ("C", "y"), ("C", "z")]
        )
        df = spark.createDataFrame(rows, "q string, s string")
        got = {
            r.l: (r.n_classes, r.n_violating_classes, r.rows_at_risk, r.at_risk_rate)
            for r in l_diversity_report(
                df, [F.col("q")], F.col("s"), ls=[2, 3]
            ).collect()
        }
        assert got[2] == (3, 1, 4, _q(4 / 10, 6))
        assert got[3] == (3, 2, 7, _q(7 / 10, 6))


class TestTCloseness:
    def test_hand_fixture(self, spark):
        # global dist: x 7/10, y 2/10, z 1/10
        # class A (4 rows, all x): d = ((|1-.7|-.7) + 1)/2 = 0.3
        # class B (3 rows: 2x,1y): d = (|2/3-.7|-.7 + |1/3-.2|-.2 + 1)/2
        #   ≈ 0.1333333
        # class C (3 rows: 1 each): d = (0.3666667+0.1333333+0.2333333
        #   + 1 - 1)/2 ≈ 0.3666667
        rows = (
            [("A", "x")] * 4
            + [("B", "x"), ("B", "x"), ("B", "y")]
            + [("C", "x"), ("C", "y"), ("C", "z")]
        )
        df = spark.createDataFrame(rows, "q string, s string")
        got = {
            r.t: (r.n_classes, r.n_violating_classes, r.rows_at_risk)
            for r in t_closeness_report(
                df, [F.col("q")], F.col("s"), ts=[0.2, 0.35]
            ).collect()
        }
        # t=0.2: A (0.3) and C (~0.3667) violate -> 7 rows at risk
        assert got[0.2] == (3, 2, 7)
        # t=0.35: only C violates
        assert got[0.35] == (3, 1, 3)

    def test_uniform_classes_never_violate(self, spark):
        # every class mirrors the global distribution -> dist 0
        rows = [(q, s) for q in ("A", "B") for s in ("x", "x", "y")]
        df = spark.createDataFrame(rows, "q string, s string")
        for r in t_closeness_report(
            df, [F.col("q")], F.col("s"), ts=[0.01]
        ).collect():
            assert r.n_violating_classes == 0


class TestZipfFit:
    def test_exact_power_law(self, spark):
        # construct counts c_r = round(1000 * r^-1): slope should land
        # near -1 and the fit replays in plain python
        import math as _m

        words = []
        for r in range(1, 41):
            c = max(1, int(1000 * r**-1.0))
            words += [f"w{r:03d}"] * c
        df = spark.createDataFrame([(" ".join(words),)], "text string")
        row = zipf_fit(df, "text", top_n=1000).collect()[0]
        # python replay with the operator's exact quantization
        freq = sorted(
            {w: words.count(w) for w in set(words)}.items(),
            key=lambda kv: (-kv[1], kv[0]),
        )
        pts = [
            (
                _m.floor(_m.log(i + 1) * 1e9 + 0.5),
                _m.floor(_m.log(c) * 1e9 + 0.5),
            )
            for i, (_, c) in enumerate(freq)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy / 1e9 - slope * sx / 1e9) / n
        assert row.n_terms == n
        assert row.slope == _q(slope, 6)
        assert row.intercept == _q(intercept, 6)
        assert -1.15 < row.slope < -0.85


class TestJSDivergence:
    def test_identical_distributions_zero(self, spark):
        rows = [(g, w) for g in ("a", "b") for w in ("x", "x", "y", "z")]
        df = spark.createDataFrame(rows, "g string, w string")
        row = js_divergence(df, "g", "w", "a", "b").collect()[0]
        assert row.js == 0.0
        assert row.vocab == 3
        assert (row.n_a, row.n_b) == (4, 4)

    def test_disjoint_supports_ln2(self, spark):
        rows = [("a", "x"), ("a", "y"), ("b", "u"), ("b", "v")]
        df = spark.createDataFrame(rows, "g string, w string")
        row = js_divergence(df, "g", "w", "a", "b").collect()[0]
        assert row.js == _q(math.log(2.0), 6)

    def test_matches_python(self, spark):
        rng = np.random.default_rng(9)
        rows = []
        for g, bias in (("a", 0.7), ("b", 0.3)):
            for _ in range(500):
                w = "x" if rng.random() < bias else f"w{int(rng.integers(0, 20))}"
                rows.append((g, w))
        df = spark.createDataFrame(rows, "g string, w string")
        got = js_divergence(df, "g", "w", "a", "b").collect()[0]
        ca: dict[str, int] = {}
        cb: dict[str, int] = {}
        for g, w in rows:
            (ca if g == "a" else cb).setdefault(w, 0)
            (ca if g == "a" else cb)[w] += 1
        vocab = set(ca) | set(cb)
        na, nb = sum(ca.values()), sum(cb.values())
        su = 0
        for w in vocab:
            p = ca.get(w, 0) / na
            q = cb.get(w, 0) / nb
            m = (p + q) / 2.0
            term = (p * math.log(p / m) / 2.0 if p > 0 else 0.0) + (
                q * math.log(q / m) / 2.0 if q > 0 else 0.0
            )
            su += math.floor(term * 1e9 + 0.5)
        assert got.js == _q(su / 1e9, 6)
        assert got.vocab == len(vocab)


class TestCrossCorrelation:
    def test_shifted_copy_peaks_at_lag(self, spark):
        # y is x shifted by +2 days: r should peak (=1) at lag +2
        rng = np.random.default_rng(13)
        base = [int(rng.integers(10, 100)) for _ in range(60)]
        rows = [
            (t, base[t], base[t - 2] if t >= 2 else int(rng.integers(10, 100)))
            for t in range(60)
        ]
        df = spark.createDataFrame(rows, "t long, x long, y long")
        got = {r.lag: r.r for r in cross_correlation(df, "t", "x", "y", 3).collect()}
        assert sorted(got) == [-3, -2, -1, 0, 1, 2, 3]
        assert got[2] > 0.95
        assert all(got[2] >= got[lag] for lag in got)

    def test_matches_numpy_pearson(self, spark):
        rng = np.random.default_rng(17)
        rows = [
            (t, int(rng.integers(0, 50)), int(rng.integers(0, 50)))
            for t in range(40)
        ]
        df = spark.createDataFrame(rows, "t long, x long, y long")
        got = {r.lag: r.r for r in cross_correlation(df, "t", "x", "y", 2).collect()}
        by_t = {t: (x, y) for t, x, y in rows}
        for lag in range(-2, 3):
            xs, ys = [], []
            for t, (x, _) in by_t.items():
                if t + lag in by_t:
                    xs.append(x)
                    ys.append(by_t[t + lag][1])
            r = np.corrcoef(xs, ys)[0, 1]
            assert abs(got[lag] - r) < 1e-6


class TestBiasBaseline:
    def _reference(self, triples, lam=10):
        sc = sum(c for _, _, c in triples)
        n = len(triples)
        mu = sc / n
        items: dict[int, list[int]] = {}
        for _, i, c in triples:
            items.setdefault(i, []).append(c)
        bi = {
            i: _q((sum(cs) - len(cs) * mu) / (lam + len(cs)) / 100.0, 9)
            for i, cs in items.items()
        }
        users: dict[int, int] = {}
        ucnt: dict[int, int] = {}
        for u, i, c in triples:
            ru = math.floor((c / 100.0 - mu / 100.0 - bi[i]) * 1e9 + 0.5)
            users[u] = users.get(u, 0) + ru
            ucnt[u] = ucnt.get(u, 0) + 1
        bu = {
            u: math.floor(users[u] / (float(lam) + ucnt[u]) + 0.5) / 1e9
            for u in users
        }
        se = sg = 0
        for u, i, c in triples:
            e = c / 100.0 - mu / 100.0 - bu[u] - bi[i]
            ge = c / 100.0 - mu / 100.0
            se += math.floor(e * e * 1e9 + 0.5)
            sg += math.floor(ge * ge * 1e9 + 0.5)
        return (
            n,
            _q(math.sqrt(se / 1e9 / n), 6),
            _q(math.sqrt(sg / 1e9 / n), 6),
        )

    def test_matches_python_reference(self, spark):
        rng = np.random.default_rng(21)
        # user/item structure: user bias + item bias + noise
        triples = []
        ub = {u: int(rng.integers(-200, 200)) for u in range(30)}
        ib = {i: int(rng.integers(-300, 300)) for i in range(12)}
        for _ in range(600):
            u = int(rng.integers(0, 30))
            i = int(rng.integers(0, 12))
            c = 1000 + ub[u] + ib[i] + int(rng.integers(-50, 50))
            triples.append((u, i, c))
        df = spark.createDataFrame(triples, "u long, i long, c long")
        row = bias_baseline(df, "u", "i", "c", lam=10).collect()[0]
        got = (row.n_ratings, row.rmse_baseline, row.rmse_global)
        assert got == self._reference(triples)
        # the baseline must beat the global-mean strawman on biased data
        assert row.rmse_baseline < row.rmse_global * 0.6


class TestNelsonAalen:
    def test_ties_to_kaplan_meier(self, spark):
        # H(t) >= -ln S(t) (Jensen); both computed from events at sf0.001
        from flytemosaic_spark.probes import get_probe

        sfdir = "/root/testdata/sf0.001"
        km = {
            r.day: r.survival
            for r in get_probe("x164_kaplan_meier").fn(spark, sfdir).collect()
        }
        na = {
            r.day: r.cum_hazard
            for r in get_probe("x199_nelson_aalen").fn(spark, sfdir).collect()
        }
        assert set(km) == set(na)
        # -ln S = -sum ln(1 - d/n) >= sum d/n = H  (pointwise)
        for d in km:
            if km[d] > 0:
                assert na[d] <= -math.log(km[d]) + 1e-6
        # hazard is nondecreasing
        days = sorted(na)
        assert all(na[a] <= na[b] for a, b in zip(days, days[1:]))


class TestMannKendall:
    def _reference(self, pts, budget=10**6):
        tt = (budget * 65536 + len(pts) - 1) // len(pts)
        s = [
            (k, t, v)
            for k, t, v in pts
            if tt >= 65536 or _bucket(f"mk:{k}") < format(tt, "04x")
        ]
        st = 0
        for (_, ta, va), (_, tb, vb) in itertools.permutations(s, 2):
            if ta < tb:
                st += (vb > va) - (vb < va)
        n = len(s)
        ties: dict[float, int] = {}
        for _, _, v in s:
            ties[v] = ties.get(v, 0) + 1
        tie_term = sum(tg * (tg - 1) * (2 * tg + 5) for tg in ties.values())
        var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        if st > 0:
            z = (st - 1) / math.sqrt(var)
        elif st < 0:
            z = (st + 1) / math.sqrt(var)
        else:
            z = 0.0
        return n, st, _q(z, 6)

    def _run(self, spark, pts):
        df = spark.createDataFrame(pts, "k long, t double, v double")
        row = mann_kendall(
            df, "t", "v", sample_budget=10**6, seed_tag="mk", key_col="k"
        ).collect()[0]
        return row.n_sample, row.s_stat, row.z

    def test_increasing_trend(self, spark):
        pts = [(k, float(k), 2.0 * k) for k in range(40)]
        n, st, z = self._run(spark, pts)
        assert (n, st, z) == self._reference(pts)
        assert st == 40 * 39 // 2  # every pair concordant
        assert z > 5

    def test_no_trend_with_ties(self, spark):
        rng = np.random.default_rng(23)
        pts = [(k, float(k), float(rng.integers(0, 5))) for k in range(60)]
        got = self._run(spark, pts)
        assert got == self._reference(pts)
        assert abs(got[2]) < 2.5  # no systematic trend


class TestDiffInDiff:
    def test_matches_python_reference(self, spark):
        rng = np.random.default_rng(29)
        rows = []
        # treat post gets +300 cents on top of a +100 common time trend
        for arm in (True, False):
            for post in (True, False):
                base = 1000 + 100 * post + 300 * (arm and post) - 50 * arm
                for _ in range(200):
                    rows.append((arm, post, base + int(rng.integers(-80, 80))))
        df = spark.createDataFrame(rows, "a boolean, p boolean, c long")
        row = diff_in_diff(df, F.col("a"), F.col("p"), F.col("c")).collect()[0]

        def cell(a, p):
            cs = [c for aa, pp, c in rows if aa == a and pp == p]
            n = len(cs)
            s = sum(cs)
            ss = sum(c * c for c in cs)
            var = (ss - s * s / n) / (n - 1)
            return n, s / n / 100.0, var

        _, m11, v11 = cell(True, True)
        n, m10, v10 = cell(True, False)
        _, m01, v01 = cell(False, True)
        _, m00, v00 = cell(False, False)
        did = (m11 - m10) - (m01 - m00)
        se = math.sqrt(v11 / 200 + v10 / 200 + v01 / 200 + v00 / 200) / 100.0
        assert row.n == 800
        assert abs(row.did - did) < 1e-6
        assert abs(row.se - se) < 1e-6
        # the +300 effect is recovered within noise, strongly significant
        assert abs(row.did - 3.0) < 0.3
        assert row.z > 5


class TestMeanShiftSplit:
    def test_finds_constructed_break(self, spark):
        # mean jumps from 100 to 200 at t=30
        rows = [(t, 100 if t < 30 else 200) for t in range(60)]
        df = spark.createDataFrame(rows, "t long, v long")
        row = mean_shift_split(df, "t", "v").collect()[0]
        assert row.split_t == 29  # last index of the before segment
        assert row.mean_before == 100.0
        assert row.mean_after == 200.0
        assert row.n_before == 30 and row.n_after == 30

    def test_matches_python_argmax(self, spark):
        rng = np.random.default_rng(31)
        vals = [int(rng.integers(90, 110)) for _ in range(25)] + [
            int(rng.integers(140, 160)) for _ in range(35)
        ]
        rows = list(enumerate(vals))
        df = spark.createDataFrame(rows, "t long, v long")
        row = mean_shift_split(df, "t", "v").collect()[0]
        n, sv = len(vals), sum(vals)
        best = None
        for k in range(1, n):
            n1, n2 = k, n - k
            c1 = sum(vals[:k])
            m1, m2 = c1 / n1, (sv - c1) / n2
            score = _q(n1 * n2 * (m1 - m2) * (m1 - m2) / n, 6)
            cand = (score, -(k - 1))
            if best is None or cand > best:
                best = cand
                best_k = k - 1
        assert row.split_t == best_k
        assert row.score == best[0]


class TestSurvivorship:
    def test_golden_record_election(self, spark):
        rows = [
            (1, "aaa", 10),
            (2, "aaa", 30),  # canonical: highest quality
            (3, "aaa", 30),  # quality tie -> loses on id
            (4, "bbb", 5),   # singleton: not emitted
            (5, "ccc", 7),
            (6, "ccc", 7),   # tie -> id 5 canonical
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
        got = {
            r.doc_id: (r.canonical_id, r.cluster_size)
            for r in survivorship(df, "doc_id", "text", "n_chars").collect()
        }
        # canonicals themselves are not emitted, only redundant members
        assert got == {1: (2, 3), 3: (2, 3), 6: (5, 2)}

    def test_prefix_fingerprint(self, spark):
        # same 200-char head, different tails -> same cluster
        head = "x" * 200
        rows = [(1, head + "tail-a", 206), (2, head + "tail-bb", 207)]
        df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
        got = survivorship(
            df, "doc_id", "text", "n_chars", prefix_len=200
        ).collect()
        assert [(r.doc_id, r.canonical_id) for r in got] == [(1, 2)]
        # without the fingerprint they are distinct documents
        assert (
            survivorship(df, "doc_id", "text", "n_chars").count() == 0
        )


class TestWeightedMedian:
    def _reference(self, rows):
        out = {}
        for g in {g for g, _, _ in rows}:
            vw = sorted((v, w) for gg, v, w in rows if gg == g)
            tw = sum(w for _, w in vw)
            cum = 0
            for v, w in vw:
                cum += w
                if 2 * cum >= tw:
                    out[g] = (len(vw), tw, v)
                    break
        return out

    def test_matches_python(self, spark):
        rng = np.random.default_rng(37)
        rows = [
            (f"g{int(rng.integers(0, 3))}", int(rng.integers(0, 1000)),
             int(rng.integers(1, 50)))
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "g string, v long, w long")
        got = {
            r.grp: (r.n, r.total_w, r.wmedian)
            for r in weighted_median_by(df, "g", "v", "w").collect()
        }
        assert got == self._reference(rows)

    def test_weight_dominance(self, spark):
        # one huge-weight row IS the weighted median
        rows = [("a", v, 1) for v in range(100)] + [("a", 7, 1000)]
        df = spark.createDataFrame(rows, "g string, v long, w long")
        assert weighted_median_by(df, "g", "v", "w").collect()[0].wmedian == 7


class TestWinsorizedMean:
    def _reference(self, vals, pct=5):
        n = len(vals)
        s = sorted(vals)
        lo_i = max(1, math.ceil(n * pct / 100))
        lo, hi = s[lo_i - 1], s[n - lo_i]
        cc = [min(max(c, lo), hi) for c in vals]
        return n, lo, hi, _q(sum(cc) / n / 100.0, 6)

    def test_matches_python(self, spark):
        rng = np.random.default_rng(41)
        vals = [int(rng.integers(100, 10000)) for _ in range(300)]
        vals += [10**7, -(10**6)]  # wild outliers, clamped not dropped
        df = spark.createDataFrame([("a", c) for c in vals], "g string, c long")
        r = winsorized_mean_by(df, "g", "c", pct=5).collect()[0]
        n, lo, hi, wm = self._reference(vals)
        assert (r.n, r.lo_bound, r.hi_bound, r.wins_mean) == (n, lo, hi, wm)
        # robust: outliers moved the plain mean far more
        plain = sum(vals) / len(vals) / 100.0
        assert abs(plain - wm) > 10


class TestEntropyRate:
    def test_deterministic_chain_zero_cond_entropy(self, spark):
        # a -> b -> c -> a ... : next is fully determined by current
        seq = ["a", "b", "c"] * 20
        rows = [(1, float(t), s, t) for t, s in enumerate(seq)]
        df = spark.createDataFrame(rows, "u long, ts double, s string, k long")
        r = conditional_entropy_rate(df, "u", "ts", "s", "k").collect()[0]
        assert r.h_cond == 0.0
        assert r.h_next > 1.0  # ~ln 3
        assert r.seq_info == r.h_next

    def test_matches_python(self, spark):
        rng = np.random.default_rng(43)
        rows = []
        for u in range(20):
            for t in range(30):
                rows.append((u, float(t), f"s{int(rng.integers(0, 4))}", t))
        df = spark.createDataFrame(rows, "u long, ts double, s string, k long")
        r = conditional_entropy_rate(df, "u", "ts", "s", "k").collect()[0]
        # python replay with identical quantization
        tr: dict[tuple, int] = {}
        by_u: dict[int, list] = {}
        for u, t, s, _ in rows:
            by_u.setdefault(u, []).append((t, s))
        for u, seq in by_u.items():
            seq.sort()
            for (_, a), (_, b) in zip(seq, seq[1:]):
                tr[(a, b)] = tr.get((a, b), 0) + 1
        n = sum(tr.values())
        ni: dict[str, int] = {}
        nj: dict[str, int] = {}
        for (a, b), o in tr.items():
            ni[a] = ni.get(a, 0) + o
            nj[b] = nj.get(b, 0) + o
        su = sum(
            math.floor((o / n) * math.log(ni[a] / o) * 1e9 + 0.5)
            for (a, b), o in tr.items()
        )
        sn = sum(
            math.floor((c / n) * math.log(n / c) * 1e9 + 0.5)
            for c in nj.values()
        )
        assert r.n_transitions == n
        assert r.h_cond == _q(su / 1e9, 6)
        assert r.h_next == _q(sn / 1e9, 6)


class TestHHI:
    def test_hand_values(self, spark):
        # monopoly -> 1.0; two equal members -> 0.5; 4 equal -> 0.25
        rows = (
            [("mono", 1, 500)]
            + [("duo", i, 300) for i in (1, 2)]
            + [("quad", i, 100) for i in (1, 2, 3, 4)]
        )
        df = spark.createDataFrame(rows, "m string, i long, c long")
        got = {
            r.market: (r.n_members, r.hhi)
            for r in hhi_by(df, "m", "i", "c").collect()
        }
        assert got == {"mono": (1, 1.0), "duo": (2, 0.5), "quad": (4, 0.25)}

    def test_member_sums_first(self, spark):
        # shares are of MEMBER totals, not per-row
        rows = [("m", 1, 100), ("m", 1, 100), ("m", 2, 200)]
        df = spark.createDataFrame(rows, "m string, i long, c long")
        r = hhi_by(df, "m", "i", "c").collect()[0]
        assert (r.n_members, r.hhi) == (2, 0.5)


class TestColdstartCoverage:
    def test_constructed_split(self, spark):
        # users chosen so the md5 bucket puts u in train iff bucket<cccd;
        # we instead pick a threshold of '8000' is avoided — just verify
        # against a python replay of the same rule
        rng = np.random.default_rng(47)
        rows = [
            (int(rng.integers(0, 50)), int(rng.integers(0, 30)))
            for _ in range(800)
        ]
        df = spark.createDataFrame(rows, "u long, i long")
        r = coldstart_coverage(df, "u", "i", train_hex="cccd", seed_tag="cs")
        row = r.collect()[0]
        train_items = {
            i for u, i in rows if _bucket(f"cs:{u}") < "cccd"
        }
        test_rows = [(u, i) for u, i in rows if _bucket(f"cs:{u}") >= "cccd"]
        n_cold = sum(1 for _, i in test_rows if i not in train_items)
        test_items = {i for _, i in test_rows}
        cold_items = {i for i in test_items if i not in train_items}
        assert row.n_test_rows == len(test_rows)
        assert row.n_cold_rows == n_cold
        assert row.n_test_items == len(test_items)
        assert row.n_cold_items == len(cold_items)


class TestGroupedOLS:
    def _reference(self, rows):
        out = {}
        for g in {g for g, _, _ in rows}:
            pts = [
                (math.floor(x * 1e9 + 0.5), math.floor(y * 1e9 + 0.5))
                for gg, x, y in rows
                if gg == g
            ]
            n = len(pts)
            sx = sum(x for x, _ in pts)
            sy = sum(y for _, y in pts)
            sxy = sum(x * y for x, y in pts)
            sxx = sum(x * x for x, _ in pts)
            syy = sum(y * y for _, y in pts)
            num = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            slope = num / vx
            intercept = (sy / 1e9 - slope * sx / 1e9) / n
            r2 = float(num) * float(num) / (float(vx) * float(vy))
            out[g] = (n, _q(slope, 6), _q(intercept, 6), _q(r2, 6))
        return out

    def test_matches_python(self, spark):
        rng = np.random.default_rng(53)
        rows = []
        for g, (a, b) in {"g1": (2.0, 1.0), "g2": (-0.5, 3.0)}.items():
            for _ in range(200):
                x = float(rng.uniform(1, 10))
                rows.append((g, x, a * x + b + float(rng.normal(0, 0.1))))
        df = spark.createDataFrame(rows, "g string, x double, y double")
        got = {
            r.grp: (r.n, r.slope, r.intercept, r.r2)
            for r in grouped_ols(df, "g", F.col("x"), F.col("y")).collect()
        }
        assert got == self._reference(rows)
        # slopes recovered within noise
        assert abs(got["g1"][1] - 2.0) < 0.05
        assert abs(got["g2"][1] + 0.5) < 0.05
        assert got["g1"][3] > 0.99

    def test_zero_variance_null_slope(self, spark):
        rows = [("g", 1.0, float(v)) for v in range(5)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        r = grouped_ols(df, "g", F.col("x"), F.col("y")).collect()[0]
        assert r.slope is None


class TestSeasonalStrength:
    def test_pure_weekly_pattern(self, spark):
        rows = [(t, 100 + 50 * (t % 7)) for t in range(70)]
        df = spark.createDataFrame(rows, "t long, v long")
        r = seasonal_strength(df, "t", "v", period=7).collect()[0]
        assert r.strength == 1.0

    def test_no_pattern_low_strength(self, spark):
        rng = np.random.default_rng(59)
        rows = [(t, int(rng.integers(90, 110))) for t in range(140)]
        df = spark.createDataFrame(rows, "t long, v long")
        r = seasonal_strength(df, "t", "v", period=7).collect()[0]
        assert r.strength < 0.15

    def test_matches_python(self, spark):
        rng = np.random.default_rng(61)
        vals = [int(100 + 20 * (t % 7 == 2) + rng.integers(0, 10)) for t in range(84)]
        rows = list(enumerate(vals))
        df = spark.createDataFrame(rows, "t long, v long")
        r = seasonal_strength(df, "t", "v", period=7).collect()[0]
        n, sv, ss = len(vals), sum(vals), sum(v * v for v in vals)
        ph: dict[int, list] = {}
        for t, v in rows:
            ph.setdefault(t % 7, []).append(v)
        b = sum(
            math.floor(sum(vs) ** 2 / len(vs) * 1e6 + 0.5)
            for vs in ph.values()
        )
        corr = sv * sv / n
        want = _q((b / 1e6 - corr) / (ss - corr), 6)
        assert r.strength == want


class TestCliffsDelta:
    def test_hand_values(self, spark):
        # A strictly above B: delta = +1; interleaved equal: delta = 0
        rows = [(True, v) for v in (10, 11, 12)] + [
            (False, v) for v in (1, 2, 3)
        ]
        df = spark.createDataFrame(rows, "arm boolean, sc long")
        r = cliffs_delta(df, "arm", "sc").collect()[0]
        assert (r.n_a, r.n_b, r.delta, r.magnitude) == (3, 3, 1.0, "large")
        rows2 = [(True, v) for v in (1, 2)] + [(False, v) for v in (1, 2)]
        df2 = spark.createDataFrame(rows2, "arm boolean, sc long")
        r2 = cliffs_delta(df2, "arm", "sc").collect()[0]
        assert r2.delta == 0.0
        assert r2.magnitude == "negligible"

    def test_matches_python(self, spark):
        rng = np.random.default_rng(67)
        rows = [(bool(rng.random() < 0.5), int(rng.integers(0, 40))) for _ in range(400)]
        df = spark.createDataFrame(rows, "arm boolean, sc long")
        r = cliffs_delta(df, "arm", "sc").collect()[0]
        a = [v for arm, v in rows if arm]
        b = [v for arm, v in rows if not arm]
        gt = sum(1 for x in a for y in b if x > y)
        lt = sum(1 for x in a for y in b if x < y)
        want = _q((gt - lt) / (len(a) * len(b)), 6)
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert abs(r.delta - want) < 2e-6


class TestBrownForsythe:
    def _reference(self, rows):
        groups: dict[str, list] = {}
        for g, c in rows:
            groups.setdefault(g, []).append(c)
        zs = {}
        for g, cs in groups.items():
            s = sorted(cs)
            n = len(s)
            # lower median: smallest value whose cum count reaches n/2
            med = s[(n - 1) // 2] if n % 2 else s[n // 2 - 1]
            zs[g] = [abs(c - med) for c in cs]
        k = len(zs)
        nn = sum(len(z) for z in zs.values())
        s_all = sum(sum(z) for z in zs.values())
        ss = sum(v * v for z in zs.values() for v in z)
        bt = sum(
            math.floor(sum(z) ** 2 / len(z) * 1e6 + 0.5) for z in zs.values()
        )
        corr = s_all * s_all / nn
        between = bt / 1e6 - corr
        within = ss - bt / 1e6
        return k, nn, _q((nn - k) / (k - 1) * (between / within), 6)

    def test_matches_python(self, spark):
        rng = np.random.default_rng(71)
        rows = []
        for g, spread in (("a", 10), ("b", 50), ("c", 10)):
            for _ in range(150):
                rows.append((g, int(1000 + rng.integers(-spread, spread))))
        df = spark.createDataFrame(rows, "g string, c long")
        r = brown_forsythe(df, "g", "c").collect()[0]
        assert (r.k, r.n, r.f_stat) == self._reference(rows)
        # the constructed variance gap is detected
        assert r.f_stat > 10

    def test_equal_variances_small_f(self, spark):
        rng = np.random.default_rng(73)
        rows = [
            (f"g{i % 4}", int(1000 + rng.integers(-30, 30)))
            for i in range(1200)
        ]
        df = spark.createDataFrame(rows, "g string, c long")
        r = brown_forsythe(df, "g", "c").collect()[0]
        assert r.f_stat < 3


class TestLjungBox:
    def test_white_noise_accepts(self, spark):
        rng = np.random.default_rng(79)
        rows = [(t, int(rng.integers(90, 110))) for t in range(200)]
        df = spark.createDataFrame(rows, "t long, c long")
        r = ljung_box(df, "t", "c", max_lag=7).collect()[0]
        assert r.n_obs == 200 and r.h == 7
        assert not r.reject_white

    def test_weekly_pattern_rejects_and_replays(self, spark):
        rows = [(t, 100 + 40 * (t % 7 == 0)) for t in range(140)]
        df = spark.createDataFrame(rows, "t long, c long")
        r = ljung_box(df, "t", "c", max_lag=7).collect()[0]
        assert r.reject_white
        # python replay from the operator's own ACF output
        acf = {
            a.lag: (a.n_pairs, a.acf)
            for a in __import__(
                "flytemosaic_spark.operators.timeseries",
                fromlist=["autocorrelation"],
            ).autocorrelation(df, "t", "c", max_lag=7).collect()
        }
        n = 140
        su = sum(
            math.floor(r_ * r_ / np_ * 1e12 + 0.5)
            for np_, r_ in acf.values()
        )
        assert r.q_stat == _q(n * (n + 2) * (su / 1e12), 6)


class TestSpearman:
    def test_monotone_transform_invariance(self, spark):
        rng = np.random.default_rng(83)
        xs = [int(rng.integers(1, 1000)) for _ in range(300)]
        rows = [(x, x * x) for x in xs]  # monotone map -> rho == 1
        df = spark.createDataFrame(rows, "x long, y long")
        r = spearman_corr(df, "x", "y").collect()[0]
        assert r.rho == 1.0

    def test_matches_scipy_style_reference(self, spark):
        rng = np.random.default_rng(89)
        rows = [
            (int(rng.integers(0, 50)), int(rng.integers(0, 50)))
            for _ in range(400)
        ]
        df = spark.createDataFrame(rows, "x long, y long")
        r = spearman_corr(df, "x", "y").collect()[0]

        def midranks(vals):
            order = sorted(range(len(vals)), key=lambda i: vals[i])
            out = [0.0] * len(vals)
            i = 0
            while i < len(order):
                j = i
                while j < len(order) and vals[order[j]] == vals[order[i]]:
                    j += 1
                mr = (i + 1 + j) / 2.0
                for k in range(i, j):
                    out[order[k]] = mr
                i = j
            return out

        ra = np.array(midranks([x for x, _ in rows]))
        rb = np.array(midranks([y for _, y in rows]))
        want = np.corrcoef(ra, rb)[0, 1]
        assert abs(r.rho - want) < 1e-6

    def test_anticorrelated(self, spark):
        rows = [(x, 1000 - x) for x in range(100)]
        df = spark.createDataFrame(rows, "x long, y long")
        assert spearman_corr(df, "x", "y").collect()[0].rho == -1.0

    def test_fractional_inputs_rank_exactly(self, spark):
        # values in (0, 1): the old bigint quantization collapsed them
        # all to 0 (rho degenerate); raw-value ranking must see the
        # true monotone order -> rho == 1 even with sub-integer gaps
        rows = [(i / 97.0, math.exp(i / 97.0)) for i in range(120)]
        df = spark.createDataFrame(rows, "x double, y double")
        r = spearman_corr(df, "x", "y").collect()[0]
        assert r.n == 120
        assert r.rho == 1.0

    def test_fractional_ties_midranked(self, spark):
        # fractional duplicates must tie with each other but NOT with
        # neighbors that a floor-to-int would have merged
        rows = [(0.1, 1.0), (0.1, 2.0), (0.2, 3.0), (0.9, 4.0)]
        df = spark.createDataFrame(rows, "x double, y double")
        ra = np.array([1.5, 1.5, 3.0, 4.0])
        rb = np.array([1.0, 2.0, 3.0, 4.0])
        want = np.corrcoef(ra, rb)[0, 1]
        r = spearman_corr(df, "x", "y").collect()[0]
        assert abs(r.rho - want) < 1e-6

    def test_fallback_path_matches_fast_path(self, spark, monkeypatch):
        # r10: the broadcast fast path (node-scale x-marginal) and the
        # joint-aggregate fallback must agree bit-for-bit — force the
        # fallback by zeroing the gate and compare on tied, skewed data
        import flytemosaic_spark.operators.linear as linear

        rng = np.random.default_rng(101)
        rows = [
            (int(rng.integers(0, 30)), int(rng.integers(0, 200)))
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "x long, y long")
        fast = spearman_corr(df, "x", "y").collect()[0]
        monkeypatch.setattr(linear, "_SPEARMAN_BROADCAST_LIMIT", 0)
        slow = spearman_corr(df, "x", "y").collect()[0]
        assert fast.n == slow.n == 500
        assert fast.rho == slow.rho
