"""Degenerate-input robustness for the round-2 operators: empty
frames, single rows, quota overrun, zero thresholds. Operators that
work at 100 TB must also not blow up at 0 rows — empty partitions and
empty groups are routine at scale."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flytemosaic_spark.operators.fuzzy import blocked_fuzzy_pairs
from flytemosaic_spark.operators.sampling import domain_mix
from flytemosaic_spark.operators.scd import scd2_from_changes
from flytemosaic_spark.plans.prefix import distributed_cumsum


def _empty_like(spark, schema_ddl):
    return spark.createDataFrame([], schema_ddl)


def test_fuzzy_empty_and_exact_zero(spark):
    empty = _empty_like(spark, "k long, t string, b string")
    assert blocked_fuzzy_pairs(empty, "k", "t", "b", 2).count() == 0

    df = spark.createDataFrame(
        [(1, "same", "x"), (2, "same", "x"), (3, "diff!", "x")],
        "k long, t string, b string",
    )
    rows = blocked_fuzzy_pairs(df, "k", "t", "b", 0).collect()
    assert [(r.a_key, r.b_key, r.dist) for r in rows] == [(1, 2, 0)]


def test_scd2_single_event_and_empty(spark):
    empty = _empty_like(spark, "u long, ts timestamp, a string, e long")
    assert scd2_from_changes(empty, "u", "ts", "a", "e").count() == 0

    one = spark.createDataFrame(
        [(7, "2024-01-01 00:00:00", "on", 1)],
        "u long, ts string, a string, e long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = scd2_from_changes(one, "u", "ts", "a", "e").collect()
    assert len(rows) == 1
    assert rows[0].is_current and rows[0].valid_to is None


def test_domain_mix_quota_exceeds_stratum(spark):
    """A weight asking for more rows than the stratum has yields the
    whole stratum, never an error or duplicates."""
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "zh") for i in range(10)], "id long, lang string"
    )
    out = domain_mix(df, {"en": 1.0}, "lang", "id", total=1000).collect()
    assert sorted(r.id for r in out) == [1, 3, 5, 7, 9]


def test_domain_mix_unlisted_stratum_dropped(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "fr")], "id long, lang string"
    )
    out = domain_mix(df, {"en": 1.0}, "lang", "id", total=10).collect()
    assert [r.lang for r in out] == ["en"]


def test_distributed_cumsum_empty_single_and_one_bucket(spark):
    empty = _empty_like(spark, "k long, v long")
    assert distributed_cumsum(empty, "k", "v").count() == 0

    one = spark.createDataFrame([(5, 42)], "k long, v long")
    rows = distributed_cumsum(one, "k", "v").collect()
    assert rows[0].cumsum == 42

    # constant key: every row lands in one bucket; running sum must
    # still be correct (tie order via tie_cols)
    same = spark.createDataFrame([(1, i, 1) for i in range(100)], "k long, t long, v long")
    got = distributed_cumsum(same, "k", "v", tie_cols=("t",), n_buckets=8).collect()
    assert sorted(r.cumsum for r in got) == list(range(1, 101))


def test_grid_bbox_join_equals_naive_theta_join(spark):
    """Property: the binned equi-join plan must produce exactly the
    naive theta join's pairs — including boxes spanning MANY grid
    cells (cell much smaller than some boxes) and boundary touches."""
    import random

    from flytemosaic_spark.operators.spatial import grid_bbox_join

    rng = random.Random(42)

    def boxes(n, wmax):
        rows = []
        for i in range(n):
            x, y = rng.uniform(0, 100), rng.uniform(0, 100)
            rows.append(
                (i, x, y, x + rng.uniform(0, wmax), y + rng.uniform(0, wmax))
            )
        return spark.createDataFrame(
            rows, "id long, minx double, miny double, maxx double, maxy double"
        )

    a = boxes(80, 30.0)  # boxes up to 30 wide vs cell 5 -> many cells
    b = boxes(60, 10.0)
    got = {
        (r.a_id, r.b_id)
        for r in grid_bbox_join(
            a.withColumnRenamed("id", "a_id"),
            b.withColumnRenamed("id", "b_id"),
            cell=5.0,
        ).collect()
    }
    want = set()
    for ra in a.collect():
        for rb in b.collect():
            if (
                ra.minx <= rb.maxx
                and rb.minx <= ra.maxx
                and ra.miny <= rb.maxy
                and rb.miny <= ra.maxy
            ):
                want.add((ra.id, rb.id))
    assert got == want


def test_hll_empty_and_single(spark):
    """HLL on an empty frame: grouped form yields no rows; the global
    form follows SQL global-agg semantics (one row, null estimate).
    A single value estimates ~1 via linear counting."""
    from flytemosaic_spark.operators.sketch import hll_distinct

    empty = _empty_like(spark, "v string")
    assert hll_distinct(empty, "v", ["v"]).count() == 0
    assert hll_distinct(empty, "v").first()["hll_estimate"] is None

    one = spark.createDataFrame([("x",)], "v string")
    est = hll_distinct(one, "v").first()["hll_estimate"]
    assert abs(est - 1.0) < 0.01


def test_bpe_degenerate_corpora(spark):
    """Single-char words have no pairs — the learner returns no merges
    instead of failing; an empty corpus likewise."""
    from flytemosaic_spark.operators.bpe import learn_bpe_merges

    empty = _empty_like(spark, "text string")
    assert learn_bpe_merges(empty, rounds=2).count() == 0

    chars = spark.createDataFrame([("a b c",)], "text string")
    assert learn_bpe_merges(chars, rounds=2).count() == 0


def test_pca_constant_vectors(spark):
    """Zero-variance input: covariance is all zeros, the iteration
    stays finite (norm 0 -> division guarded by rounding to null/nan
    is acceptable only if it doesn't throw) — assert no exception and
    64 output rows."""
    from flytemosaic_spark.operators.similarity import pca_power_component

    const = spark.createDataFrame(
        [([0.5] * 64,) for _ in range(4)], "embedding array<float>"
    )
    rows = pca_power_component(const).collect()
    assert len(rows) == 64


def test_extract_patches_crops_odd_sizes(spark):
    """A 10x6 image with patch 4 crops to the covered 2x1 patch grid."""
    import struct

    from flytemosaic_spark.operators.multimodal import (
        _MAGIC,
        extract_patches,
    )

    w, h, c = 10, 6, 1
    payload = _MAGIC + struct.pack("<iiB", w, h, c) + bytes(range(w * h))
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = extract_patches(media, patch=4).collect()
    assert {(r.py, r.px) for r in rows} == {(0, 0), (0, 1)}


def test_roc_auc_hand_computed(spark):
    """AUC against hand-computed values: perfect separation -> 1.0;
    a known tie pattern -> the tie-corrected formula's value."""
    from flytemosaic_spark.operators.metrics import roc_auc

    perfect = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "s long, y long"
    )
    r = roc_auc(perfect, "s", "y").first()
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)

    inverted = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 0), (4, 0)], "s long, y long"
    )
    assert roc_auc(inverted, "s", "y").first().auc == 0.0

    # scores: 1(y=0), 1(y=1), 2(y=0), 2(y=1) — all ties:
    # avg ranks 1.5, 1.5, 3.5, 3.5; rank-sum pos = 5.0;
    # AUC = (5 - 2*3/2) / (2*2) = 0.5
    ties = spark.createDataFrame(
        [(1, 0), (1, 1), (2, 0), (2, 1)], "s long, y long"
    )
    assert roc_auc(ties, "s", "y").first().auc == 0.5


def test_roc_auc_rank_sum_past_int64(spark):
    """Half-rank units overflow int64 near 1e9 rows per slice (sum ~
    n_pos*2N); the DECIMAL(38,0) accumulation must stay exact. Feed
    the counts-level entry point synthetic per-score counts whose
    rank-sum is ~1e21 (the bigint path raised ANSI overflow here) and
    compare to exact integer arithmetic in Python."""
    from flytemosaic_spark.operators.metrics import (
        roc_auc_by_from_counts,
        roc_auc_from_counts,
    )

    scores = list(range(1, 1001))
    n_per, np_per = 50_000_000, 20_000_000  # 5e10 rows total
    v = spark.createDataFrame(
        [(s, n_per, np_per) for s in scores], "sc long, n long, np long"
    )

    # exact reference with unbounded Python ints
    cum, rp2, npos, nneg = 0, 0, 0, 0
    for _ in scores:
        rp2 += np_per * (2 * cum + n_per + 1)
        cum += n_per
        npos += np_per
        nneg += n_per - np_per
    assert rp2 > 2**63 - 1  # the test is vacuous otherwise
    want = (
        __import__("math").floor(
            (rp2 - npos * (npos + 1)) / (2.0 * npos * nneg) * 1e6 + 0.5
        )
        / 1e6
    )

    r = roc_auc_from_counts(v).first()
    assert (r.n_pos, r.n_neg) == (npos, nneg)
    assert r.auc == want

    g = roc_auc_by_from_counts(
        v.selectExpr("'a' AS grp", "sc", "n", "np")
    ).first()
    assert (g.n_pos, g.n_neg, g.auc) == (npos, nneg, want)


def test_gini_rank_weighted_sum_past_int64(spark):
    """The x168 fix's shape: sum(i * cents) accumulates in
    DECIMAL(38,0); with cents ~ 1e15 and ranks ~ 1e4 the bigint sum
    would pass int64 within a few thousand rows."""
    from pyspark.sql import functions as F

    rows = [(i, 10**15 + i) for i in range(1, 5001)]
    df = spark.createDataFrame(rows, "i long, cents long")

    n = len(rows)
    sx = sum(c for _, c in rows)
    six = sum(i * c for i, c in rows)
    assert six > 2**63 - 1
    want = (
        __import__("math").floor(
            (2.0 * six - (n + 1.0) * sx) / (n * float(sx)) * 1e6 + 0.5
        )
        / 1e6
    )

    got = df.agg(
        F.floor(
            (
                F.lit(2.0)
                * F.sum(
                    F.col("i").cast("decimal(38,0)") * F.col("cents")
                ).cast("double")
                - (F.count("*") + F.lit(1.0)) * F.sum("cents")
            )
            / (F.count("*") * F.sum("cents").cast("double"))
            * F.lit(1e6)
            + F.lit(0.5)
        ).alias("g")
    ).first()
    assert got.g / 1e6 == want


def test_spearman_degenerate_inputs(spark):
    from flytemosaic_spark.operators.linear import spearman_corr

    # constant column -> zero variance -> rho NULL (try_divide), n exact
    df = spark.createDataFrame([(1.0, float(i)) for i in range(10)], "x double, y double")
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r.n == 10 and r.rho is None
    # single row -> both variances zero
    one = spark.createDataFrame([(3.0, 4.0)], "x double, y double")
    r1 = spearman_corr(one, "x", "y").collect()[0]
    assert r1.n == 1 and r1.rho is None
    # empty input -> n = 0, rho NULL
    empty = spark.createDataFrame([], "x double, y double")
    r0 = spearman_corr(empty, "x", "y").collect()[0]
    assert r0.n == 0 and r0.rho is None


def test_isotonic_single_bucket_and_empty(spark):
    from flytemosaic_spark.operators.metrics import isotonic_fit

    one = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (0.5, 1)], "score double, label int"
    )
    got = isotonic_fit(one, "score", "label", n_buckets=10).collect()
    assert len(got) == 1
    assert got[0].iso_rate == pytest.approx(2 / 3, abs=1e-6)
    assert got[0].rate == got[0].iso_rate
    empty = spark.createDataFrame([], "score double, label int")
    assert isotonic_fit(empty, "score", "label").collect() == []


def test_frequent_triples_empty_and_all_small_baskets(spark):
    from flytemosaic_spark.operators.recsys import frequent_triples

    # all baskets below the 3-item floor -> no triples, any min_support
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "o long, i long"
    )
    assert frequent_triples(df, "o", "i", min_support=1).collect() == []
    assert frequent_triples(df, "o", "i", min_support=2).collect() == []
    empty = spark.createDataFrame([], "o long, i long")
    assert frequent_triples(empty, "o", "i", min_support=2).collect() == []


def test_kmv_one_side_empty(spark):
    from flytemosaic_spark.operators.sketch import kmv_set_similarity

    df = spark.createDataFrame(
        [(v, "A") for v in range(50)], "v long, s string"
    )
    # side B has no rows: the A/B crossJoin is empty -> no estimate row
    assert kmv_set_similarity(df, "v", "s", "A", "B", k=16).collect() == []


def test_importance_weights_missing_slice(spark):
    from flytemosaic_spark.operators.sampling import importance_weights

    df = spark.createDataFrame(
        [("a", "S")] * 5 + [("b", "S")] * 5, "c string, s string"
    )
    got = {
        r.category: r
        for r in importance_weights(df, "c", "s", "S", "T").collect()
    }
    # no target rows at all: every smoothed ratio collapses to the
    # same prior-over-prior value, clipped within bounds
    assert set(got) == {"a", "b"}
    for r in got.values():
        assert r.n_target == 0 and 0.1 <= r.weight <= 10.0
