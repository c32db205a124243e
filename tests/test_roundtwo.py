"""Round-2 operators: interval merge, triangle counting, prefix-filter
set-similarity join, count-min sketch. Each tested against a naive /
hand-computed reference and for its scale-relevant invariants."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from flytemosaic_spark.operators.cms import (
    cms_build,
    cms_estimate,
    merge_cms_states,
)
from flytemosaic_spark.operators.dedup import prefix_jaccard_pairs
from flytemosaic_spark.operators.graph import triangle_count
from flytemosaic_spark.operators.intervals import merge_intervals


# ---------------------------------------------------------------- intervals
def _iv(spark, rows):
    return spark.createDataFrame(
        [(k, i, float(s), float(e)) for i, (k, s, e) in enumerate(rows)],
        "k string, rid long, s double, e double",
    )


def test_merge_intervals_basic(spark):
    rows = [
        ("a", 0, 10), ("a", 5, 12), ("a", 12, 20),  # touching merges
        ("a", 30, 35),
        ("b", 0, 1),
    ]
    out = merge_intervals(
        _iv(spark, rows), ["k"], "s", "e", "rid"
    ).orderBy("k", "island_start").collect()
    got = [(r.k, r.island_start, r.island_end, r.n_merged) for r in out]
    assert got == [
        ("a", 0.0, 20.0, 3),
        ("a", 30.0, 35.0, 1),
        ("b", 0.0, 1.0, 1),
    ]


def test_merge_intervals_contained_and_out_of_order(spark):
    # an interval fully inside an earlier one must not split the island
    rows = [("a", 0, 100), ("a", 10, 20), ("a", 50, 60), ("a", 99, 150)]
    out = merge_intervals(_iv(spark, rows), ["k"], "s", "e", "rid").collect()
    assert len(out) == 1
    assert (out[0].island_start, out[0].island_end, out[0].n_merged) == (
        0.0, 150.0, 4,
    )


def test_merge_intervals_coverage_invariant(spark):
    # islands are disjoint and cover every input interval
    import random

    rng = random.Random(7)
    rows = [("k", s := rng.randrange(0, 500), s + rng.randrange(1, 40))
            for _ in range(200)]
    islands = sorted(
        (r.island_start, r.island_end)
        for r in merge_intervals(_iv(spark, rows), ["k"], "s", "e", "rid")
        .collect()
    )
    for (s1, e1), (s2, e2) in itertools.pairwise(islands):
        assert e1 < s2  # strictly disjoint with a real gap
    for s, e in [(r[1], r[2]) for r in rows]:
        assert any(i_s <= s and e <= i_e for i_s, i_e in islands)


# ---------------------------------------------------------------- triangles
def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _naive_triangles(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = sorted({n for e in und for n in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in und and (a, c) in und and (b, c) in und
    )


def test_triangle_count_known_graphs(spark):
    # K4 has 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    assert triangle_count(_edges(spark, k4)).collect()[0].n_triangles == 4
    # a 5-cycle has none
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    assert triangle_count(_edges(spark, cyc)).collect()[0].n_triangles == 0


def test_triangle_count_random_vs_naive(spark):
    import random

    rng = random.Random(13)
    pairs = [(rng.randrange(0, 25), rng.randrange(0, 25)) for _ in range(160)]
    got = triangle_count(_edges(spark, pairs)).collect()[0].n_triangles
    assert got == _naive_triangles(pairs)


def test_triangle_count_ignores_duplicates_and_direction(spark):
    tri = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3), (1, 1)]
    assert triangle_count(_edges(spark, tri)).collect()[0].n_triangles == 1


def test_triangle_paths_agree_past_broadcast_gate(spark, monkeypatch):
    # r11: past _BROADCAST_EDGE_LIMIT the adjacency join switches from
    # broadcast to shuffled-hash — both paths must enumerate the same
    # triangles (forced-fallback equality, the spearman-gate pattern)
    import random

    import flytemosaic_spark.operators.graph as graph

    rng = random.Random(29)
    pairs = [(rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(220)]
    from flytemosaic_spark.operators.graph import clustering_coefficient

    fast = clustering_coefficient(_edges(spark, pairs)).orderBy("node").collect()
    monkeypatch.setattr(graph, "_BROADCAST_EDGE_LIMIT", 0)
    slow = clustering_coefficient(_edges(spark, pairs)).orderBy("node").collect()
    assert fast == slow and len(fast) > 0


# ------------------------------------------------------------- prefix join
def _sets_df(spark, sets):
    return spark.createDataFrame(
        [(i, list(s)) for i, s in sets.items()],
        "doc_id long, els array<string>",
    )


def _naive_jaccard_pairs(sets, t):
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = set(sets[a]), set(sets[b])
        j = len(sa & sb) / len(sa | sb)
        if j >= t:
            out[(a, b)] = round(j, 4)
    return out


def test_prefix_jaccard_equals_brute_force(spark):
    import random

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(40)]
    sets = {
        i: rng.sample(vocab, rng.randrange(3, 15)) for i in range(60)
    }
    for t in (0.3, 0.5, 0.8):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in prefix_jaccard_pairs(
                _sets_df(spark, sets), "els", "doc_id", t
            ).collect()
        }
        want = _naive_jaccard_pairs(sets, t)
        assert got.keys() == want.keys()
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9


def test_prefix_jaccard_identical_and_disjoint(spark):
    sets = {1: ["a", "b", "c"], 2: ["a", "b", "c"], 3: ["x", "y"]}
    got = prefix_jaccard_pairs(_sets_df(spark, sets), "els", "doc_id", 0.9)
    rows = got.collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


# -------------------------------------------------------------------- CMS
def test_cms_never_underestimates_and_exact_when_sparse(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 50).alias("k")  # 50 keys x 60 rows, 256 slots
    )
    state = cms_build(df, "k")
    est = {r.k: r.est for r in cms_estimate(df, state, "k").collect()}
    assert set(est) == set(range(50))
    for k, e in est.items():
        assert e >= 60  # CMS never undercounts
    # with 50 keys in 256 slots, min-over-4-rows is exact for most keys
    assert sum(1 for e in est.values() if e == 60) >= 40


def test_cms_merge_equals_direct(spark):
    a = spark.range(0, 1000).select((F.col("id") % 31).alias("k"))
    b = spark.range(1000, 2500).select((F.col("id") % 17).alias("k"))
    direct = cms_build(a.unionAll(b), "k")
    merged = merge_cms_states(cms_build(a, "k"), cms_build(b, "k"))
    d = {(r.d, r.slot): r.cnt for r in direct.collect()}
    m = {(r.d, r.slot): r.cnt for r in merged.collect()}
    assert d == m


def test_cms_state_is_bounded(spark):
    df = spark.range(0, 20000).select(F.col("id").alias("k"))  # 20k keys
    state = cms_build(df, "k")
    assert state.count() <= 4 * 256
    total = state.groupBy("d").agg(F.sum("cnt").alias("s")).collect()
    assert all(r.s == 20000 for r in total)  # each row preserves mass


# ---------------------------------------------------------- hard negatives
def test_hard_negatives_cross_label_and_matches_bruteforce(spark):
    import random

    from flytemosaic_spark.operators.similarity import (
        brute_force_topk,
        hard_negatives,
    )

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(80)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    queries = emb.where(F.col("vec_id") < 6)
    got = hard_negatives(emb, queries, k=4).collect()
    labels = {r[0]: r[2] for r in rows}
    for r in got:
        assert labels[r.q_id] != labels[r.neighbor_id]
    # equals: filter the full ranking to cross-label pairs, re-rank, cut k
    full = brute_force_topk(emb, queries, k=len(rows)).collect()
    want = {}
    for r in sorted(full, key=lambda r: (r.q_id, r.rank)):
        if labels[r.q_id] != labels[r.neighbor_id]:
            lst = want.setdefault(r.q_id, [])
            if len(lst) < 4:
                lst.append((r.neighbor_id, r.sim))
    got_m = {}
    for r in got:
        got_m.setdefault(r.q_id, []).append((r.neighbor_id, r.sim))
    for qid in want:
        assert sorted(got_m[qid]) == sorted(want[qid])


# ------------------------------------------------------------- empty inputs
def test_new_operators_tolerate_empty_input(spark):
    empty_iv = _iv(spark, []).limit(0)
    assert merge_intervals(empty_iv, ["k"], "s", "e", "rid").count() == 0
    assert (
        triangle_count(_edges(spark, [(1, 2)])).collect()[0].n_triangles == 0
    )
    empty_sets = _sets_df(spark, {}).limit(0)
    assert prefix_jaccard_pairs(empty_sets, "els", "doc_id", 0.5).count() == 0
    empty_keys = spark.range(0).select(F.col("id").alias("k"))
    assert cms_build(empty_keys, "k").count() == 0


# ------------------------------------------------------------- zonal stats
def test_zonal_stats_vs_bruteforce(spark):
    import random

    from flytemosaic_spark.operators.spatial import zonal_stats

    rng = random.Random(11)
    pts = [
        (rng.uniform(0, 100), rng.uniform(0, 100), rng.uniform(-5, 5))
        for _ in range(400)
    ]
    boxes = []
    for zid in range(12):
        x0, y0 = rng.uniform(0, 90), rng.uniform(0, 90)
        boxes.append((zid, x0, y0, x0 + rng.uniform(5, 30), y0 + rng.uniform(5, 30)))
    px = spark.createDataFrame(pts, "x double, y double, value double")
    zn = spark.createDataFrame(
        boxes, "zone_id long, minx double, miny double, maxx double, maxy double"
    )
    got = {
        r.zone_id: (r.n_pixels, r.mean_value, r.min_value, r.max_value)
        for r in zonal_stats(px, zn, cell=10.0).collect()
    }
    for zid, x0, y0, x1, y1 in boxes:
        vs = [v for x, y, v in pts if x0 <= x <= x1 and y0 <= y <= y1]
        if not vs:
            assert zid not in got
            continue
        n, mean, lo, hi = got[zid]
        assert n == len(vs)
        assert abs(mean - sum(vs) / len(vs)) < 1e-9
        assert lo == min(vs) and hi == max(vs)


def test_zonal_stats_overlapping_zones_double_count(spark):
    from flytemosaic_spark.operators.spatial import zonal_stats

    px = spark.createDataFrame(
        [(5.0, 5.0, 2.0)], "x double, y double, value double"
    )
    zn = spark.createDataFrame(
        [(1, 0.0, 0.0, 10.0, 10.0), (2, 4.0, 4.0, 6.0, 6.0)],
        "zone_id long, minx double, miny double, maxx double, maxy double",
    )
    got = {r.zone_id: r.n_pixels for r in zonal_stats(px, zn, 3.0).collect()}
    assert got == {1: 1, 2: 1}


def test_clustering_coefficient_known_graph(spark):
    from flytemosaic_spark.operators.graph import clustering_coefficient

    # K4 minus one edge (1-3): nodes 0,2 see 1 triangle of C(3,2)=3
    # possible; nodes 1,3 have deg 2 with their single wedge closed
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3)]
    got = {
        r.node: (r.deg, r.n_tri, round(r.cc, 6))
        for r in clustering_coefficient(_edges(spark, pairs)).collect()
    }
    assert got == {
        0: (3, 2, round(2 / 3, 6)),
        1: (2, 1, 1.0),
        2: (3, 2, round(2 / 3, 6)),
        3: (2, 1, 1.0),
    }
