"""Dedup-family properties: MinHash-LSH recall against the exact
n-gram Jaccard oracle, SimHash locality, and exact-dedup semantics —
the quality contracts behind probes x1/x2/x2b/x2c/x11."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flytemosaic_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from flytemosaic_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_exact_dedup_semantics(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa"), (5, "cc")],
        "doc_id int, text string",
    )
    rows = {r.keeper: r.n_copies for r in exact_dedup(df).collect()}
    assert rows == {1: 3, 2: 1, 5: 1}


def test_minhash_lsh_recall_vs_exact_jaccard(spark, docs):
    """Every strongly-similar pair (true Jaccard >= 0.7) must surface
    as an LSH candidate, and the minhash estimate must be close."""
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    strong = {k for k, j in exact.items() if j >= 0.7}
    assert strong, "fixture data should contain strong near-dups"
    cand = {
        (r.id_a, r.id_b): r.est_jaccard for r in minhash_lsh_pairs(docs).collect()
    }
    found = strong & set(cand)
    assert len(found) / len(strong) >= 0.9
    for k in found:
        assert cand[k] == pytest.approx(exact[k], abs=0.25)


def test_simhash_locality(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    variant = base.replace("lazy", "sleepy", 1)  # one token changed
    other = "completely different text about spark shuffles and joins " * 8
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, variant), (4, other)], "doc_id int, text string"
    )
    h = {r.id: r.simhash for r in simhash(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert h[1] == h[2]  # identical docs -> identical sketch
    assert ham(h[1], h[3]) <= 8  # near-identical -> close
    assert ham(h[1], h[4]) > ham(h[1], h[3])  # unrelated -> farther


def _numpy_pairs(vecs, threshold):
    want = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = vecs[a], vecs[b]
            c = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 4)
            if c >= threshold:
                want[(a, b)] = c
    return want


def test_embedding_neardup_matches_numpy(spark, sf_dir):
    # threshold 0.3 so real testdata pairs exist (max pair sim ~0.5 —
    # a 0.9 threshold would make this test vacuous)
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    vecs = {r.vec_id: np.array(r.embedding, "f8") for r in emb.collect()}
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_pairs(emb, threshold=0.3).collect()
    }
    want = _numpy_pairs(vecs, 0.3)
    assert len(want) > 0  # non-vacuous
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-4)


def test_embedding_neardup_block_counts_invariant(spark, sf_dir):
    # the block-pair decomposition emits each qualifying pair exactly
    # once regardless of block count (1 block == brute force)
    emb = load_table(spark, sf_dir, "embeddings").limit(80)
    ref = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_neardup_pairs(emb, threshold=0.3, n_blocks=1).collect()
    )
    for nb in (3, 8):
        got = sorted(
            (r.id_a, r.id_b, r.cosine)
            for r in embedding_neardup_pairs(emb, threshold=0.3, n_blocks=nb).collect()
        )
        assert got == ref


def test_embedding_neardup_lsh_finds_planted_dups(spark, sf_dir):
    # plant perturbed copies (cosine >= ~0.99) so the high-threshold
    # path is non-vacuous, then check LSH candidates -> exact refine
    # returns the identical pair set to exact brute force at 0.9
    from flytemosaic_spark.operators.dedup import embedding_neardup_pairs_lsh

    rows = load_table(spark, sf_dir, "embeddings").limit(60).collect()
    rng = np.random.default_rng(7)
    data = [(r.vec_id, [float(x) for x in r.embedding]) for r in rows]
    for r in rows[:10]:  # 10 planted near-dups
        v = np.array(r.embedding, "f8")
        v = v + rng.normal(0, 0.02 * np.linalg.norm(v) / np.sqrt(len(v)), len(v))
        data.append((r.vec_id + 100000, [float(x) for x in v]))
    emb = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    vecs = {i: np.array(v, "f8") for i, v in data}
    want = _numpy_pairs(vecs, 0.9)
    assert len(want) >= 10
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_pairs(emb, threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_pairs_lsh(emb, threshold=0.9).collect()
    }
    assert set(exact) == set(want)
    assert lsh == exact  # recall 1.0 at this config on planted dups


def _unionfind(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_star_components_match_unionfind(spark):
    from flytemosaic_spark.operators.dedup import connected_components_star
    import random

    random.seed(3)
    cases = [
        [(i, i + 1) for i in range(200)],  # diameter >> min-label budget
        [(i + 1, i) for i in range(150)],  # descending ids
        [(i, (i + 1) % 300) for i in range(300)],  # big cycle
        [(random.randrange(400), random.randrange(400)) for _ in range(500)],
    ]
    for e in cases:
        e = [(a, b) for a, b in e if a != b]
        df = spark.createDataFrame(e, "src long, dst long")
        got = dict(map(tuple, connected_components_star(df).collect()))
        assert got == _unionfind(e)


def test_min_label_components_long_chains(spark, monkeypatch):
    # r10: below the driver union-find gate a 200-node path is solved
    # exactly (no iteration budget); past the gate (forced here) the
    # propagation loop must still fail loudly rather than return a
    # silently wrong labeling
    import flytemosaic_spark.operators.dedup as dedup
    from flytemosaic_spark.operators.dedup import connected_components

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "src long, dst long"
    )
    rows = connected_components(df).collect()
    assert len(rows) == 201 and all(r.lbl == 0 for r in rows)
    monkeypatch.setattr(dedup, "_DRIVER_CC_EDGE_LIMIT", 0)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df).collect()


def test_star_components_keep_self_loop_only_nodes(spark):
    # a node appearing ONLY in a self-loop edge must still be labeled
    # (with itself) — same contract as connected_components' symmetric
    # adjacency, which labels such nodes via the (n, n) edge
    from flytemosaic_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(1, 2), (7, 7), (2, 3)], "src long, dst long"
    )
    star = dict(map(tuple, connected_components_star(df).collect()))
    base = dict(map(tuple, connected_components(df).collect()))
    assert star == base == {1: 1, 2: 1, 3: 1, 7: 7}


def test_star_components_raise_when_budget_exhausted(spark):
    # mirror connected_components: never return labels from a
    # possibly non-star edge set
    from flytemosaic_spark.operators.dedup import connected_components_star

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="star fixpoint"):
        connected_components_star(df, max_iter=1).collect()


def test_embedding_neardup_dispatcher_routes_on_threshold(spark, sf_dir):
    # the threshold dispatcher must agree with whichever pinned route
    # it picks: LSH at >= 0.7 (planted dups), exact grid below
    from flytemosaic_spark.operators.dedup import (
        embedding_neardup,
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    rows = load_table(spark, sf_dir, "embeddings").limit(50).collect()
    data = [(r.vec_id, [float(x) for x in r.embedding]) for r in rows]
    for r in rows[:8]:
        v = [float(x) * 1.01 for x in r.embedding]  # cosine == 1.0
        data.append((r.vec_id + 100000, v))
    emb = spark.createDataFrame(data, "vec_id long, embedding array<double>")

    hi = sorted(map(tuple, embedding_neardup(emb, threshold=0.9).collect()))
    hi_pinned = sorted(
        map(tuple, embedding_neardup_pairs_lsh(emb, threshold=0.9).collect())
    )
    assert hi == hi_pinned and len(hi) >= 8

    lo = sorted(map(tuple, embedding_neardup(emb, threshold=0.3).collect()))
    lo_pinned = sorted(
        map(tuple, embedding_neardup_pairs(emb, threshold=0.3).collect())
    )
    assert lo == lo_pinned and len(lo) > len(hi)


class TestWinnowDedup:
    """Exact-substring dedup via winnowing (SIGMOD'03): the provable
    guarantee, the Spark == python-twin contract, and the alignment
    case fixed-stride windows miss."""

    def test_planted_plagiarism_guarantee(self):
        import random

        from flytemosaic_spark.operators.dedup import winnow_py

        random.seed(11)
        w, p = 24, 8
        for trial in range(150):
            n = random.randint(w + p - 1, 150)
            passage = "".join(
                random.choice("abcdefgh ") for _ in range(n)
            )
            a = (
                "".join(random.choice("uvw") for _ in
                        range(random.randint(0, 90)))
                + passage
                + "".join(random.choice("qrs") for _ in
                          range(random.randint(0, 90)))
            )
            b = (
                "".join(random.choice("mno") for _ in
                        range(random.randint(0, 60)))
                + passage
                + "".join(random.choice("jkl") for _ in
                          range(random.randint(0, 60)))
            )
            ha = {h for h, _ in winnow_py(a, w, p)}
            hb = {h for h, _ in winnow_py(b, w, p)}
            assert ha & hb, (trial, n)

    def test_below_threshold_no_guarantee_needed(self):
        from flytemosaic_spark.operators.dedup import winnow_py

        assert winnow_py("short text", 24, 8) == set()

    def test_spark_matches_twin(self, spark):
        import random

        from flytemosaic_spark.operators.dedup import (
            winnow_fingerprints,
            winnow_py,
        )

        random.seed(7)
        rows = [
            (k, "".join(random.choice("abcdef gh") for _ in
                        range(random.randint(31, 200))))
            for k in range(10)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r in winnow_fingerprints(df).collect():
            got.setdefault(r["doc_id"], set()).add((r["h"], r["pos"]))
        for k, t in rows:
            assert got.get(k, set()) == winnow_py(t), k

    def test_catches_alignment_fixed_stride_misses(self, spark):
        from pyspark.sql import functions as F

        from flytemosaic_spark.operators.dedup import winnow_fingerprints

        # same 40-char passage at offsets differing by 1 (not a
        # multiple of x38's stride 20): stride windows sample
        # different substrings, winnowing still shares a fingerprint
        passage = "the quick brown fox jumps over the lazy"
        a = "X" * 20 + passage + "Y" * 20
        b = "Z" * 21 + passage + "W" * 20
        df = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string"
        )
        fp = winnow_fingerprints(df)
        shared = (
            fp.alias("a")
            .join(fp.alias("b"), "h")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .count()
        )
        assert shared >= 1

    def test_dup_frac_rollup(self, spark):
        from flytemosaic_spark.operators.dedup import winnow_dedup_stats

        base = "completely original content with enough length here"
        df = spark.createDataFrame(
            [(1, base), (2, base)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in winnow_dedup_stats(df).collect()}
        # doc 1 is the first occurrence everywhere; doc 2 all-dup
        assert out[1]["dup_frac"] == 0.0
        assert out[2]["dup_frac"] == 1.0
        assert out[1]["n_fp"] == out[2]["n_fp"]


class TestWinnowApply:
    """Duplicate-span REMOVAL (winnow_dedup_apply): removed covers the
    planted copy's core, the first occurrence is kept verbatim, and
    Spark matches the python twin on random corpora."""

    def test_removed_superset_of_planted_core(self):
        import random

        from flytemosaic_spark.operators.dedup import winnow_apply_py

        random.seed(23)
        w, p = 24, 8
        for trial in range(60):
            n = random.randint(w + p - 1, 160)
            passage = "".join(
                random.choice("abcdefgh ") for _ in range(n)
            )
            pre_a = "".join(
                random.choice("uvw") for _ in range(random.randint(0, 70))
            )
            a = pre_a + passage + "".join(
                random.choice("qrs") for _ in range(random.randint(0, 70))
            )
            pre_b = "".join(
                random.choice("mno") for _ in range(random.randint(0, 50))
            )
            b = pre_b + passage + "".join(
                random.choice("jkl") for _ in range(random.randint(0, 50))
            )
            cleaned = winnow_apply_py({1: a, 2: b}, w, p)
            # kept-first: doc 1 (lower id) keeps its copy verbatim
            assert passage in cleaned[1], trial
            # removed >= planted core: the copy in doc 2 is gone
            # except for at most p-1 chars at each boundary
            core = passage[p - 1 : n - (p - 1)]
            if len(core) >= w:
                assert core not in cleaned[2], (trial, n)
            # chars outside the planted region survive in doc 2 up to
            # window bleed (<= w-1 chars adjacent to the copy)
            assert cleaned[2].startswith(pre_b[: max(0, len(pre_b) - w + 1)])

    def test_spark_matches_twin(self, spark):
        import random

        from flytemosaic_spark.operators.dedup import (
            winnow_apply_py,
            winnow_dedup_apply,
        )

        random.seed(31)
        # corpus with planted cross-doc and intra-doc duplication
        passage = "shared duplicated passage of exactly enough length!"
        rows = []
        for k in range(12):
            t = "".join(
                random.choice("abcdef gh") for _ in
                range(random.randint(31, 180))
            )
            if k % 3 == 1:
                t = t[:20] + passage + t[20:]
            if k % 4 == 2:
                t = t + passage + passage  # intra-doc repeat too
            rows.append((k, t))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_removed"])
            for r in winnow_dedup_apply(df).collect()
        }
        want = winnow_apply_py({k: t for k, t in rows})
        assert len(got) == len(rows)
        for k, t in rows:
            assert got[k][0] == want[k], k
            assert got[k][2] == len(t) - len(want[k]), k

    def test_short_and_unique_docs_pass_through(self, spark):
        from flytemosaic_spark.operators.dedup import winnow_dedup_apply

        rows = [
            (1, "tiny"),
            (2, "a perfectly unique document body with no twin at all"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in winnow_dedup_apply(df).collect()}
        for k, t in rows:
            assert got[k]["clean_text"] == t
            assert got[k]["n_spans"] == 0 and got[k]["n_removed"] == 0
