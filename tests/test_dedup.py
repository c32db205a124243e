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


def test_embedding_neardup_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, "f8") for r in rows}
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_pairs(emb, threshold=0.9).collect()
    }
    want = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = vecs[a], vecs[b]
            c = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 4)
            if c >= 0.9:
                want[(a, b)] = c
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-4)
