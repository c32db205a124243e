"""ANN quality: LSH and IVF top-k must achieve high recall against the
brute-force exact baseline on the real embeddings table — the
correctness contract for the approximate scale paths (probes x3b/x3c).
Also sanity-checks the vector math against numpy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flytemosaic_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    ivf_topk,
    lsh_topk,
)
from flytemosaic_spark.sources.tables import load_table

K = 5
N_QUERIES = 10


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.q_id, set()).add(r.neighbor_id)
    return out


def _recall(got, want):
    hits = sum(len(got.get(q, set()) & w) for q, w in want.items())
    return hits / sum(len(w) for w in want.values())


def test_cosine_matches_numpy(spark, emb):
    rows = (
        emb.where(F.col("vec_id") < 2)
        .crossJoin(
            emb.where((F.col("vec_id") >= 2) & (F.col("vec_id") < 4)).select(
                F.col("vec_id").alias("o_id"), F.col("embedding").alias("other")
            )
        )
        .select(
            "vec_id",
            "o_id",
            cosine(F.col("embedding"), F.col("other")).alias("sim"),
            "embedding",
            "other",
        )
        .collect()
    )
    for r in rows:
        a, b = np.array(r.embedding, "f8"), np.array(r.other, "f8")
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r.sim == pytest.approx(want, rel=1e-9)


def test_lsh_recall_vs_brute_force(spark, emb):
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(brute_force_topk(emb, queries, k=K).collect())
    approx = _topk_sets(lsh_topk(emb, queries, k=K).collect())
    assert _recall(approx, exact) >= 0.5  # 4 tables x 8 planes on sf0.001


def test_ivf_recall_vs_brute_force(spark, emb):
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(brute_force_topk(emb, queries, k=K).collect())
    approx = _topk_sets(ivf_topk(emb, queries, k=K, nprobe=8).collect())
    assert _recall(approx, exact) >= 0.5


def test_approx_results_are_subsets_of_corpus(spark, emb):
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    ids = {r.vec_id for r in emb.select("vec_id").collect()}
    for fn in (lsh_topk, ivf_topk):
        rows = fn(emb, queries, k=K).collect()
        assert rows, f"{fn.__name__} returned nothing"
        assert all(r.neighbor_id in ids and r.q_id != r.neighbor_id for r in rows)
        # ranks are 1..k contiguous per query
        by_q = {}
        for r in rows:
            by_q.setdefault(r.q_id, []).append(r.rank)
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_kmeans_separates_planted_clusters(spark):
    """Three well-separated planted clusters: k-means must recover the
    partition exactly and report near-zero within-cluster distance."""
    import numpy as np

    from flytemosaic_spark.operators.similarity import kmeans

    rng = np.random.default_rng(7)
    centers = np.array([[10.0] * 8, [-10.0] * 8, [10.0] * 4 + [-10.0] * 4])
    rows = []
    for i in range(90):
        c = i % 3
        rows.append((i, (centers[c] + rng.normal(0, 0.1, 8)).astype("float32").tolist()))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    assigned, centroids = kmeans(df, k=3, max_iter=6)
    got = assigned.collect()
    assert len(centroids) == 3 and all(len(c) == 8 for c in centroids)
    # all members of a planted cluster share one label, labels distinct
    label_of = {}
    for r in got:
        label_of.setdefault(r["id"] % 3, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in label_of.values())
    assert len({next(iter(s)) for s in label_of.values()}) == 3
    # tight clusters: squared distance bounded by the noise scale
    assert all(r["dist"] < 1.0 for r in got)


def test_kmeans_assignment_is_nearest_centroid(spark):
    """Every reported (cluster, dist) equals the numpy argmin over the
    returned centroids — the map stage computes true squared L2."""
    import numpy as np

    from flytemosaic_spark.operators.similarity import kmeans

    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(0, 1, 8).astype("float32").tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    assigned, centroids = kmeans(df, k=4, max_iter=3)
    C = np.array(centroids)
    vecs = {i: np.array(v, dtype=np.float64) for i, v in rows}
    for r in assigned.collect():
        d2 = ((C - vecs[r["id"]]) ** 2).sum(axis=1)
        assert r["cluster"] == int(d2.argmin())
        assert r["dist"] == pytest.approx(float(d2.min()), rel=1e-6)


def test_pq_recall_vs_brute_force(spark, emb):
    from flytemosaic_spark.operators.similarity import pq_topk

    queries = emb.where(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(brute_force_topk(emb, queries, k=K).collect())
    approx = _topk_sets(pq_topk(emb, queries, k=K).collect())
    # ADC shortlist (4x over-fetch) + exact re-rank: high recall
    assert _recall(approx, exact) >= 0.8


def test_pq_reported_sims_are_exact(spark, emb):
    """Re-ranked sims must equal the brute-force cosine for the same
    (query, neighbor) pair — PQ approximates the candidate set, never
    the reported similarity."""
    from flytemosaic_spark.operators.similarity import pq_topk

    queries = emb.where(F.col("vec_id") < 3)
    exact = {
        (r.q_id, r.neighbor_id): r.sim
        for r in brute_force_topk(emb, queries, k=50).collect()
    }
    for r in pq_topk(emb, queries, k=K).collect():
        key = (r.q_id, r.neighbor_id)
        if key in exact:
            assert abs(r.sim - exact[key]) < 1e-9


def test_ivf_pq_recall_vs_brute_force(spark, emb):
    from flytemosaic_spark.operators.similarity import ivf_pq_topk

    queries = emb.where(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(brute_force_topk(emb, queries, k=K).collect())
    approx = _topk_sets(ivf_pq_topk(emb, queries, k=K).collect())
    # bounded by IVF pruning (nprobe/n_centroids of the corpus seen)
    assert _recall(approx, exact) >= 0.5


def test_persisted_pq_index_matches_inline(spark, emb, tmp_path):
    """build-once/query-many: results from the persisted index equal
    the inline pq_topk run with the same parameters (same codebook
    training order, same encode, same re-rank)."""
    from flytemosaic_spark.operators.similarity import (
        build_pq_index,
        pq_index_topk,
        pq_topk,
    )

    queries = emb.where(F.col("vec_id") < 5)
    idx = str(tmp_path / "pq_index")
    build_pq_index(emb, idx)
    got = sorted(
        map(tuple, pq_index_topk(spark, idx, emb, queries, k=K).collect())
    )
    want = sorted(map(tuple, pq_topk(emb, queries, k=K).collect()))
    assert got == want


def test_pq_index_upsert_equals_fixed_codebook_rebuild(spark, emb, tmp_path):
    """Incremental maintenance: build on corpus C, upsert delta D ->
    codes.parquet equals a full rebuild over C ∪ D with train_on=C
    (encoding is a pure function of codebooks x vector), and querying
    the upserted index equals querying that rebuild."""
    from flytemosaic_spark.operators.similarity import (
        build_pq_index,
        pq_index_topk,
        upsert_pq_index,
    )

    c = emb.where(F.col("vec_id") % 5 != 0).cache()
    d = emb.where(F.col("vec_id") % 5 == 0).cache()
    inc = str(tmp_path / "inc")
    build_pq_index(c, inc)
    stats = upsert_pq_index(spark, d, inc)
    assert stats["inserted"] == d.count() and stats["updated"] == 0

    full = str(tmp_path / "full")
    build_pq_index(emb, full, train_on=c)
    got = sorted(
        map(tuple, spark.read.parquet(inc + "/codes.parquet").collect())
    )
    want = sorted(
        map(tuple, spark.read.parquet(full + "/codes.parquet").collect())
    )
    assert got == want

    queries = emb.where(F.col("vec_id") < 5)
    qi = sorted(map(tuple, pq_index_topk(spark, inc, emb, queries, k=K).collect()))
    qf = sorted(map(tuple, pq_index_topk(spark, full, emb, queries, k=K).collect()))
    assert qi == qf


def test_pq_index_upsert_rerun_is_empty(spark, emb, tmp_path):
    """The J4 idempotency contract: re-running the same upsert reports
    zero changes and does not rewrite the files; an actual vector
    change for an existing id reports updated=1."""
    import os

    from flytemosaic_spark.operators.similarity import (
        build_pq_index,
        upsert_pq_index,
    )

    c = emb.where(F.col("vec_id") % 5 != 0)
    d = emb.where(F.col("vec_id") % 5 == 0)
    idx = str(tmp_path / "idx")
    build_pq_index(c, idx)
    first = upsert_pq_index(spark, d, idx)
    assert first["inserted"] > 0

    codes = idx + "/codes.parquet"
    before = {
        n: os.path.getmtime(os.path.join(codes, n)) for n in os.listdir(codes)
    }
    again = upsert_pq_index(spark, d, idx)
    assert again["inserted"] == 0 and again["updated"] == 0
    assert again["unchanged"] == d.count()
    after = {
        n: os.path.getmtime(os.path.join(codes, n)) for n in os.listdir(codes)
    }
    assert after == before  # untouched, not just equivalent

    changed = d.limit(1).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    third = upsert_pq_index(spark, changed, idx)
    assert third == {"inserted": 0, "updated": 1, "unchanged": 0}
