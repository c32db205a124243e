"""Unit tests for the round-5 operators: label propagation semantics,
int8 quantization error bound, semdedup partition invariants, and
packing-efficiency bounds. The full-value correctness of every probe
is oracle-checked by the driver gate; these tests pin the semantic
properties the oracle cannot express (hand-built graphs, error
bounds, invariants under permutation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flytemosaic_spark.operators.graph import label_propagation
from flytemosaic_spark.probes.registry import all_probes

SF001 = "/root/testdata/sf0.01"


def test_lpa_majority_wins(spark):
    # hub node 5 (init label 5) is connected to three label-1 nodes
    # (11, 21, 31) and one label-2 node (12): majority label 1 wins.
    und = [(5, 11), (5, 21), (5, 31), (5, 12), (11, 21)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], ["src", "dst"]
    )
    out = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=1, init_mod=10).collect()
    }
    assert out[5] == 1
    # 11's neighbors are 5 (label 5) and 21 (label 1): tie -> min label 1
    assert out[11] == 1
    # 12's only neighbor is 5 (label 5)
    assert out[12] == 5


def test_lpa_tie_breaks_to_smallest_label(spark):
    und = [(100, 11), (100, 22)]  # neighbor labels {1, 2}, one vote each
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], ["src", "dst"]
    )
    out = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=1, init_mod=10).collect()
    }
    assert out[100] == 1


def test_lpa_directed_keeps_all_nodes(spark):
    # directed chain 7 -> 3 -> 14: node 7 has no in-edges, so it must
    # appear in the output with its INITIAL label (7 % 10), not vanish;
    # after 2 rounds 3 adopts 7's label and 14 adopts 3's round-1 label
    edges = spark.createDataFrame([(7, 3), (3, 14)], ["src", "dst"])
    out = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=2, init_mod=10).collect()
    }
    assert set(out) == {7, 3, 14}  # full src ∪ dst node set, every round
    assert out[7] == 7  # no labeled in-neighbor -> keeps its own label
    assert out[3] == 7  # adopted from its only in-neighbor
    assert out[14] == 7  # round 2: 3 already carries label 7


def test_lpa_deterministic_across_runs(spark):
    edges = spark.range(0, 200).select(
        (F.col("id") % 50).alias("src"), ((F.col("id") * 7) % 50).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    a = sorted(label_propagation(edges, iterations=2).collect())
    b = sorted(label_propagation(edges, iterations=2).collect())
    assert a == b


def test_int8_quant_error_bounded_by_half_step(spark):
    # reconstruction error of round-to-nearest on a 255-step grid is
    # at most step/2 (+ the 1e-9 reporting grain)
    probe = all_probes()["x134_int8_quantization"]
    rows = probe.fn(spark, SF001).collect()
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    mm = (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy((F.col("pos") + 1).alias("dim"))
        .agg((F.max("col") - F.min("col")).alias("rng"))
    )
    rng = {r["dim"]: r["rng"] for r in mm.collect()}
    assert len(rows) == 64
    for r in rows:
        half_step = rng[r["dim"]] / 255.0 / 2.0
        assert r["max_abs_err_u"] <= half_step + 1e-6
        assert 0.0 <= r["avg_abs_err_u"] <= r["max_abs_err_u"]


def test_semdedup_partition_invariants(spark):
    probe = all_probes()["x129_semdedup"]
    rows = probe.fn(spark, SF001).collect()
    # every vector lands in exactly one cluster
    assert sum(r["n_members"] for r in rows) == 500
    for r in rows:
        # can never drop more members than exist beyond the keeper
        assert 0 <= r["n_dropped"] <= max(r["n_members"] - 1, 0)
        assert r["n_dup_pairs"] >= r["n_dropped"]


def test_packing_efficiency_bounds(spark):
    probe = all_probes()["x135_packing_efficiency"]
    rows = probe.fn(spark, SF001).collect()
    assert {r["bucket"] for r in rows} == set(range(8))
    for r in rows:
        assert 0.0 < r["fill_ratio"] <= 1.0
        # n_packs is exactly ceil(total/256)
        assert r["n_packs"] == -(-r["total_tokens"] // 256)


def test_logreg_learns_separating_sign(spark):
    from flytemosaic_spark.operators.linear import logreg_train_gd

    # y = 1 iff x > 0: gradient descent must push w_x positive and
    # keep the bias near zero on a balanced sample
    rows = [(float(x), 1.0 if x > 0 else 0.0) for x in range(-50, 50) if x != 0]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = logreg_train_gd(df, ["x"], label_col="y", lr=0.1, iterations=5).first()
    assert out["w_x"] > 0.0
    assert abs(out["w_bias"]) < abs(out["w_x"])


def test_logreg_deterministic_across_partitionings(spark):
    from flytemosaic_spark.operators.linear import logreg_train_gd

    rows = [(float(x % 7) - 3.0, float(x % 2)) for x in range(200)]
    a = logreg_train_gd(
        spark.createDataFrame(rows, ["x", "y"]).repartition(1), ["x"]
    ).first()
    b = logreg_train_gd(
        spark.createDataFrame(rows, ["x", "y"]).repartition(13), ["x"]
    ).first()
    assert a == b  # integer-quantized gradients are order-independent


def test_skipgram_pairs_window2(spark):
    from flytemosaic_spark.probes.registry import all_probes
    import pyspark.sql.functions as F

    docs = spark.createDataFrame([(1, "a b c", "en", "s", 5)],
                                 "doc_id long, text string, lang string, source string, n_chars long")
    import tempfile, os
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = all_probes()["x137_skipgram_pairs"].fn(spark, d).collect()
    got = {(r["center"], r["context"]): r["n_pairs"] for r in out}
    # forward pairs (a,b),(a,c),(b,c) symmetrized
    assert got == {
        ("a", "b"): 1, ("b", "a"): 1,
        ("a", "c"): 1, ("c", "a"): 1,
        ("b", "c"): 1, ("c", "b"): 1,
    }


def test_grid_density_recovers_planted_blobs(spark):
    from flytemosaic_spark.probes.registry import all_probes
    import tempfile, os

    # blob A: two ADJACENT dense cells (16 pts each) -> one merged
    # cluster of 32; blob B: one dense cell of 20, far away; 4 noise
    # points in cells below minPts disappear
    rows = (
        [(i, [0.05, 0.05] + [0.0] * 62, 0) for i in range(16)]
        + [(100 + i, [0.15, 0.05] + [0.0] * 62, 0) for i in range(16)]
        + [(200 + i, [3.05, 3.05] + [0.0] * 62, 0) for i in range(20)]
        + [(900 + i, [5.0 + i, -5.0 - i] + [0.0] * 62, 0) for i in range(4)]
    )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    out = all_probes()["x138_grid_density_clusters"].fn(spark, d).collect()
    by_pts = sorted((r["n_points"], r["n_cells"]) for r in out)
    assert by_pts == [(20, 1), (32, 2)]


def test_tfidf_docsim_identical_docs_rank_first(spark):
    from flytemosaic_spark.probes.registry import all_probes
    import tempfile, os

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "en", "s", 16),
            (10, "alpha beta gamma", "en", "s", 16),   # identical to 0
            (11, "alpha beta delta", "en", "s", 16),   # 2/3 overlap
            (12, "zeta eta theta", "en", "s", 14),     # disjoint
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = all_probes()["x139_tfidf_docsim"].fn(spark, d).collect()
    q0 = {r["rnk"]: (r["neighbor_id"], r["sim"]) for r in out if r["q_id"] == 0}
    assert q0[1][0] == 10 and q0[1][1] == 1.0   # exact copy first, sim 1
    assert q0[2][0] == 11 and 0 < q0[2][1] < 1  # partial overlap second
    assert 12 not in {n for n, _ in q0.values()}  # disjoint never a candidate


def test_minhash_quality_bounds(spark):
    r = all_probes()["x144_minhash_quality"].fn(spark, SF001).first()
    assert r["n_hit"] <= min(r["n_cand"], r["n_exact"])
    assert 0.0 <= r["precision_"] <= 1.0
    assert 0.0 <= r["recall_"] <= 1.0
    # 16-hash/4-band LSH at 0.5 threshold should catch most true pairs
    assert r["recall_"] >= 0.8


def test_recursive_closure_depths(spark):
    rows = all_probes()["x142_recursive_closure"].fn(spark, SF001).collect()
    depths = {r["min_depth"] for r in rows}
    assert depths <= {0, 1, 2}
    assert sum(1 for r in rows if r["min_depth"] == 0) == 1  # one seed


def test_quantile_normalize_monotone_and_bounded(spark):
    import pyspark.sql.functions as F

    out = all_probes()["x148_quantile_normalize"].fn(spark, SF001)
    ev = spark.read.parquet(f"{SF001}/events.parquet").select("event_id", "value")
    j = out.join(ev, "event_id").collect()
    lo = min(r["value"] for r in j)
    hi = max(r["value"] for r in j)
    by_type = {}
    for r in j:
        by_type.setdefault(r["event_type"], []).append((r["value"], r["event_id"], r["norm_value"]))
    for rows in by_type.values():
        rows.sort()
        norms = [n for _, _, n in rows]
        assert norms == sorted(norms)          # rank order preserved
    assert all(lo <= r["norm_value"] <= hi for r in j)  # stays in range
