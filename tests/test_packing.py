"""Sequence-packing invariants: the chunk model is exact window math
(oracle-checked in probes), so tests here focus on the first-fit
variant — no straddling, capacity respected, greedy order reproduced
— and on cross-model consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from flytemosaic_spark.operators.packing import first_fit_pack, pack_sequences
from flytemosaic_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
BUDGET = 256


def test_first_fit_no_overflow_and_no_straddle(spark):
    docs = load_table(spark, SF, "documents")
    out = first_fit_pack(docs, budget=BUDGET).cache()
    # a pack never exceeds the budget (oversized docs sit alone)
    fills = (
        out.where(F.col("n_tokens") <= BUDGET)
        .groupBy("bucket", "pack_id")
        .agg(F.sum("n_tokens").alias("fill"))
    )
    assert fills.where(F.col("fill") > BUDGET).count() == 0
    # offsets are consistent: a doc sits entirely inside its pack
    assert (
        out.where(
            (F.col("n_tokens") <= BUDGET)
            & (F.col("pack_offset") + F.col("n_tokens") > BUDGET)
        ).count()
        == 0
    )
    # every document appears exactly once
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_first_fit_matches_python_reference(spark):
    """The distributed greedy loop reproduces a single-threaded
    reference run of the same algorithm on one bucket."""
    docs = load_table(spark, SF, "documents")
    out = first_fit_pack(docs, budget=BUDGET)
    one_bucket = sorted(
        out.where(F.col("bucket") == 0).collect(), key=lambda r: r["doc_id"]
    )
    fills: list[int] = []
    for r in one_bucket:
        n = r["n_tokens"]
        for p, fill in enumerate(fills):
            if fill + n <= BUDGET:
                expected, expected_off = p, fill
                fills[p] = fill + n
                break
        else:
            expected, expected_off = len(fills), 0
            fills.append(min(n, BUDGET) if n >= BUDGET else n)
        assert (r["pack_id"], r["pack_offset"]) == (expected, expected_off)


def test_chunk_model_conserves_tokens(spark):
    """Concat-then-chunk: within a bucket, offsets chain exactly —
    doc k+1 starts where doc k ended (mod budget), and total packs
    cover total tokens."""
    docs = load_table(spark, SF, "documents")
    out = pack_sequences(docs, budget=BUDGET).cache()
    rows = sorted(
        out.where(F.col("bucket") == 1).collect(), key=lambda r: r["doc_id"]
    )
    cum = 0
    for r in rows:
        assert r["start_pack"] == cum // BUDGET
        assert r["pack_offset"] == cum % BUDGET
        cum += r["n_tokens"]
        assert r["end_pack"] == (cum - 1) // BUDGET
