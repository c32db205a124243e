"""Unit tests for the sampling operators and the corpus-quality text
operators (repetition filters, contamination scan, TF-IDF). Value-level
oracle parity runs in tools/check_correctness.py; these tests pin the
operator semantics on hand-built inputs where the right answer is
computable by eye."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flytemosaic_spark.operators.dedup import contamination_check
from flytemosaic_spark.operators.sampling import (
    HEX_BUCKETS,
    rate_threshold,
    split_assign,
    stratified_sample,
)
from flytemosaic_spark.operators.text import repetition_stats, tfidf_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spam spam spam spam spam spam", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "alpha beta gamma delta epsilon zeta eta theta", "de"),
        (3, "one two one two one two one two", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_repetition_stats_flags_degenerate_docs(docs):
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 0: one word repeated 6 times
    assert out[0]["top_word_frac"] == 1.0
    assert out[0]["dup_word_frac"] == pytest.approx(5 / 6, abs=1e-4)
    assert out[0]["dup_bigram_frac"] == pytest.approx(4 / 5, abs=1e-4)
    assert out[0]["keep"] is False
    # doc 1: 9 tokens, only "the" repeats, all bigrams distinct
    assert out[1]["top_word_frac"] == pytest.approx(2 / 9, abs=1e-4)
    assert out[1]["dup_bigram_frac"] == 0.0
    assert out[1]["keep"] is True
    # doc 2: fully distinct
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["keep"] is True
    # doc 3: "one two" ×4 — bigrams are 7, distinct are 2 ("one two","two one")
    assert out[3]["dup_bigram_frac"] == pytest.approx(5 / 7, abs=1e-4)
    assert out[3]["keep"] is False


def test_contamination_full_and_zero_overlap(spark, docs):
    holdout = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog", "en")],
        "doc_id bigint, text string, lang string",
    )
    out = {r["doc_id"]: r for r in contamination_check(docs, holdout, n=3).collect()}
    assert out[1]["contaminated_frac"] == 1.0  # identical text
    assert out[0]["n_contaminated"] == 0  # disjoint vocab
    assert out[2]["n_contaminated"] == 0
    # every corpus doc is reported, even with zero overlap
    assert set(out) == {0, 1, 2, 3}


def test_tfidf_ranks_rare_terms_above_common(spark):
    rows = [
        (0, "common rare0 common common"),
        (1, "common rare1"),
        (2, "common rare2"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["word"], r["tfidf"]))
    # rare terms (df=1) outrank "common" (df=3, idf=0) everywhere it
    # appears once; in doc 0 tf=3 still cannot beat a df=1 term
    assert by_doc[1][0][1] == "rare1"
    assert by_doc[2][0][1] == "rare2"
    assert by_doc[0][0][1] == "rare0"
    # smoothed idf: ln(4/4) = 0 for a word in every doc
    common_scores = [s for rs in by_doc.values() for _, w, s in rs if w == "common"]
    assert all(s == 0.0 for s in common_scores)


def test_rate_threshold_is_uniform_prefix():
    assert rate_threshold(0.0) == "0000"
    assert rate_threshold(1.0) == format(HEX_BUCKETS, "04x")
    assert rate_threshold(0.25) == "4000"


def test_split_assign_is_exhaustive_disjoint_and_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = split_assign(df, key_col="doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    # each 10% band lands within a loose tolerance of expectation
    assert 120 <= counts["test"] <= 280
    assert 120 <= counts["valid"] <= 280
    # stable: same labels on a second, differently-partitioned pass
    again = split_assign(df.repartition(7), key_col="doc_id")
    assert (
        out.join(again.withColumnRenamed("split", "split2"), "doc_id")
        .where(F.col("split") != F.col("split2"))
        .count()
        == 0
    )


def test_stratified_sample_respects_per_stratum_rates(spark):
    df = (
        spark.range(0, 4000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de"))
    )
    out = stratified_sample(
        df, {"en": 0.1, "de": 0.5}, strata_col="lang", key_col="doc_id"
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 120 <= counts["en"] <= 280  # ~200 of 2000
    assert 850 <= counts["de"] <= 1150  # ~1000 of 2000
    # unknown strata default to rate 0 — dropped entirely
    extra = df.withColumn("lang", F.lit("xx"))
    assert (
        stratified_sample(extra, {"en": 0.1}, strata_col="lang", key_col="doc_id").count()
        == 0
    )


def test_curate_invariants(spark):
    """Survivors contain no exact duplicates, no near-dup pair survives
    whole, every survivor carries a valid split tag."""
    from flytemosaic_spark.operators.curation import curate
    from flytemosaic_spark.operators.dedup import ngram_jaccard_pairs
    from flytemosaic_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = curate(docs)
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    assert 0 < len(ids) <= docs.count()
    # exact-dup free
    assert out.select("text").distinct().count() == len(ids)
    # near-dup free: no surviving pair at the same threshold
    surviving_pairs = (
        ngram_jaccard_pairs(out, threshold=0.5)
        .where(F.col("id_a").isin(ids) & F.col("id_b").isin(ids))
        .count()
    )
    assert surviving_pairs == 0
    assert {r["split"] for r in rows} <= {"train", "valid", "test"}
