"""repetition_stats kernel parity (r11): the one-pass Arrow kernel
must reproduce the r10 explode/aggregate form bit-for-bit, including
the tokenization corner cases (Spark trim strips ONLY spaces; Java
\\s is the ASCII class [ \\t\\n\\x0b\\f\\r]; leading/trailing
separators produce empty tokens; docs under 2 tokens emit one
whole-text bigram)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flytemosaic_spark.operators.text import (
    portable_round,
    repetition_stats,
    tokens,
)


def _reference_stats(df, text_col="text", id_col="doc_id"):
    """The r10 explode -> two-level-aggregate form, verbatim."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("w")
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("w") - 1, F.lit(1))),
        lambda i: F.array_join(F.slice("w", i, 2), " "),
    )
    bgc = (
        toks.select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
    )
    row_stats = bgc.groupBy("doc_id").agg(
        ((F.sum("c") - F.count("*")) / F.sum("c")).alias("_dup_bg"),
    )
    wc = (
        toks.select("doc_id", F.explode("w").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    ws = wc.groupBy("doc_id").agg(
        (F.max("c") / F.sum("c")).alias("_top_w"),
        ((F.sum("c") - F.count("*")) / F.sum("c")).alias("_dup_w"),
    )
    out = ws.join(row_stats, "doc_id").select(
        "doc_id",
        portable_round(F.col("_top_w")).alias("top_word_frac"),
        portable_round(F.col("_dup_w")).alias("dup_word_frac"),
        portable_round(F.col("_dup_bg")).alias("dup_bigram_frac"),
    )
    return out.withColumn(
        "keep",
        (F.col("top_word_frac") <= 0.3) & (F.col("dup_bigram_frac") <= 0.2),
    )


CASES = [
    "",                       # -> [''] one empty token, one bigram
    " ",                      # trim -> '' -> ['']
    "a",                      # single token, whole-text bigram
    "a a a a",                # all-duplicate words AND bigrams
    " a b ",                  # trimmed
    "a\tb\tc",                # tabs split (Java \s)
    "\ta b",                  # leading tab -> leading empty token
    "a b\t",                  # trailing tab -> trailing empty token
    "x\n\ny z",               # newlines collapse
    "a\x0bb\fc",              # vertical tab + form feed split
    "a\xa0b c",               # NBSP does NOT split (ASCII \s only)
    "the cat sat on the mat the cat",
    "w " * 40,                # long duplicate run
    "unique words only here now",
]


@pytest.mark.parametrize("with_null", [False, True])
def test_kernel_matches_reference(spark, with_null):
    rows = [(i, t) for i, t in enumerate(CASES)]
    if with_null:
        rows.append((len(CASES), None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["top_word_frac"], r["dup_word_frac"],
            r["dup_bigram_frac"], r["keep"],
        )
        for r in repetition_stats(df).collect()
    }
    want = {
        r["doc_id"]: (
            r["top_word_frac"], r["dup_word_frac"],
            r["dup_bigram_frac"], r["keep"],
        )
        for r in _reference_stats(df).collect()
    }
    assert got == want
    assert len(got) == len(CASES)  # null-text doc emits no row
