"""BPE tokenizer induction: learn byte-pair-encoding merges over a
corpus as repeated declarative passes — the vocabulary-training step
of an LLM data pipeline (the runtime tokenizer then applies the
learned merge list; counting with a fixed vocab is x7b).

Representation: each distinct word becomes a string of
individually-wrapped symbols ("·h··e··l··l··o·"), weighted by corpus
frequency — every symbol carries its OWN delimiters, so adjacent
pair matches never share a delimiter character. One merge round =
(1) explode adjacent symbol pairs, (2) weighted-count them, (3) pick
the argmax pair with a total-order tie-break, (4) apply the merge
with a single string replace. ``replace`` scans left-to-right
non-overlapping in both Spark and DuckDB, which with the wrapped
encoding is exactly BPE's greedy within-word application order
('a a a a' -> 'aa aa', tested on runs), so the whole learner replays
in ANSI SQL (probe x123).

Scale shape: state is the DISTINCT-word table (vocabulary-scale, not
corpus-scale — counts fold in at the first aggregate); each round is
one explode + one hash-agg + a 1-row broadcast argmax + a map-side
replace, checkpointed so round k+1 never re-executes round k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "·"  # '·' — outside the corpus alphabet (asserted in tests)


def _pair_counts(seq: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies, weighted by word count."""
    syms = seq.select(
        "c", F.filter(F.split("s", SEP), lambda x: x != "").alias("a")
    )
    zipped = F.arrays_zip(
        F.col("a").alias("s1"),
        F.slice(F.col("a"), 2, F.greatest(F.size("a") - 1, F.lit(1))).alias(
            "s2"
        ),
    )
    return (
        syms.select("c", F.explode(zipped).alias("p"))
        .where(F.col("p.s2").isNotNull())
        .groupBy(
            F.col("p.s1").alias("left_sym"), F.col("p.s2").alias("right_sym")
        )
        .agg(F.sum("c").alias("pair_count"))
    )


def _merge_rounds(docs: DataFrame, text_col: str, rounds: int):
    """Run the merge loop; returns (per-round argmax frames, final
    symbol-sequence frame) so learning and application share one
    implementation."""
    from flytemosaic_spark.operators.text import tokens

    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    seq = words.select(
        "c",
        F.regexp_replace("w", "(.)", SEP + "$1" + SEP).alias("s"),
    ).localCheckpoint()
    merges = []
    for r in range(1, rounds + 1):
        best = (
            _pair_counts(seq)
            .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
            .limit(1)
            .localCheckpoint()
        )
        merges.append(best.withColumn("round", F.lit(r).cast("bigint")))
        find = F.concat(
            F.lit(SEP),
            F.col("left_sym"),
            F.lit(SEP + SEP),
            F.col("right_sym"),
            F.lit(SEP),
        )
        repl = F.concat(F.lit(SEP), F.col("left_sym"), F.col("right_sym"), F.lit(SEP))
        seq = (
            seq.crossJoin(F.broadcast(best))
            .select("c", F.replace("s", find, repl).alias("s"))
            .localCheckpoint()
        )
    return merges, seq


def learn_bpe_merges(
    docs: DataFrame, text_col: str = "text", rounds: int = 3
) -> DataFrame:
    """Learn ``rounds`` BPE merges; returns (round, left_sym,
    right_sym, pair_count) — the merge table a tokenizer applies in
    order."""
    merges, _ = _merge_rounds(docs, text_col, rounds)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.select("round", "left_sym", "right_sym", "pair_count")


def bpe_vocab_counts(
    docs: DataFrame, text_col: str = "text", rounds: int = 3, k: int = 20
) -> DataFrame:
    """APPLY the learned merges: segment the corpus with the final
    merge state and count symbol usage — the vocab-coverage readout
    that decides whether the learned vocabulary is worth shipping.
    Top-k by corpus frequency with symbol tie-break (deterministic
    cutoff), via TakeOrderedAndProject — no global sort."""
    _, seq = _merge_rounds(docs, text_col, rounds)
    syms = seq.select(
        "c", F.explode(F.filter(F.split("s", SEP), lambda x: x != "")).alias("sym")
    )
    return (
        syms.groupBy("sym")
        .agg(F.sum("c").alias("n_tokens"))
        .orderBy(F.col("n_tokens").desc(), "sym")
        .limit(k)
    )
