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


def _bpe_word(word: str, ranks: dict) -> list[str]:
    """Min-rank BPE apply for ONE word (the GPT-2 ``bpe()`` shape):
    repeatedly merge the lowest-rank adjacent pair, left-to-right
    non-overlapping, until no pair has a rank. For a merge list in
    CREATION ORDER (every pair's constituents are base characters or
    outputs of strictly earlier merges, outputs distinct) this is
    provably equivalent to replaying the merges once each in order —
    applying a later merge can only fuse the neighborhood AROUND an
    earlier pair, never create a new occurrence of it — which is what
    lets an SQL oracle replay the same list as a chain of replace()
    calls (tested against the wrapped-string replay in test_bpe.py)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best = None
        prev = syms[0]
        for s in syms[1:]:
            r = ranks.get((prev, s))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (prev, s)
            prev = s
        if best is None:
            break
        a, b = best
        out = []
        i, n = 0, len(syms)
        while i < n:
            if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_word_replay(word: str, merges: list) -> list:
    """Independent reference implementation: wrap the word in
    per-symbol delimiters and replay each merge once, in order, via
    left-to-right non-overlapping string replace — the EXACT algorithm
    the SQL oracle runs. Test twin of :func:`_bpe_word`."""
    s = SEP + (SEP + SEP).join(word) + SEP
    for a, b in merges:
        s = s.replace(SEP + a + SEP + SEP + b + SEP, SEP + a + b + SEP)
    return [x for x in s.split(SEP) if x]


def bpe_apply_stats(
    docs: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a LEARNED merge list at corpus scale — the runtime
    tokenizer pass a real pipeline runs with a ~50k-merge vocabulary
    (induction is :func:`learn_bpe_merges`; this is the other half).

    Scale shape: the ranks table broadcasts once per executor
    (``sc.broadcast``, node-scale even at 50k merges); tokens stream
    through mapInPandas with a per-task word memo (Zipf makes the hit
    rate high), so there is NO shuffle until the per-document stats
    aggregate — corpus bytes never move. Returns one row per document:
    whitespace token count, BPE token count, and fertility
    (bpe/ws, the tokens-per-word readout x131 approximates with
    whitespace tokens)."""
    from flytemosaic_spark.operators.text import portable_round, tokens

    spark = docs.sparkSession
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    ).where(F.col("w") != "")

    def run(batches):
        import pandas as pd

        r = bc.value
        memo: dict = {}
        for pdf in batches:
            ns = []
            for w in pdf["w"]:
                n = memo.get(w)
                if n is None:
                    n = len(_bpe_word(w, r))
                    memo[w] = n
                ns.append(n)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "n_sym": ns}
            )

    seg = toks.mapInPandas(run, "doc_id long, n_sym long")
    return (
        seg.groupBy(F.col("doc_id").alias(id_col))
        .agg(
            F.count("*").alias("n_ws_tokens"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
        .select(
            id_col,
            "n_ws_tokens",
            "n_bpe_tokens",
            portable_round(
                F.col("n_bpe_tokens").cast("double")
                / F.col("n_ws_tokens").cast("double"),
                4,
            ).alias("fertility"),
        )
    )
