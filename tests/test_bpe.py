"""BPE merge learning: hand-checkable corpus + greedy-application
semantics (operators/bpe.py)."""

from __future__ import annotations

from flytemosaic_spark.operators.bpe import learn_bpe_merges


def _merges(spark, texts, rounds=3):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r.round, r.left_sym, r.right_sym, r.pair_count)
        for r in learn_bpe_merges(df, rounds=rounds)
        .orderBy("round")
        .collect()
    ]

def test_bpe_learns_most_frequent_pair_first(spark):
    """Classic BPE example: 'lo' dominates, then 'low' forms from the
    merged symbol — merges compose across rounds."""
    texts = ["low low low lower", "lowest low"]
    got = _merges(spark, texts, rounds=2)
    # 'l o' appears in every one of the 6 words
    assert got[0][0] == 1 and (got[0][1], got[0][2]) == ("l", "o")
    assert got[0][3] == 6
    # after merging, 'lo'+'w' is the next most frequent pair
    assert got[1][0] == 2 and (got[1][1], got[1][2]) == ("lo", "w")
    assert got[1][3] == 6


def test_bpe_greedy_left_to_right_on_runs(spark):
    """'aaaa' counts the (a,a) pair 3 times per occurrence, and one
    greedy left-to-right merge pass yields 'aa aa' (not 'aa a a') —
    the wrapped-symbol encoding makes replace() match BPE's
    within-word application order; round 2 then sees ('aa','aa')."""
    got = _merges(spark, ["aaaa aaaa"], rounds=2)
    assert (got[0][1], got[0][2]) == ("a", "a")
    assert got[0][3] == 6  # 3 adjacent pairs x word count 2
    assert (got[1][1], got[1][2]) == ("aa", "aa")
    assert got[1][3] == 2


def test_bpe_tie_break_is_lexicographic(spark):
    """Equal-count pairs resolve by (left, right) symbol order, so the
    learned table is deterministic under retries/partitioning."""
    got = _merges(spark, ["xy zw"], rounds=1)
    assert (got[0][1], got[0][2]) == ("x", "y")


def test_bpe_segment_counts(spark):
    """Applying the learned merges re-segments the corpus: after the
    ('l','o') and ('lo','w') merges, 'low' is one symbol counted per
    occurrence."""
    from flytemosaic_spark.operators.bpe import bpe_vocab_counts

    df = spark.createDataFrame(
        [("low low low lower",), ("lowest low",)], "text string"
    )
    counts = {
        r.sym: r.n_tokens for r in bpe_vocab_counts(df, rounds=2).collect()
    }
    assert counts["low"] == 6  # every word starts with the merged 'low'
    assert "l" not in counts and "lo" not in counts


# -- r7: corpus-scale BPE apply --------------------------------------------


def test_min_rank_kernel_equals_ordered_replay():
    """The operator's min-rank kernel vs the independent wrapped-string
    replay (the SQL oracle's algorithm) — equivalent on
    creation-ordered merge lists, brute-checked over random words."""
    import random

    from flytemosaic_spark.operators.bpe import _bpe_word, bpe_word_replay
    from flytemosaic_spark.probes.roundthirteen import BPE_MERGES

    ranks = {p: i for i, p in enumerate(BPE_MERGES)}
    rng = random.Random(7)
    alphabet = "theinoandrsgfu"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        for _ in range(3000)
    ] + ["the", "then", "another", "interesting", "thethethe", "inging"]
    for w in words:
        assert _bpe_word(w, ranks) == bpe_word_replay(w, BPE_MERGES), w


def test_kernel_equivalence_on_learned_merges():
    """Same equivalence for a merge list LEARNED by the induction
    operator (creation order holds by construction of BPE)."""
    import random

    from flytemosaic_spark.operators.bpe import _bpe_word, bpe_word_replay

    rng = random.Random(11)
    corpus_words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(2, 8)))
        for _ in range(400)
    ]
    # tiny in-python BPE learner (replay semantics) to produce a
    # genuinely learned, creation-ordered list
    from collections import Counter

    seqs = {w: list(w) for w in set(corpus_words)}
    weights = Counter(corpus_words)
    merges = []
    for _ in range(12):
        pc = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += weights[w]
        if not pc:
            break
        best = max(pc, key=lambda p: (pc[p], [-ord(c) for c in p[0]]))
        merges.append(best)
        a, b = best
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    ranks = {p: i for i, p in enumerate(merges)}
    for w in set(corpus_words):
        assert _bpe_word(w, ranks) == bpe_word_replay(w, merges), (w, merges)


def test_bpe_apply_stats_df(spark):
    from flytemosaic_spark.operators.bpe import (
        bpe_apply_stats,
        bpe_word_replay,
    )
    from flytemosaic_spark.probes.roundthirteen import BPE_MERGES

    docs = spark.createDataFrame(
        [
            (1, "the theory of the thing"),
            (2, "standing  in  another station"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens, r.fertility)
        for r in bpe_apply_stats(docs, BPE_MERGES).collect()
    }
    for doc_id, text in [
        (1, "the theory of the thing"),
        (2, "standing in another station"),
        (3, "x"),
    ]:
        words = text.split()
        n_bpe = sum(len(bpe_word_replay(w, BPE_MERGES)) for w in words)
        import math

        fert = math.floor(n_bpe / len(words) * 10000.0 + 0.5) / 10000.0
        assert got[doc_id] == (len(words), n_bpe, fert), doc_id


def test_bpe_apply_plan_has_no_pre_stats_shuffle(spark):
    """Corpus bytes must not move before the stats aggregate: the only
    Exchange in the plan feeds the final per-doc hash aggregate."""
    from flytemosaic_spark.operators.bpe import bpe_apply_stats
    from flytemosaic_spark.probes.roundthirteen import BPE_MERGES

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    plan = (
        bpe_apply_stats(docs, BPE_MERGES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange (the doc_id stats agg); none between scan and the
    # python mapper
    assert plan.count("Exchange") <= 1


def test_bpe_apply_with_large_learned_vocab(spark):
    """The production shape: a LEARNED vocabulary of thousands of
    merges broadcast once and applied map-side. Learns ~3k merges
    from a synthetic corpus with an in-python learner, applies them
    through the distributed operator, and checks doc token counts
    against the replay reference."""
    import math
    import random
    from collections import Counter

    from flytemosaic_spark.operators.bpe import (
        bpe_apply_stats,
        bpe_word_replay,
    )

    rng = random.Random(13)
    syllables = ["ka", "to", "mi", "ren", "su", "bal", "ne", "or",
                 "ti", "qua"]
    vocab_words = [
        "".join(rng.choice(syllables) for _ in range(rng.randint(1, 4)))
        for _ in range(800)
    ]
    docs_py = [
        (i, " ".join(rng.choice(vocab_words) for _ in range(60)))
        for i in range(40)
    ]

    # learn merges by replay (creation-ordered by construction)
    weights = Counter(w for _, t in docs_py for w in t.split())
    seqs = {w: list(w) for w in weights}
    merges = []
    for _ in range(3000):
        pc = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += weights[w]
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        merges.append(best)
        a, b = best
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    assert len(merges) > 500  # a genuinely large vocabulary

    df = spark.createDataFrame(docs_py, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens, r.fertility)
        for r in bpe_apply_stats(df, merges).collect()
    }
    for doc_id, text in docs_py:
        words = text.split()
        n_bpe = sum(len(bpe_word_replay(w, merges)) for w in words)
        fert = math.floor(n_bpe / len(words) * 10000.0 + 0.5) / 10000.0
        assert got[doc_id] == (len(words), n_bpe, fert), doc_id
