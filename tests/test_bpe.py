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
