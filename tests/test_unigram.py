"""Unigram-LM tokenizer (operators/unigram.py): DP optimality vs
brute force, Spark ≡ python twin, EM re-estimation properties."""

import itertools
import random

from pyspark.sql import functions as F

from flytemosaic_spark.operators.unigram import (
    em_reestimate,
    seed_pieces,
    unigram_corpus_stats,
    viterbi_py,
    viterbi_stats,
    word_freqs,
)


def _brute_best(w, pieces, max_piece=4):
    """Enumerate every segmentation; return the max (score, n) under
    the same (score, last-split) preference as the DP."""
    best = None
    n = len(w)
    for bits in itertools.product([0, 1], repeat=n - 1):
        cuts = [0] + [i + 1 for i, b in enumerate(bits) if b] + [n]
        segs = [w[cuts[i] : cuts[i + 1]] for i in range(len(cuts) - 1)]
        if any(len(s) > max_piece or s not in pieces for s in segs):
            continue
        score = sum(pieces[s] for s in segs)
        if best is None or score > best[0]:
            best = (score, len(segs))
    return best


class TestViterbi:
    def test_optimal_vs_brute_force(self):
        rng = random.Random(17)
        for _ in range(60):
            w = "".join(rng.choice("abc") for _ in range(rng.randint(1, 9)))
            pieces = {}
            for i in range(len(w)):
                for line in range(1, min(4, len(w) - i) + 1):
                    p = w[i : i + line]
                    if p not in pieces and rng.random() < 0.7:
                        pieces[p] = -rng.randint(1, 50)
            for c in set(w):
                pieces.setdefault(c, -60)
            got = viterbi_py(w, pieces)
            want = _brute_best(w, pieces)
            assert got is not None and want is not None
            assert got[0] == want[0], (w, pieces)

    def test_unsegmentable_word_returns_none(self):
        assert viterbi_py("abc", {"ab": -1}) is None

    def test_single_chars_guarantee_coverage(self, spark):
        docs = spark.createDataFrame(
            [(1, "zqxj vvvv zqxj")], "doc_id long, text string"
        )
        out = unigram_corpus_stats(docs).collect()
        # every token segmented (4-char words, freq 2+1+... )
        assert sum(r["total_freq"] for r in out) == 3


class TestSparkTwin:
    def test_stats_match_python(self, spark):
        rng = random.Random(23)
        texts = [
            " ".join(
                "".join(rng.choice("abcde") for _ in range(rng.randint(1, 10)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(40)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        words = word_freqs(docs)
        pieces = seed_pieces(words)
        model = {
            r["piece"]: r["su"] for r in pieces.collect()
        }
        got = {
            r["w"]: (r["s"], r["n"])
            for r in viterbi_stats(words, pieces).collect()
        }
        freqs: dict = {}
        for t in texts:
            for w in t.split():
                freqs[w] = freqs.get(w, 0) + 1
        assert set(got) == set(freqs)
        for w in freqs:
            assert got[w] == viterbi_py(w, model), w


class TestSeedCap:
    def test_cap_binds_and_keeps_singles(self, spark):
        # words with clearly tiered piece counts: the cap must drop the
        # lowest-count multi-char classes first and never drop singles
        docs = spark.createDataFrame(
            [(1, "aaaa aaaa aaaa aaaa bbb bbb cc zq")],
            "doc_id long, text string",
        )
        words = word_freqs(docs)
        uncapped = seed_pieces(words, cap=None).collect()
        n_multi = sum(1 for r in uncapped if len(r["piece"]) > 1)
        assert n_multi > 3
        capped = seed_pieces(words, cap=3).collect()
        kept_multi = [r for r in capped if len(r["piece"]) > 1]
        singles = {r["piece"] for r in capped if len(r["piece"]) == 1}
        # every single char survives the cap
        assert {"a", "b", "c", "z", "q"} <= singles
        assert len(kept_multi) <= 3
        # the survivors are the HIGHEST-count multi-char pieces
        uncapped_multi = sorted(
            (r["c"] for r in uncapped if len(r["piece"]) > 1),
            reverse=True,
        )
        assert sorted((r["c"] for r in kept_multi), reverse=True) == (
            uncapped_multi[: len(kept_multi)]
        )

    def test_default_cap_is_identity_at_test_scale(self, spark):
        docs = spark.createDataFrame(
            [(1, "abab abab cdcd"), (2, "abab cdcd cdcd")],
            "doc_id long, text string",
        )
        words = word_freqs(docs)
        a = {
            (r["piece"], r["c"], r["su"])
            for r in seed_pieces(words).collect()
        }
        b = {
            (r["piece"], r["c"], r["su"])
            for r in seed_pieces(words, cap=None).collect()
        }
        assert a == b


class TestEm:
    def test_reestimate_prunes_and_renormalizes(self, spark):
        docs = spark.createDataFrame(
            [(1, "abab abab cdcd"), (2, "abab cdcd cdcd")],
            "doc_id long, text string",
        )
        words = word_freqs(docs)
        p0 = seed_pieces(words)
        p1 = em_reestimate(words, p0)
        rows = {r["piece"]: r for r in p1.collect()}
        # only pieces on best paths survive (SentencePiece prune)
        assert set(rows) < {
            r["piece"] for r in p0.collect()
        }
        # counts renormalize: scores are ln(c/t) micro-nats
        tot = sum(r["c"] for r in rows.values())
        import math

        for r in rows.values():
            want = math.floor(
                math.log(r["c"] / tot) * 1000000 + 0.5
            )
            assert r["su"] == want

    def test_em_keeps_corpus_segmentable(self, spark):
        docs = spark.createDataFrame(
            [(1, "xxyy xxyy zz")], "doc_id long, text string"
        )
        words = word_freqs(docs)
        p1 = em_reestimate(words, seed_pieces(words))
        out = viterbi_stats(words, p1).collect()
        assert sum(r["freq"] for r in out) == 3
