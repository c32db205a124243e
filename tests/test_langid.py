"""Trained language ID (operators/langid.py): real accuracy on
planted multilingual text, model shape, and tie-break determinism."""

import pytest
from pyspark.sql import functions as F

from flytemosaic_spark.operators.langid import (
    char_bigrams,
    langid_pipeline,
    predict_lang,
    train_char_lm,
)

_SENTENCES = {
    "en": [
        "the quick brown fox jumps over the lazy dog while the sun sets",
        "she walked through the garden and watched the birds in the trees",
        "we should think about what the right thing to do here would be",
        "there is nothing better than a good book and a cup of tea",
        "the weather this morning was cold but the afternoon turned warm",
        "he finished his work early and went for a long walk in the park",
    ],
    "fr": [
        "le renard brun saute par dessus le chien paresseux dans le jardin",
        "elle marchait dans la rue et regardait les oiseaux dans les arbres",
        "nous devrions penser a ce qui serait la meilleure chose a faire",
        "il n y a rien de mieux qu un bon livre et une tasse de the",
        "le temps ce matin etait froid mais l apres midi est devenu chaud",
        "il a fini son travail tot et fait une longue promenade au parc",
    ],
    "de": [
        "der schnelle braune fuchs springt uber den faulen hund im garten",
        "sie ging durch die strasse und beobachtete die vogel in den baumen",
        "wir sollten daruber nachdenken was hier das richtige ware",
        "es gibt nichts besseres als ein gutes buch und eine tasse tee",
        "das wetter heute morgen war kalt aber der nachmittag wurde warm",
        "er beendete seine arbeit fruh und machte einen langen spaziergang",
    ],
    "es": [
        "el rapido zorro marron salta sobre el perro perezoso en el jardin",
        "ella caminaba por la calle y miraba los pajaros en los arboles",
        "deberiamos pensar en cual seria la mejor cosa que hacer aqui",
        "no hay nada mejor que un buen libro y una taza de te caliente",
        "el tiempo esta manana era frio pero la tarde se volvio calida",
        "el termino su trabajo temprano y dio un largo paseo por el parque",
    ],
}


def _corpus(spark, idx):
    rows = []
    i = 0
    for lang, sents in _SENTENCES.items():
        for j in idx:
            rows.append((i, lang, sents[j]))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


class TestAccuracy:
    def test_heldout_accuracy(self, spark):
        train = _corpus(spark, [0, 1, 2, 3])
        test = _corpus(spark, [4, 5])
        grid, priors, floors = train_char_lm(train)
        pred = predict_lang(test, grid, priors, floors=floors)
        joined = pred.join(
            test.select("doc_id", F.col("lang").alias("truth")), "doc_id"
        ).collect()
        assert len(joined) == 8
        acc = sum(r["lang_pred"] == r["truth"] for r in joined) / len(joined)
        # 4 languages, held-out sentences: the char-bigram NB model
        # must be far above the 25% chance floor
        assert acc >= 0.875, [
            (r["truth"], r["lang_pred"]) for r in joined
        ]

    def test_self_classification_perfect(self, spark):
        docs = _corpus(spark, [0, 1, 2, 3, 4, 5])
        out = langid_pipeline(docs)
        n = out.count()
        n_match = out.agg(F.sum("is_match")).collect()[0][0]
        assert n == 24 and n_match >= 23


class TestModelShape:
    def test_grid_covers_full_cross(self, spark):
        docs = _corpus(spark, [0, 1])
        grid, priors, _floors = train_char_lm(docs)
        g = grid.groupBy("lang").agg(F.count("*").alias("n")).collect()
        counts = {r["lang"]: r["n"] for r in g}
        # every language scores every vocab gram (unseen pairs get the
        # smoothing floor) — required for missing-key-free scoring
        assert len(set(counts.values())) == 1
        assert priors.count() == 4

    def test_bigram_extraction(self, spark):
        df = spark.createDataFrame([("abcd",)], "t string")
        out = df.select(char_bigrams("t").alias("g")).collect()[0]["g"]
        assert out == ["ab", "bc", "cd"]

    def test_short_docs_excluded(self, spark):
        docs = spark.createDataFrame(
            [(1, "en", "x"), (2, "en", "hello world")],
            "doc_id long, lang string, text string",
        )
        grid, priors, floors = train_char_lm(docs)
        pred = predict_lang(docs, grid, priors, floors=floors).collect()
        assert [r["doc_id"] for r in pred] == [2]


class TestSmoothingFloor:
    def test_unseen_bigrams_score_the_floor(self, spark):
        # "zz"-style bigrams never occur in training; with floors an
        # all-unseen doc still gets scored (n_g * floor + prior),
        # favoring the language with the smaller (t+v) denominator.
        train = spark.createDataFrame(
            [(1, "big", "abababababababababababababab"),
             (2, "big", "cdcdcdcdcdcdcdcdcdcdcdcdcdcd"),
             (3, "sml", "efef")],
            "doc_id long, lang string, text string",
        )
        grid, priors, floors = train_char_lm(train)
        probe = spark.createDataFrame(
            [(9, "zzzzzzzz")], "doc_id long, text string"
        )
        # without floors the inner join drops every bigram -> no row
        assert predict_lang(probe, grid, priors).count() == 0
        out = predict_lang(probe, grid, priors, floors=floors).collect()
        assert len(out) == 1
        f = {r["lang"]: r["floor_u"] for r in floors.collect()}
        # floors must differ per language (that is the bias the
        # left-join fix exists to apply)
        assert f["sml"] > f["big"]

    def test_floor_zero_delta_when_covered(self, spark):
        docs = _corpus(spark, [0, 1, 2])
        grid, priors, floors = train_char_lm(docs)
        a = predict_lang(docs, grid, priors).collect()
        b = predict_lang(docs, grid, priors, floors=floors).collect()
        sa = {(r["doc_id"], r["lang_pred"], r["score_u"]) for r in a}
        sb = {(r["doc_id"], r["lang_pred"], r["score_u"]) for r in b}
        assert sa == sb


class TestDeterminism:
    def test_tie_break_is_max_lang(self, spark):
        # two languages with IDENTICAL training text -> identical
        # scores; the join-back tie-break must pick max(lang)
        docs = spark.createDataFrame(
            [(1, "aa", "same text here"), (2, "bb", "same text here"),
             (3, "aa", "same text here")],
            "doc_id long, lang string, text string",
        )
        out = langid_pipeline(docs).collect()
        preds = {r["doc_id"]: r["lang_pred"] for r in out}
        # priors differ (aa: 2 docs, bb: 1) so aa wins on prior alone
        assert set(preds.values()) == {"aa"}
