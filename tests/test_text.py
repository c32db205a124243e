

class TestReadability:
    def test_known_text_counts(self, spark):
        from flytemosaic_spark.operators.text import readability_scores

        df = spark.createDataFrame(
            [(1, "The cat sat. The dog ran!"), (2, "word")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in readability_scores(df).collect()}
        r1 = out[1]
        assert r1["n_words"] == 6 and r1["n_sent"] == 2
        # "the cat sat the dog ran" vowel runs: e,a,a,e,o,a = 6
        assert r1["n_syll"] == 6
        # easy text scores high, in the classic 90-100 band
        assert 90 <= r1["flesch"] <= 120
        r2 = out[2]
        assert r2["n_sent"] == 1  # floored: no terminal punctuation

    def test_hard_text_scores_lower(self, spark):
        from flytemosaic_spark.operators.text import readability_scores

        easy = "He ran. She sat. We ate."
        hard = (
            "Institutionalization necessitates comprehensive "
            "organizational restructuring representations."
        )
        df = spark.createDataFrame(
            [(1, easy), (2, hard)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r["flesch"] for r in readability_scores(df).collect()}
        assert out[1] > out[2]
