

class TestEceBins:
    def test_perfectly_calibrated_scores(self, spark):
        from flytemosaic_spark.operators.metrics import ece_bins

        # within each bin, empirical rate == mean score exactly:
        # score 0.25 with 1/4 positives, score 0.75 with 3/4
        rows = [(0.25, i % 4 == 0) for i in range(400)]
        rows += [(0.75, i % 4 != 0) for i in range(400)]
        df = spark.createDataFrame(rows, "score double, y boolean")
        out = {r["bin"]: r for r in ece_bins(df, "score", "y").collect()}
        assert out[2]["ece_num"] == 0 and out[7]["ece_num"] == 0

    def test_miscalibration_measured_exactly(self, spark):
        from flytemosaic_spark.operators.metrics import ece_bins

        # score 0.9 but only 10% positive: |1000*10 - 100*900| = 80000
        rows = [(0.9, i % 10 == 0) for i in range(100)]
        df = spark.createDataFrame(rows, "score double, y boolean")
        out = ece_bins(df, "score", "y").collect()
        assert len(out) == 1
        r = out[0]
        assert r["bin"] == 9 and r["n"] == 100 and r["n_pos"] == 10
        assert r["ece_num"] == abs(1000 * 10 - 900 * 100)
        # ECE = 80000 / (1000 * 100) = 0.8
        assert r["ece_num"] / (1000 * r["n"]) == 0.8
