"""Content-addressed caching (D2): digest stability/sensitivity and
compute-once semantics across reruns."""

from __future__ import annotations

from pyspark.sql import functions as F

from flytemosaic_spark.operators.cache import cached, frame_digest


def test_digest_is_order_insensitive_and_content_sensitive(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "id int, s string")
    b = spark.createDataFrame([(3, "z"), (1, "x"), (2, "y")], "id int, s string")
    c = spark.createDataFrame([(1, "x"), (2, "y"), (4, "z")], "id int, s string")
    assert frame_digest(a) == frame_digest(b)
    assert frame_digest(a) != frame_digest(c)
    assert frame_digest(a, version="v2") != frame_digest(a)


def test_cached_computes_once(spark, tmp_path):
    calls = []

    def compute():
        calls.append(1)
        return spark.range(100).select(
            F.col("id"), (F.col("id") * 2).alias("doubled")
        )

    key = "job-abc123"
    r1 = cached(spark, str(tmp_path), key, compute)
    assert r1.count() == 100 and len(calls) == 1
    r2 = cached(spark, str(tmp_path), key, compute)
    assert r2.count() == 100 and len(calls) == 1  # cache hit: no recompute
    # different key (e.g. new input digest) -> recompute
    r3 = cached(spark, str(tmp_path), "job-def456", compute)
    assert r3.count() == 100 and len(calls) == 2


def test_cached_rerun_pipeline_digest_key(spark, tmp_path):
    """The reference idiom end-to-end: key = digest(inputs); editing
    the input invalidates, rerunning with identical input reuses."""
    inp1 = spark.createDataFrame([(i, i % 7) for i in range(1000)], "id int, g int")
    calls = []

    def job(inp):
        def compute():
            calls.append(1)
            return inp.groupBy("g").agg(F.count("*").alias("n"))
        return cached(spark, str(tmp_path), frame_digest(inp, "v1"), compute)

    assert job(inp1).count() == 7 and len(calls) == 1
    assert job(inp1).count() == 7 and len(calls) == 1
    inp2 = inp1.where("id < 500")
    assert job(inp2).count() == 7 and len(calls) == 2
