"""Edge-case tests for the round-6 probe operators (chunking bounds,
span-dedup first-wins, URL canonical grouping) on hand fixtures —
the oracle gate covers the real-corpus path."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunking_boundary_counts(spark, monkeypatch):
    from flytemosaic_spark.probes import roundsix

    def chunks_for(n_tokens: int):
        text = " ".join(f"w{i}" for i in range(n_tokens))
        df = _docs(spark, [(1, text)])
        monkeypatch.setattr(
            roundsix, "T", lambda _s, _sf, _n, df=df: df.withColumn(
                "source", F.lit("s")
            )
        )
        return sorted(
            (r.chunk_idx, r.start_tok, r.n_tok)
            for r in roundsix.x155_chunk_for_embedding(spark, "ignored").collect()
        )

    # n == window: exactly one full chunk
    assert chunks_for(32) == [(1, 1, 32)]
    # n == window + 1: second chunk starts at stride+1 with the 9-token tail
    assert chunks_for(33) == [(1, 1, 32), (2, 25, 9)]
    # n == window + stride: second chunk is full
    assert chunks_for(56) == [(1, 1, 32), (2, 25, 32)]
    # short doc: single short chunk
    assert chunks_for(5) == [(1, 1, 5)]


def test_span_dedup_first_occurrence_wins(spark, monkeypatch):
    from flytemosaic_spark.probes import roundsix

    span = " ".join(f"t{i}" for i in range(10))
    other = " ".join(f"u{i}" for i in range(10))
    df = _docs(
        spark,
        [
            (1, span + " " + other),  # spans: [span, other] — both first
            (2, span + " " + span),  # two copies of span — both dropped
            (3, other + " " + span),  # both spans already seen
        ],
    )
    monkeypatch.setattr(
        roundsix, "T", lambda _s, _sf, _n: df.withColumn("source", F.lit("s"))
    )
    out = {
        r.doc_id: (r.n_spans, r.n_kept)
        for r in roundsix.x153_span_dedup(spark, "ignored").collect()
    }
    assert out[1] == (2, 2)
    assert out[2] == (2, 0)
    assert out[3] == (2, 0)


def test_url_canonical_merges_variants(spark, monkeypatch):
    from flytemosaic_spark.probes import roundsix

    # doc_ids 0 and 100 share (doc_id % 100, % 25, % 5): same canonical
    # URL despite different scheme case / www / port / utm / fragment
    df = spark.createDataFrame([(0, "x"), (100, "x")], "doc_id long, text string")
    monkeypatch.setattr(
        roundsix, "T", lambda _s, _sf, _n: df.withColumn("source", F.lit("s"))
    )
    rows = roundsix.x152_url_canonical_dedup(spark, "ignored").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_variants == 2
    assert r.keeper_doc == 0
    assert r.canonical_url.startswith("http://site0.com/p/0")
    assert "utm" not in r.canonical_url and "#" not in r.canonical_url
    assert "www" not in r.canonical_url and ":80" not in r.canonical_url
