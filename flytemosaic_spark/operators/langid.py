"""In-engine language identification — char-bigram Naive Bayes.

Real pipelines DERIVE the language column (fastText/CLD-shape); the
engine's ``documents.lang`` is given. This operator closes that gap
with a model trained in one corpus pass and applied in the same
plan, all JVM-side Catalyst expressions (no Python in the hot path):

- features: character bigrams via ``transform(sequence(...))`` —
  one explode, linear in corpus characters;
- training: Laplace-smoothed per-language bigram log-probabilities,
  quantized to integer micro-nats BEFORE summation (the x154 recipe)
  so scores are association-free and replay exactly in SQL;
- model size: bounded by charset² × |languages| — broadcastable at
  any corpus scale, so scoring is a broadcast join + one (doc, lang)
  aggregation; no quadratic stage anywhere;
- prediction: argmax language with a deterministic max-score /
  max-lang tie-break (join-back, not a window).

Reference parity: the reference is raster-only; this belongs to the
LLM-training-data text-analysis family (x8's stopword heuristic is
the zero-training tier; this is the trained tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRAMS = "transform(sequence(1, length({t}) - 1), i -> substring({t}, i, 2))"


def char_bigrams(col: str) -> F.Column:
    """All overlapping character bigrams of a string column (1-based,
    single-arg lambda — 2-arg PySpark lambdas receive an index).

    NOTE: positional ``substring(t, i, 2)`` costs O(i) per lookup
    (UTF8String scans for the code-point boundary), so this form is
    O(n²) per document — fine for short strings and unit tests; the
    corpus paths go through :func:`_bigram_occurrences`, which is
    linear (chars array materialized once, O(1) element_at)."""
    return F.expr(_GRAMS.format(t=col))


_PAIRS = (
    "transform(sequence(1, size(_ca) - 1), "
    "i -> concat(element_at(_ca, i), element_at(_ca, i + 1)))"
)


def _bigram_occurrences(d: DataFrame, keep: list[str]) -> DataFrame:
    """(keep..., g) bigram rows — LINEAR in corpus characters: the
    chars array materializes as its own projection (an inline
    split(t,'') would re-run per lambda element — the x241 rule), and
    element_at on an array is O(1), unlike positional substring on a
    string, which is O(i) and made the one-expression form O(n²) per
    document (measured: 2x data -> 3.7x time at 30-60 KB docs; the
    staged form is ALSO 3.5x faster on ~300-char docs)."""
    ca = d.select(*keep, F.expr("split(t, '')").alias("_ca"))
    return ca.select(*keep, F.explode(F.expr(_PAIRS)).alias("g"))


def train_char_lm(
    docs: DataFrame, text_col: str = "text", label_col: str = "lang"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One corpus pass -> (grid, priors, floors).

    grid: (lang, g, lp_u) — Laplace-smoothed ln p(g|lang) in integer
    micro-nats over the FULL lang x vocab cross (unseen pairs get the
    smoothing floor, so scoring needs no missing-key handling).
    priors: (lang, prior_u) — ln of the label frequency.
    floors: (lang, floor_u) — the per-language smoothing floor
    ln(1/(t+v)) for bigrams absent from the training vocab entirely,
    so predict-on-a-DIFFERENT-corpus scoring stays unbiased (the
    floor differs per language; dropping unseen bigrams would not).

    All outputs are model-scale (charset² x |langs|): broadcast them.
    """
    d = docs.select(
        F.col(label_col).alias("lang"), F.lower(F.col(text_col)).alias("t")
    ).where(F.length("t") >= 2)
    grams = _bigram_occurrences(d, ["lang"])
    # ONE corpus-scale aggregation; everything below derives from the
    # model-scale counts frame. localCheckpoint so the 4 downstream
    # references don't re-execute the corpus explode (the x191 rule).
    counts = (
        grams.groupBy("lang", "g").agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    nd = d.groupBy("lang").agg(F.count("*").alias("nd")).localCheckpoint()
    return _model_from_counts(counts, nd)


def _model_from_counts(
    counts: DataFrame, nd: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(lang, g, c) bigram counts + (lang, nd) doc counts →
    (grid, priors, floors). All inputs/outputs are model-scale; the
    split lets :func:`langid_pipeline` derive the counts from ONE
    shared corpus pass instead of re-exploding per consumer."""
    tot = counts.groupBy("lang").agg(F.sum("c").alias("t"))
    vocab = counts.select("g").distinct()
    vsize = vocab.agg(F.count("*").alias("v"))
    langs = counts.select("lang").distinct()
    grid = (
        langs.crossJoin(vocab)
        .crossJoin(F.broadcast(vsize))
        .join(tot, "lang")
        .join(counts, ["lang", "g"], "left")
        .select(
            "lang",
            "g",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                    / (F.col("t") + F.col("v"))
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lp_u"),
        )
    )
    total = nd.agg(F.sum("nd").alias("total"))
    priors = nd.crossJoin(F.broadcast(total)).select(
        "lang",
        F.floor(
            F.log(F.col("nd").cast("double") / F.col("total")) * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("prior_u"),
    )
    floors = (
        tot.crossJoin(F.broadcast(vsize))
        .select(
            "lang",
            F.floor(
                F.log(F.lit(1.0) / (F.col("t") + F.col("v"))) * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("floor_u"),
        )
    )
    return grid, priors, floors


def predict_lang(
    docs: DataFrame,
    grid: DataFrame,
    priors: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    floors: DataFrame | None = None,
) -> DataFrame:
    """Score every document against every language and return
    (id, lang_pred, score_u): bigram occurrences broadcast-join the
    model grid, sum per (doc, lang), add the prior, then argmax via
    ONE max(struct(score, lang)) aggregation — lexicographic struct
    ordering IS the (max score, then max lang) tie-break, with no
    self-join re-executing the doc-scale score frame.

    With ``floors`` (the third ``train_char_lm`` output), bigrams
    absent from the training vocab score the per-language Laplace
    floor ln(1/(t+v)) instead of being silently dropped — required
    for unbiased train-on-A/predict-on-B use, since the floor differs
    per language. Without it, prediction requires the corpus's
    bigrams to be covered by the grid (the train==predict shape, where
    the floor term is identically zero)."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("t")
    ).where(F.length("t") >= 2)
    occ = _bigram_occurrences(d, ["doc_id"]).groupBy("doc_id", "g").agg(
        F.count("*").alias("_c")
    )
    seen = _score_seen(occ, grid)
    return _argmax_lang(_score_all(occ, seen, priors, floors))


def _score_seen(occ: DataFrame, grid: DataFrame) -> DataFrame:
    """(doc_id, g, _c) pre-aggregated bigram counts × broadcast grid →
    per-(doc, lang) in-vocab score sums. The pre-aggregation is the
    guide-§2.3 'aggregate before the exploding join' move: the ×|langs|
    grid join and the (doc, lang) hash aggregate run over distinct
    (doc, bigram) pairs (≈⅓ of corpus positions on real text), not
    over every corpus character; sums are exact (bigint c · bigint
    lp_u)."""
    return (
        occ.join(F.broadcast(grid), "g")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("_c") * F.col("lp_u")).alias("s"),
            F.sum("_c").alias("n_seen"),
        )
    )


def _score_all(
    occ: DataFrame,
    seen: DataFrame,
    priors: DataFrame,
    floors: DataFrame | None,
) -> DataFrame:
    if floors is None:
        scores = seen.join(F.broadcast(priors), "lang").select(
            "doc_id",
            "lang",
            (F.col("s") + F.col("prior_u")).alias("score_u"),
        )
    else:
        # The grid is DENSE over langs × vocab, so per doc n_seen is
        # the count of in-vocab bigrams for EVERY lang row; the rest
        # (n_g - n_seen) each contribute the per-language floor. The
        # doc × lang base frame keeps all-unseen documents scored.
        n_gr = occ.groupBy("doc_id").agg(F.sum("_c").alias("n_g"))
        base = n_gr.crossJoin(F.broadcast(priors.select("lang")))
        scores = (
            base.join(seen, ["doc_id", "lang"], "left")
            .join(F.broadcast(floors), "lang")
            .join(F.broadcast(priors), "lang")
            .select(
                "doc_id",
                "lang",
                (
                    F.coalesce(F.col("s"), F.lit(0))
                    + (F.col("n_g") - F.coalesce(F.col("n_seen"), F.lit(0)))
                    * F.col("floor_u")
                    + F.col("prior_u")
                ).alias("score_u"),
            )
        )
    return scores


def _argmax_lang(scores: DataFrame) -> DataFrame:
    return (
        scores.groupBy("doc_id")
        .agg(F.max(F.struct(F.col("score_u"), F.col("lang"))).alias("m"))
        .select(
            "doc_id",
            F.col("m.lang").alias("lang_pred"),
            F.col("m.score_u").alias("score_u"),
        )
    )


def langid_pipeline(docs: DataFrame) -> DataFrame:
    """Train-on-corpus + predict-on-corpus in one plan (the probe
    shape); returns (doc_id, lang_pred, score_u, is_match).

    r10: ONE corpus bigram pass shared by train and predict. The r9
    form exploded the corpus three times per invocation (train grams,
    per-lang doc counts, predict occurrences); now a single
    (doc_id, lang, g) → count aggregate is localCheckpointed and
    every model/score consumer derives from it at distinct-bigram
    scale — the guide-§2.3 'aggregate before you shuffle / share one
    pass' rule. Scores are unchanged: integer c·lp_u sums associate
    exactly.
    """
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    d = docs.select(
        "doc_id",
        F.col("lang"),
        F.lower(F.col("text")).alias("t"),
    ).where(F.length("t") >= 2)

    id_type = d.schema["doc_id"].dataType
    lang_type = d.schema["lang"].dataType
    dgc_schema = StructType(
        [
            StructField("doc_id", id_type, True),
            StructField("lang", lang_type, True),
            StructField("g", StringType(), False),
            StructField("c", LongType(), False),
        ]
    )

    def _count_bigrams(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            out_doc: list = []
            out_lang: list = []
            out_g: list = []
            out_c: list = []
            for doc, lang, t in zip(pdf["doc_id"], pdf["lang"], pdf["t"]):
                cnt = Counter(
                    a + b for a, b in zip(t, t[1:])
                )
                out_doc.extend([doc] * len(cnt))
                out_lang.extend([lang] * len(cnt))
                out_g.extend(cnt.keys())
                out_c.extend(cnt.values())
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "lang": out_lang,
                    "g": out_g,
                    "c": out_c,
                }
            ).astype({"c": "int64"})

    # per-(doc, lang, bigram) counts in ONE Arrow-batched kernel
    # (Counter over adjacent code-point pairs — identical pairing to
    # the JVM substring/element_at form; lower() stays in the JVM so
    # locale-sensitive case folding is engine-identical). The r9 JVM
    # form ran the concat(element_at, element_at) HOF lambda
    # interpreted per corpus character (Catalyst cannot codegen
    # higher-order transforms) — the kernel REDUCES corpus characters
    # to per-doc distinct-bigram rows before anything shuffles, the
    # same measured rule as the winnowing kernel. Each doc row is
    # whole within its batch, so the Counter IS the per-doc aggregate.
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    dgc = (
        d.repartition(n_part, "doc_id")
        .mapInPandas(_count_bigrams, dgc_schema)
        .localCheckpoint()
    )
    # model-scale (|langs| x vocab) — checkpointed because the grid
    # construction references counts from FIVE subplans (vocab, vsize,
    # langs, tot, the left join) and each reference would re-aggregate
    # the corpus-distinct dgc frame otherwise (measured ~1.0s of the
    # exec at sf0.1 just rebuilding these aggregates).
    counts = (
        dgc.groupBy("lang", "g")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint()
    )
    nd = (
        dgc.groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .localCheckpoint()
    )
    grid, priors, _floors = _model_from_counts(counts, nd)
    # train corpus == predict corpus ⇒ every bigram is in-vocab and the
    # floor term is identically zero; skip the floors path's extra
    # per-doc count + two joins (predict-on-B callers pass floors).
    occ = dgc.groupBy("doc_id", "g").agg(F.sum("c").alias("_c"))
    # r11 (VERDICT item 9): the scoring tail. The tall form joined the
    # dense langs × vocab grid to every (doc, bigram) occurrence —
    # a ×|langs| row blowup into a (doc, lang) aggregate, then an
    # argmax aggregate (two more exchanges). The label set of a
    # training corpus is tiny and bounded (language codes), so PIVOT
    # the grid to one (g, lp_u per lang) row — the broadcast join
    # fans out NOTHING, per-language scores are |langs| sum columns of
    # ONE doc-keyed aggregate, and the argmax is a row-local
    # greatest() over (score, lang) structs: same integer sums, same
    # lexicographic tie-break, two aggregates and the ×|langs| blowup
    # gone. priors/langs are a model-scale driver collect (bounded,
    # the broadcast-gate contract); an absurd label cardinality falls
    # back to the tall path.
    langs = sorted(
        r["lang"] for r in priors.select("lang").distinct().collect()
    )
    if 2 <= len(langs) <= 256:
        prior_map = {
            r["lang"]: r["prior_u"] for r in priors.collect()
        }
        # checkpoint: the broadcast build re-executes the whole grid
        # construction (crossJoins over counts) per action otherwise —
        # model-scale state, the x191 rule (A/B: tail 0.51s -> 0.23s)
        wide = (
            grid.groupBy("g")
            .pivot("lang", langs)
            .agg(F.first("lp_u"))
            .localCheckpoint()
        )
        scored = (
            occ.join(F.broadcast(wide), "g")
            .groupBy("doc_id")
            .agg(
                *[
                    F.sum(F.col("_c") * F.col(f"`{lg}`")).alias(f"_s_{i}")
                    for i, lg in enumerate(langs)
                ]
            )
        )
        m = F.greatest(
            *[
                F.struct(
                    (F.col(f"_s_{i}") + F.lit(prior_map[lg])).alias(
                        "score_u"
                    ),
                    F.lit(lg).alias("lang"),
                )
                for i, lg in enumerate(langs)
            ]
        )
        pred = scored.select(
            "doc_id",
            m.getField("lang").alias("lang_pred"),
            m.getField("score_u").alias("score_u"),
        )
    else:
        pred = _argmax_lang(
            _score_all(occ, _score_seen(occ, grid), priors, None)
        )
    truth = docs.select("doc_id", F.col("lang").alias("lang_true"))
    return pred.join(truth, "doc_id").select(
        "doc_id",
        "lang_pred",
        "score_u",
        (F.col("lang_pred") == F.col("lang_true")).cast("int").alias("is_match"),
    )
