"""Text-analysis operators for training-data pipelines.

Language ID (stopword heuristic), quality scoring, token counting,
and document fingerprinting — all as pure Catalyst expressions so
they run JVM-side at 100 TB without a Python hop. The shingling
helpers here also feed the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the heuristic language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "to", "in", "is"),
    "fr": ("le", "la", "les", "et", "de", "un", "est"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "los", "y", "de", "es", "un"),
}

PUNCT_CLASS = r"[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization as an array column."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(tokens(text)))


# GPT-2-style pre-tokenizer pattern, restricted to constructs shared by
# Java regex and RE2 (no lookahead) so the DuckDB oracle is exact:
# contractions | space+letters | space+digits | space+other | whitespace
BPE_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def subword_token_count(text: Column) -> Column:
    """BPE-ish token estimate: the number of pre-tokenizer matches —
    the standard cheap proxy for LLM token counts at corpus scale
    (regexp_count is JVM-side; no tokenizer library in the hot path)."""
    return F.regexp_count(text, F.lit(BPE_PRETOKEN_PATTERN))


def portable_round(c: Column, digits: int = 4) -> Column:
    """Half-up rounding as ``floor(x·10^k + 0.5)/10^k`` — bit-identical
    between Spark and DuckDB. Spark's ``round()`` rounds the decimal
    string HALF_UP while DuckDB rounds the binary double, and they
    disagree at exact .5 boundaries (e.g. ratios with power-of-two
    denominators: a 32-token document)."""
    scale = F.lit(float(10**digits))
    return F.floor(c * scale + F.lit(0.5)) / scale


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document: most-frequent-word
    mass, duplicate-word fraction, duplicate-bigram fraction, and a
    ``keep`` quality gate — the standard cheap filters for boilerplate
    and degenerate repetition in web-scale training corpora.

    Scale shape (r11): ONE reducing Arrow kernel per corpus partition
    (the winnow/langid recipe, guide §4 — a kernel that REDUCES is the
    regime where Python beats Catalyst) emits six small integers per
    document: max word count, total words, distinct words, total
    bigrams, distinct bigrams. NO shuffle at all — the r10 form ran
    TWO corpus explode passes (words + bigrams) through two two-level
    aggregations and a doc-keyed join (4 exchanges); the kernel's
    per-doc Counter is the per-doc aggregate, since each document row
    is whole within its Arrow batch. The fractions and the keep gate
    stay JVM-side Catalyst expressions over the integers, so float
    division and portable_round semantics are bit-identical to the
    aggregate form. Tokenization parity with ``tokens()`` is pinned by
    test (Spark trim strips ONLY spaces; Java ``\\s`` is the ASCII
    class — verified empirically, see tests/test_text_kernel.py).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField("doc_id", id_type, True),
            StructField("_max_wc", LongType(), False),
            StructField("_n_w", LongType(), False),
            StructField("_n_dw", LongType(), False),
            StructField("_n_bg", LongType(), False),
            StructField("_n_dbg", LongType(), False),
        ]
    )

    def _stats(batches):
        import re
        from collections import Counter

        import pandas as pd

        ws_re = re.compile("[ \t\n\x0b\f\r]+")  # Java \s, ASCII-only
        for pdf in batches:
            out_doc: list = []
            out = ([], [], [], [], [])
            for doc, t in zip(pdf["doc_id"], pdf["_t"]):
                if t is None:
                    continue  # tokens(NULL) explodes to no rows
                w = ws_re.split(t.strip(" "))  # trim strips spaces only
                wc = Counter(w)
                nb = max(len(w) - 1, 1)  # len<2 -> one whole-text gram
                if len(w) >= 2:
                    n_dbg = len({(w[i], w[i + 1]) for i in range(nb)})
                else:
                    n_dbg = 1
                out_doc.append(doc)
                for lst, v in zip(
                    out, (max(wc.values()), len(w), len(wc), nb, n_dbg)
                ):
                    lst.append(v)
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "_max_wc": out[0],
                    "_n_w": out[1],
                    "_n_dw": out[2],
                    "_n_bg": out[3],
                    "_n_dbg": out[4],
                }
            ).astype(
                {
                    "_max_wc": "int64", "_n_w": "int64", "_n_dw": "int64",
                    "_n_bg": "int64", "_n_dbg": "int64",
                }
            )

    ints = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    ).mapInPandas(_stats, schema)
    out = ints.select(
        "doc_id",
        portable_round(F.col("_max_wc") / F.col("_n_w")).alias("top_word_frac"),
        portable_round(
            (F.col("_n_w") - F.col("_n_dw")) / F.col("_n_w")
        ).alias("dup_word_frac"),
        portable_round(
            (F.col("_n_bg") - F.col("_n_dbg")) / F.col("_n_bg")
        ).alias("dup_bigram_frac"),
    )
    return out.withColumn(
        "keep", (F.col("top_word_frac") <= 0.3) & (F.col("dup_bigram_frac") <= 0.2)
    )


def tfidf_topk(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document (tf = raw count, smoothed
    idf = ln((N+1)/(df+1))).

    Corpus pattern: explode → (doc, word) counts with map-side
    combine → document-frequency aggregate on word → tf⨝df equi-join
    on word (both sides come out of aggregates partitioned by their
    grouping keys, so AQE picks a local shuffle-hash join) → per-doc
    top-k window. N is one driver-side count (columnar metadata scan),
    not a cross-joined scalar subquery, keeping the plan a single pass
    over the exploded tokens. Ranked by the ROUNDED score, then word,
    so ordering reproduces across engines (raw ln() can differ by
    1 ulp between libm implementations).
    """
    n_docs = df.count()
    ex = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("word")
    )
    tf = ex.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(float(n_docs)) + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
    scored = tf.join(dfreq, "word").select(
        "doc_id", "word", portable_round(F.col("tf") * idf).alias("tfidf")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "word", "tfidf")
    )


def ngram_freq(
    df: DataFrame, text_col: str = "text", n: int = 2, k: int = 100
) -> DataFrame:
    """Corpus-level top-k n-gram frequency table (the heavy-hitters
    scan behind boilerplate detection and tokenizer vocab audits).

    Scale shape: explode → groupBy(gram) count benefits from map-side
    partial aggregation (each task pre-counts its grams before the
    shuffle), and the global top-k is ``orderBy().limit(k)`` which
    Spark executes as TakeOrderedAndProject — every partition keeps
    only its local k, so no global sort ever materializes. Ties at the
    cutoff break deterministically by gram text.
    """
    toks = df.select(tokens(F.col(text_col)).alias("w"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("w") - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice("w", i, n), " "),
    )
    return (
        toks.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("gram"))
        .limit(k)
    )


def pattern_scrub(
    df: DataFrame,
    text_col: str,
    pattern: str = "[0-9]+",
    replacement: str = "<NUM>",
) -> DataFrame:
    """Redact every regex match in a text column and count the
    redactions per row — the PII/number-scrubbing pass of a corpus
    pipeline. Pure per-row JVM regex (``regexp_replace`` +
    ``regexp_count``): no shuffle, pipelines into whatever scan or
    filter precedes it. Patterns must stay inside the RE2 ∩ Java
    regex subset (no lookahead/backrefs) so scrubbing is reproducible
    in any engine — same discipline as :data:`BPE_PRETOKEN_PATTERN`.
    """
    return df.withColumn(
        "n_redacted", F.regexp_count(F.col(text_col), F.lit(pattern))
    ).withColumn("scrubbed", F.regexp_replace(F.col(text_col), pattern, replacement))


def marker_hits(text: Column, lang: str) -> Column:
    """Count of tokens that are stopword markers for ``lang``."""
    toks = tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of stopword-marker hit counts.

    Deterministic tie-break by language-key order; 'und' when no
    marker hits at all.
    """
    toks = tokens(text)

    def _hits(markers: tuple[str, ...]) -> Column:
        # nb: the lambda must take exactly one arg — PySpark passes
        # (element, index) to two-parameter lambdas
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    hit_cols = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*hit_cols.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties via later WHEN precedence
    for lang in reversed(list(hit_cols)):
        expr = F.when(hit_cols[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, PUNCT_CLASS, "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n = token_count(text)
    return marker_hits(text, lang) / F.greatest(n, F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite quality score in [0, 1]: length band + stopword
    presence − punctuation excess. A deterministic heuristic, so it
    can be replicated verbatim in the DuckDB oracle."""
    n = token_count(text).cast("double")
    length_term = F.least(n / F.lit(100.0), F.lit(1.0)) * 0.5
    stop_term = F.least(stopword_ratio(text) * F.lit(5.0), F.lit(1.0)) * 0.3
    punct_term = (F.lit(1.0) - F.least(punct_ratio(text) * F.lit(10.0), F.lit(1.0))) * 0.2
    return length_term + stop_term + punct_term


def shingles_from_tokens(toks: Column, n: int) -> Column:
    """Distinct n-word shingles from a *materialized* token-array
    column. Documents shorter than ``n`` words yield a single shingle
    of the whole text.

    IMPORTANT: pass a bound column (select the token array into the
    plan first), not a ``tokens(text)`` expression — Catalyst does not
    eliminate common subexpressions inside lambda functions, and
    InferFiltersFromGenerate can inline the whole expression into a
    pre-explode filter. The slice+array_join form references ``toks``
    exactly once per element so even an inlined copy stays linear
    (measured 7× faster than an n-way element_at form).

    ``slice`` past the array end returns the remainder and
    ``array_join`` of the shorter list equals ``concat_ws`` skipping
    NULLs, so short documents yield one whole-text shingle — matching
    the DuckDB oracle formulation.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(grams)


def word_shingles(text: Column, n: int) -> Column:
    """Distinct n-word shingles straight from a text column. Only for
    small inputs / oracle parity — prefer materializing ``tokens(text)``
    and calling :func:`shingles_from_tokens` (see its warning)."""
    return shingles_from_tokens(tokens(text), n)


def fingerprint_from_tokens(toks: Column, n: int = 5) -> Column:
    """Document fingerprint: lexicographic min of md5(shingle) — a
    simplified winnowing fingerprint, portable across engines."""
    return F.array_min(F.transform(shingles_from_tokens(toks, n), F.md5))


def profile(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Full text-analysis profile of a documents table."""
    t = F.col(text_col)
    return documents.select(
        "*",
        token_count(t).alias("n_tokens"),
        lang_id(t).alias("lang_pred"),
        F.round(quality_score(t), 4).alias("quality"),
        tokens(t).alias("_toks"),
    ).select(
        *documents.columns,
        "n_tokens",
        "lang_pred",
        "quality",
        fingerprint_from_tokens(F.col("_toks")).alias("fp"),
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query
    terms — the retrieval scorer a curation pipeline uses to surface
    domain-relevant documents (tf saturation + length normalization,
    which raw TF-IDF in :func:`tfidf_topk` lacks).

    One pass over the exploded tokens feeds all three statistics:
    document length (groupBy doc), term frequency for the query terms
    only (the IN filter prunes the heavy aggregate to query-term rows
    before the shuffle), and document frequency (an aggregate over the
    tf table, term-cardinality). N and avgdl are one scalar row,
    broadcast; df is term-cardinality, broadcast. avgdl is rounded at
    1e-6 so the score is engine-reproducible (see probes/curation.py
    for the DuckDB twin). Returns (doc_id, n_terms_hit, bm25) for
    documents matching at least one term.
    """
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("word"),
    )
    dl = ex.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        portable_round(F.avg("dl"), 6).alias("avgdl"),
    )
    tf = (
        ex.where(F.col("word").isin(terms))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") * (F.lit(k1) + 1.0) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            portable_round(F.sum(idf * norm)).alias("bm25"),
        )
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope/intercept
    of ln(frequency) on ln(rank) for the top-``top_n`` terms — natural
    text sits near slope −1; a corpus that strays far (−0.5, −2) is a
    red flag for boilerplate floods or synthetic/templated text, which
    makes the slope a one-number corpus-quality screen.

    One explode + term-count shuffle (partial-aggregated); ranks by
    (count desc, term) via
    :func:`flytemosaic_spark.plans.prefix.distributed_row_number` (no
    single-partition window); the regression moments are EXACT — per
    term ln values are quantized to 1e-9 integer units and summed in
    BIGINT / DECIMAL(38,0) (the x168 recipe), so the slope is fixed
    arithmetic over exact integers: engine- and partitioning-identical
    with no float-summation order sensitivity. top_n caps the moment
    rows, so state is constant regardless of corpus size.

    Returns one row: (n_terms, slope, intercept).
    """
    from flytemosaic_spark.plans.prefix import distributed_row_number

    freq = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("_w"))
        .groupBy("_w")
        .agg(F.count("*").alias("_c"))
        .select(F.col("_w"), F.col("_c"), (-F.col("_c")).alias("_negc"))
    )
    ranked = distributed_row_number(freq, ("_negc", "_w"), out_col="_rn")
    top = ranked.where(F.col("_rn") <= top_n)
    ix = F.floor(F.log(F.col("_rn").cast("double")) * 1e9 + F.lit(0.5)).cast(
        "bigint"
    )
    iy = F.floor(F.log(F.col("_c").cast("double")) * 1e9 + F.lit(0.5)).cast(
        "bigint"
    )
    pts = top.select(ix.alias("_x"), iy.alias("_y"))
    dec = "decimal(38,0)"
    m = pts.groupBy().agg(
        F.count("*").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x").cast(dec) * F.col("_y").cast(dec)).alias("_sxy"),
        F.sum(F.col("_x").cast(dec) * F.col("_x").cast(dec)).alias("_sxx"),
    )
    # num/den are exact integers in 1e-18 units; the shared scale
    # cancels in the ratio, so one double division at the end
    num = (
        F.col("_n").cast(dec) * F.col("_sxy")
        - F.col("_sx").cast(dec) * F.col("_sy").cast(dec)
    )
    den = (
        F.col("_n").cast(dec) * F.col("_sxx")
        - F.col("_sx").cast(dec) * F.col("_sx").cast(dec)
    )
    slope = num.cast("double") / den.cast("double")
    intercept = (
        F.col("_sy").cast("double") / 1e9 - slope * F.col("_sx").cast("double") / 1e9
    ) / F.col("_n").cast("double")
    return m.select(
        F.col("_n").cast("bigint").alias("n_terms"),
        portable_round(slope, 6).alias("slope"),
        portable_round(intercept, 6).alias("intercept"),
    )


def readability_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    quality signal (Dolma/C4-style pipelines gate on it next to the
    x9 heuristics): 206.835 - 1.015·(words/sentences) -
    84.6·(syllables/words), with the standard counting heuristics
    spelled as engine-portable regex counts — syllables = vowel-group
    runs ([aeiouy]+), sentences = terminal-punctuation runs
    ([.!?]+, floored at 1), words = the x247 whitespace-split
    contract. Emits the INTEGER counts (the exact signal) plus the
    portable-rounded score; one scan, no shuffle before the
    consumer's aggregation."""
    t = F.lower(F.col(text_col))
    n_words = F.size(F.split(F.trim(t), r"\s+"))
    n_syll = F.regexp_count(t, F.lit("[aeiouy]+"))
    n_sent = F.greatest(
        F.lit(1), F.regexp_count(t, F.lit("[.!?]+"))
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015)
        * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return docs.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        n_syll.cast("long").alias("n_syll"),
        n_sent.cast("long").alias("n_sent"),
        portable_round(score, 4).alias("flesch"),
    )
