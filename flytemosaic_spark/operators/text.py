"""Text-analysis operators for training-data pipelines.

Language ID (stopword heuristic), quality scoring, token counting,
and document fingerprinting — all as pure Catalyst expressions so
they run JVM-side at 100 TB without a Python hop. The shingling
helpers here also feed the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
