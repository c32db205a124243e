"""Portable Bloom-filter pre-filtering for scale anti-joins.

The engine's incremental core is "needed \\ existing" (SURVEY §2.3 J4,
reference scenes.py:115-138). A plain left-anti join shuffles BOTH
sides by the key; at 100 TB the big side's shuffle dominates the job.
The Bloom pattern removes it:

1. build a bit-array filter over the (much smaller) existing-key set
   — one aggregate, ≤ m/8 bytes of state;
2. broadcast the words as ONE array literal into a filter on the big
   side: rows failing the filter are DEFINITELY absent (Bloom has no
   false negatives) and are emitted immediately, shuffle-free;
3. only the maybe-present survivors (true matches + the few-percent
   false positives) go through the exact anti-join.

Semantics are exactly a left-anti join — the filter only short-cuts
rows, never changes membership — so the DuckDB NOT EXISTS oracle for
the plain join validates the Bloom plan unchanged (probe
x81_bloom_antijoin).

Hashing is md5-derived (8 hex chars per probe position), the same
engine-portable family as sampling/sketch.py: the filter words are
reproducible from any engine, so a filter built by Spark can be
applied by another system and vice versa.

Spark's own runtime InjectRuntimeFilter does a JVM-internal version
of this for joins it can see through; this operator is the explicit,
portable form — usable across jobs (build once, apply in later runs:
the words are just a list of ints you can persist with a manifest).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD = 64  # bits per array element


def _one_shl(shift: Column) -> Column:
    """1L << shift with a COLUMN shift amount (the PySpark shiftleft
    wrapper only accepts a Python int; the underlying SQL function
    takes a column)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), shift)


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k probe positions in [0, m_bits) from disjoint md5 substrings
    (8 hex chars = 32 uniform bits each; k <= 4 fits one digest)."""
    if not 1 <= k <= 4:
        raise ValueError("k must be in 1..4 (one md5 digest)")
    digest = F.md5(key.cast("string"))
    return [
        F.conv(F.substring(digest, 1 + 8 * i, 8), 16, 10).cast("long")
        % F.lit(m_bits)
        for i in range(k)
    ]


def build_bloom_df(keys: DataFrame, key_col: str, m_bits: int, k: int = 3) -> DataFrame:
    """Aggregate the existing-key set into a (w, bits) word table —
    cardinality m/64 regardless of key count, one shuffle on the word
    index. This is the distributed form; collect it with
    :func:`build_bloom` only when the literal-array apply path is in
    play (small m)."""
    if m_bits % _WORD:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("p")
    return (
        keys.select(pos)
        .select(
            F.floor(F.col("p") / _WORD).cast("int").alias("w"),
            _one_shl((F.col("p") % _WORD).cast("int")).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )


def build_bloom(keys: DataFrame, key_col: str, m_bits: int, k: int = 3) -> list[int]:
    """Driver-side Bloom words (m_bits/64 longs, e.g. 2^19 bits ->
    64 KiB). Arrow-collected; for filters past ~2^19 bits prefer the
    join apply path (:func:`bloom_anti_join` switches automatically —
    a py4j array literal of 10^5+ elements is converted element-wise
    and dominates the job)."""
    pdf = build_bloom_df(keys, key_col, m_bits, k).toPandas()
    words = [0] * (m_bits // _WORD)
    for w, b in zip(pdf["w"], pdf["bits"]):
        words[int(w)] = int(b)
    return words


def might_contain(key: Column, words: list[int], m_bits: int, k: int = 3) -> Column:
    """Membership test as a pure column expression over the broadcast
    word-array literal. False => definitely not inserted."""
    arr = F.lit(words)
    conds = []
    for pos in _positions(key, m_bits, k):
        word = F.try_element_at(arr, F.floor(pos / _WORD).cast("int") + 1)
        bit = _one_shl((pos % _WORD).cast("int"))
        conds.append(word.bitwiseAND(bit) != 0)
    return reduce(lambda a, b: a & b, conds)


def _next_pow2(n: int) -> int:
    return 1 << max(16, (n - 1).bit_length())


# above this, the word table rides a broadcast join instead of an
# array literal (py4j converts list literals element-wise — a 2^18-word
# literal costs more than the query)
_MAX_LITERAL_WORDS = 1 << 13


def _with_maybe_flag(
    big: DataFrame, words_df: DataFrame, big_key: str, m_bits: int, k: int
) -> DataFrame:
    """Tag rows with the Bloom verdict via k broadcast left-joins on
    the word index — the apply path for large filters: the word table
    is m/64 rows, the big side is never shuffled (broadcast hash
    joins), and no driver materialization happens at all."""
    out = big
    verdict = None
    bit_cols = []
    for i, pos in enumerate(_positions(F.col(big_key), m_bits, k)):
        w_col, b_col = f"_bw{i}", f"_bb{i}"
        probe = words_df.select(
            F.col("w").alias(w_col), F.col("bits").alias(b_col)
        )
        out = (
            out.withColumn(w_col + "_idx", F.floor(pos / _WORD).cast("int"))
            .join(
                F.broadcast(probe),
                F.col(w_col + "_idx") == F.col(w_col),
                "left",
            )
            .drop(w_col, w_col + "_idx")
        )
        bit = _one_shl((pos % _WORD).cast("int"))
        hit = F.coalesce(F.col(b_col), F.lit(0)).bitwiseAND(bit) != 0
        verdict = hit if verdict is None else (verdict & hit)
        bit_cols.append(b_col)
    return out.withColumn("_bloom_maybe", verdict).drop(*bit_cols)


def bloom_anti_join(
    big: DataFrame,
    existing: DataFrame,
    big_key: str,
    existing_key: str,
    m_bits: int | None = None,
    k: int = 3,
) -> DataFrame:
    """``big`` rows whose key is NOT in ``existing`` — bit-identical to
    ``big.join(existing, ..., "left_anti")``, but only the Bloom-maybe
    survivors are shuffled; the definite misses stream straight through
    a scan-side filter (small filters) or broadcast word-table joins
    (large filters).

    ``m_bits`` defaults to ~10 bits per existing key (k=3 -> ~2.5%
    false-positive rate), sized from one count of the existing keys.
    """
    keys = existing.select(F.col(existing_key).alias("_k")).distinct()
    if m_bits is None:
        m_bits = _next_pow2(10 * max(keys.count(), 1))
    if m_bits // _WORD <= _MAX_LITERAL_WORDS:
        words = build_bloom(keys, "_k", m_bits, k)
        tagged = big.withColumn(
            "_bloom_maybe", might_contain(F.col(big_key), words, m_bits, k)
        )
    else:
        tagged = _with_maybe_flag(big, build_bloom_df(keys, "_k", m_bits, k), big_key, m_bits, k)
    definitely_new = tagged.where(~F.col("_bloom_maybe")).drop("_bloom_maybe")
    survivors = (
        tagged.where(F.col("_bloom_maybe"))
        .drop("_bloom_maybe")
        .join(keys, F.col(big_key) == F.col("_k"), "left_anti")
    )
    return definitely_new.unionByName(survivors)
