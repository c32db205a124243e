"""Blocked fuzzy matching (edit-distance candidate pairs).

The reference's dedup surface is exact-key only (url / dst_url
drop-duplicates, /root/reference/flyte/scenes.py:129); a corpus
pipeline also needs *fuzzy* entity matching — near-identical names,
titles, or addresses. The scalable shape is the classic two-phase
record-linkage plan:

1. **Block**: equi-join on a cheap blocking key (brand, prefix,
   phonetic code, LSH band...). This is the only shuffle, and it
   bounds the candidate-pair count to sum(block_size**2) instead of
   n**2 — at 100 TB the blocking key IS the scalability knob.
2. **Refine**: exact ``levenshtein`` on the candidate pairs, with a
   length pre-filter (|len(a)-len(b)| <= max_dist implies no need to
   compute the DP matrix) and Spark's bounded-threshold levenshtein,
   which abandons a pair as soon as the running distance exceeds the
   bound (O(d*min(m,n)) instead of O(m*n)).

Everything is JVM-side column expressions — no Python UDFs; the
equi-join on the block key broadcasts or sort-merges per Catalyst
stats, and skewed blocks are AQE-splittable because the refine is
stateless per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    block_col: str,
    max_dist: int,
) -> DataFrame:
    """All unordered pairs within a block whose edit distance is at
    most ``max_dist``. Output: (block, a_key, b_key, dist).

    Physical plan (duplication-robust): the expensive levenshtein
    refine runs over DISTINCT (block, text) values only — cost
    O(sum(distinct_block²)), immune to how many rows share a text —
    and the matched text pairs are then re-expanded to key pairs with
    two linear equi-joins. A corpus where popular names repeat
    thousands of times (the common case in entity resolution) pays
    the DP matrix once per text pair, not once per row pair. The
    10x scale sweep that exposed the row-pair formulation going
    quadratic (48x cost at 10x data) runs ~linear-in-output with this
    plan.
    """
    # Second blocking dimension, for free from the metric: strings
    # within edit distance d differ in length by at most d, so texts
    # bucketed by length div (d+1) can only pair with their own or an
    # adjacent bucket. The probe side explodes to its 3 candidate
    # buckets, subdividing every user block by length spread.
    w = max_dist + 1
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    texts = (
        df.select(F.col(block_col).alias("block"), F.col(text_col).alias("text"))
        .distinct()
    )
    lb = F.floor(F.length("text") / F.lit(w))
    # A small single-file input would otherwise broadcast-join in ONE
    # task and serialize the whole refine; spreading the probe side
    # across the cluster parallelizes it. When the input is big enough
    # that the join is a shuffle join anyway, this exchange is
    # subsumed by the join's own.
    a = texts.repartition(parallelism).select(
        "block",
        F.col("text").alias("a_text"),
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("len_bucket"),
    )
    b = texts.select(
        "block", F.col("text").alias("b_text"), lb.alias("len_bucket")
    )
    # a_text <= b_text keeps each unordered TEXT pair once; equality
    # stays in (dist 0) so duplicate-text row pairs regenerate below
    cand = (
        a.join(b, ["block", "len_bucket"])
        .where(F.col("a_text") <= F.col("b_text"))
        # exact length gap bound: |len(a)-len(b)| > d ⇒ distance > d
        .where(
            F.abs(F.length("a_text") - F.length("b_text")) <= F.lit(max_dist)
        )
    )
    dist = F.when(
        F.col("a_text") == F.col("b_text"), F.lit(0)
    ).otherwise(
        F.levenshtein("a_text", "b_text", max_dist)  # -1 when > bound
    )
    text_pairs = (
        cand.withColumn("dist", dist)
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("block", "a_text", "b_text", "dist")
    )
    # expand matched text pairs back to key pairs (linear joins on
    # (block, text)); same-text pairs take key< to avoid double-count,
    # cross-text pairs normalize with least/greatest
    rows_a = df.select(
        F.col(block_col).alias("block"),
        F.col(text_col).alias("a_text"),
        F.col(key_col).alias("ka"),
    )
    rows_b = df.select(
        F.col(block_col).alias("block"),
        F.col(text_col).alias("b_text"),
        F.col(key_col).alias("kb"),
    )
    expanded = (
        text_pairs.join(rows_a, ["block", "a_text"])
        .join(rows_b, ["block", "b_text"])
        .where(
            (F.col("a_text") < F.col("b_text")) | (F.col("ka") < F.col("kb"))
        )
    )
    return expanded.select(
        "block",
        F.least("ka", "kb").alias("a_key"),
        F.greatest("ka", "kb").alias("b_key"),
        "dist",
    )
