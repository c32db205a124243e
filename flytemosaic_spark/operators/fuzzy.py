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
    most ``max_dist``. Output: (block, a_key, b_key, dist)."""
    # A small single-file input would otherwise broadcast-join in ONE
    # task and serialize the whole O(sum(block²)) refine; spreading the
    # probe side across the cluster parallelizes it. When the input is
    # big enough that the join is a shuffle join anyway, this exchange
    # is subsumed by the join's own.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    a = df.repartition(parallelism).select(
        F.col(block_col).alias("block"),
        F.col(key_col).alias("a_key"),
        F.col(text_col).alias("a_text"),
    )
    b = df.select(
        F.col(block_col).alias("block"),
        F.col(key_col).alias("b_key"),
        F.col(text_col).alias("b_text"),
    )
    pairs = (
        a.join(b, "block")
        .where(F.col("a_key") < F.col("b_key"))
        # length gap bound: |len(a)-len(b)| > d ⇒ distance > d
        .where(
            F.abs(F.length("a_text") - F.length("b_text")) <= F.lit(max_dist)
        )
    )
    dist = F.levenshtein("a_text", "b_text", max_dist)  # -1 when > bound
    return (
        pairs.withColumn("dist", dist)
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("block", "a_key", "b_key", "dist")
    )
