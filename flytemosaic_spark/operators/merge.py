"""MERGE / upsert as a declarative join — the incremental-maintenance
primitive (Delta/Iceberg ``MERGE INTO`` semantics) expressed engine-
agnostically, matching how the reference maintains its catalogs by
re-running idempotent builds (reference flyte/scenes.py:93-99 skips
existing rows; this operator is the general form that also *updates*).

Scale shape: the default plan is one shuffled full-outer equi-join on
the merge keys (bucketing both tables on the key, sources/bucketed.py,
removes the shuffle). But the changes side of a merge is normally
orders of magnitude smaller than the base, and a full-outer join can
never broadcast — so ``broadcast_updates=True`` switches to the split
plan: a broadcast LEFT join handles update/keep/delete in a pure map
stage over the base scan, and inserts come from a tiny anti-join of
the updates against the (≤|updates|-sized) matched-key set. The base
is scanned twice and shuffled zero times — the right trade at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    broadcast_updates: bool = False,
) -> DataFrame:
    """Upsert ``updates`` into ``base`` on ``key_cols``.

    - matched row → update side wins, column by column;
    - update-only key → inserted;
    - base-only key → kept unchanged;
    - ``delete_col`` (boolean on updates), when set, drops matched rows
      instead of updating them (tombstone merge).

    Output schema = base schema + ``_action`` ∈
    {'updated','inserted','kept'} for auditability (drop it when
    writing). Both inputs must share the base schema (plus the
    optional tombstone column).
    """
    value_cols = [c for c in base.columns if c not in key_cols]
    u_cols = [*key_cols, *value_cols] + ([delete_col] if delete_col else [])
    u = updates.select(
        *key_cols,
        *[F.col(c).alias(f"_u_{c}") for c in value_cols],
        *( [F.col(delete_col).alias("_del")] if delete_col else [] ),
        F.lit(True).alias("_has_u"),
    )
    assert set(u_cols) <= set(updates.columns), "updates must carry the base schema"
    b = base.select(
        *key_cols,
        *[F.col(c).alias(f"_b_{c}") for c in value_cols],
        F.lit(True).alias("_has_b"),
    )
    # _has_u flag, not coalesce on the value: an update that
    # legitimately sets a column to NULL must win over the base
    merged_vals = [
        F.when(F.col("_has_u").isNotNull(), F.col(f"_u_{c}"))
        .otherwise(F.col(f"_b_{c}"))
        .alias(c)
        for c in value_cols
    ]

    if broadcast_updates:
        j = b.join(F.broadcast(u), key_cols, "left")
        if delete_col:
            j = j.where(~F.coalesce(F.col("_del"), F.lit(False)))
        matched = j.select(
            *key_cols,
            *merged_vals,
            F.when(F.col("_has_u").isNotNull(), "updated")
            .otherwise("kept")
            .alias("_action"),
        )
        # keys present in both sides — at most |updates| rows, so it is
        # the broadcastable build side of the insert anti-join
        matched_keys = (
            b.join(F.broadcast(u.select(*key_cols)), key_cols, "left_semi")
            .select(*key_cols)
            .distinct()
        )
        ins = updates
        if delete_col:
            ins = ins.where(~F.coalesce(F.col(delete_col), F.lit(False)))
        inserts = ins.join(F.broadcast(matched_keys), key_cols, "left_anti").select(
            *key_cols,
            *[F.col(c).alias(c) for c in value_cols],
            F.lit("inserted").alias("_action"),
        )
        return matched.unionByName(inserts)

    j = b.join(u, key_cols, "full_outer")
    if delete_col:
        j = j.where(~F.coalesce(F.col("_del"), F.lit(False)))
    action = (
        F.when(F.col("_has_u").isNotNull() & F.col("_has_b").isNotNull(), "updated")
        .when(F.col("_has_u").isNotNull(), "inserted")
        .otherwise("kept")
    )
    return j.select(*key_cols, *merged_vals, action.alias("_action"))
