"""MERGE semantics: update-wins (including explicit NULLs), insert,
keep, tombstone delete, and the broadcast fast path planning shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from flytemosaic_spark.operators.merge import merge_upsert


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )


def test_merge_update_insert_keep_delete(spark):
    upd = spark.createDataFrame(
        [
            (2, "B", 99.0, False),  # update
            (4, "d", 40.0, False),  # insert
            (3, "c", 30.0, True),  # delete
        ],
        "k int, name string, v double, is_del boolean",
    )
    out = {
        r["k"]: r
        for r in merge_upsert(_base(spark), upd, ["k"], delete_col="is_del").collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1]["_action"] == "kept" and out[1]["v"] == 10.0
    assert out[2]["_action"] == "updated" and out[2]["name"] == "B" and out[2]["v"] == 99.0
    assert out[4]["_action"] == "inserted" and out[4]["v"] == 40.0


def test_merge_null_update_wins(spark):
    """An update that sets a column to NULL overwrites the base value —
    coalesce-based merges get this wrong."""
    upd = spark.createDataFrame([(1, None, 11.0)], "k int, name string, v double")
    out = merge_upsert(_base(spark), upd, ["k"]).where(F.col("k") == 1).first()
    assert out["_action"] == "updated"
    assert out["name"] is None and out["v"] == 11.0


def test_merge_broadcast_path_plans_broadcast_join_and_matches(spark):
    """The split broadcast plan (left join + anti-join inserts) must
    produce the same rows as the full-outer plan and actually plan
    broadcast joins — a full-outer join can never broadcast, which is
    the whole reason the split plan exists."""
    upd = spark.createDataFrame(
        [(2, "B", 99.0, False), (4, "d", 40.0, False), (3, "c", 30.0, True)],
        "k int, name string, v double, is_del boolean",
    )
    bcast = merge_upsert(
        _base(spark), upd, ["k"], delete_col="is_del", broadcast_updates=True
    )
    default = merge_upsert(_base(spark), upd, ["k"], delete_col="is_del")
    assert sorted(map(tuple, bcast.collect())) == sorted(map(tuple, default.collect()))
    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
