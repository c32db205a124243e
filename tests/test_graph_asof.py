"""Unit tests for connected components (dedup clustering) and the
as-of join — hand-built graphs/timelines where the answer is checkable
by eye. Oracle parity at sf0.01 runs via tools/check_correctness.py
(recursive-CTE closure and DuckDB ASOF JOIN respectively)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flytemosaic_spark.operators.asof import asof_join
from flytemosaic_spark.operators.dedup import connected_components


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter > 1 forces iteration), island 10-11, pair 7-20
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 7)], "src bigint, dst bigint"
    )
    lbl = {r["node"]: r["lbl"] for r in connected_components(edges).collect()}
    assert lbl == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 7: 7, 20: 7}


def test_connected_components_long_chain_converges(spark):
    # worst case for min-label propagation: a single path graph with the
    # min id at one end — needs O(diameter) rounds, must still converge
    n = 24
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src bigint, dst bigint"
    )
    out = connected_components(edges)
    assert out.where(F.col("lbl") != 0).count() == 0
    assert out.count() == n + 1


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_join_picks_latest_prior_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(30)), (3, 2, _ts(5)), (4, 3, _ts(9))],
        "id bigint, k bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 1, _ts(9)), (101, 1, _ts(10)), (102, 1, _ts(29)), (103, 2, _ts(6))],
        "rid bigint, k bigint, ts timestamp",
    )
    out = {
        r["id"]: r["asof"]["rid"]
        for r in asof_join(left, right, keys=["k"]).collect()
    }
    # id=1: right row at the SAME timestamp wins (inclusive bound)
    # id=2: latest prior of {9,10,29} is 29; id=3: right is later -> dropped
    # id=4: key 3 has no right rows -> dropped (inner)
    assert out == {1: 101, 2: 102}


def test_asof_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 1, _ts(5))], "id bigint, k bigint, ts timestamp")
    right = spark.createDataFrame(
        [(100, 1, _ts(6))], "rid bigint, k bigint, ts timestamp"
    )
    rows = asof_join(left, right, keys=["k"], how="left").collect()
    assert len(rows) == 1 and rows[0]["asof"] is None
