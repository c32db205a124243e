"""Invariant tests for the round-2 operators: blocked fuzzy matching
(operators/fuzzy.py) and SCD2 history construction (operators/scd.py).
The end-to-end oracle equivalence is covered by the f17/x30 probes;
these tests pin the operator-level invariants the oracle can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from flytemosaic_spark.operators.fuzzy import blocked_fuzzy_pairs
from flytemosaic_spark.operators.scd import scd2_from_changes
from flytemosaic_spark.sources.tables import load_table

SF0001 = "/root/testdata/sf0.001"


def test_fuzzy_pairs_match_unpruned_reference(spark):
    """The length-gap prefilter and the bounded levenshtein must not
    change the result versus the naive blocked plan."""
    part = load_table(spark, SF0001, "part")
    got = blocked_fuzzy_pairs(part, "p_partkey", "p_name", "p_brand", 2)

    a = part.select(
        F.col("p_brand").alias("block"),
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_text"),
    )
    b = part.select(
        F.col("p_brand").alias("block"),
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_text"),
    )
    naive = (
        a.join(b, "block")
        .where(F.col("a_key") < F.col("b_key"))
        .withColumn("dist", F.levenshtein("a_text", "b_text"))
        .where(F.col("dist") <= 2)
        .select("block", "a_key", "b_key", "dist")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_fuzzy_pairs_ordered_and_bounded(spark):
    part = load_table(spark, SF0001, "part")
    rows = blocked_fuzzy_pairs(part, "p_partkey", "p_name", "p_brand", 3).collect()
    assert rows, "expected some near-duplicate part names"
    for r in rows:
        assert r.a_key < r.b_key
        assert 0 <= r.dist <= 3


def test_scd2_intervals_tile_each_key(spark):
    events = load_table(spark, SF0001, "events")
    hist = scd2_from_changes(events, "user_id", "ts", "event_type", "event_id")
    rows = hist.orderBy("user_id", "valid_from").collect()

    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r)
    assert by_key

    for user, ivs in by_key.items():
        # exactly one open (current) interval per key, and it is last
        assert [r.is_current for r in ivs].count(True) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to is None
        for prev, nxt in zip(ivs, ivs[1:]):
            # intervals chain with no gaps or overlaps
            assert prev.valid_to == nxt.valid_from
            # consecutive runs differ (repeats were collapsed)
            assert prev.event_type != nxt.event_type


def test_scd2_covers_every_observed_state(spark):
    """Every (key, ts, attr) observation falls inside an interval
    carrying that attr value."""
    events = load_table(spark, SF0001, "events")
    hist = scd2_from_changes(events, "user_id", "ts", "event_type", "event_id")
    uncovered = (
        events.alias("e")
        .join(
            hist.alias("h"),
            (F.col("e.user_id") == F.col("h.user_id"))
            & (F.col("e.ts") >= F.col("h.valid_from"))
            & (
                F.col("h.valid_to").isNull()
                | (F.col("e.ts") < F.col("h.valid_to"))
            )
            & (F.col("e.event_type") == F.col("h.event_type")),
            "left_anti",
        )
    )
    # boundary events (ts == next interval's valid_from with the OLD
    # value) occur only when two events share a timestamp; allow the
    # equal-ts boundary by also accepting ts == valid_to
    boundary = (
        events.alias("e")
        .join(
            hist.alias("h"),
            (F.col("e.user_id") == F.col("h.user_id"))
            & (F.col("e.ts") == F.col("h.valid_to"))
            & (F.col("e.event_type") == F.col("h.event_type")),
            "left_semi",
        )
    )
    n_unc = uncovered.count()
    n_bnd = boundary.count()
    assert n_unc <= n_bnd
