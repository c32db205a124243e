"""Transaction-log table format (sources/txlog.py): snapshot
isolation, time travel, copy-on-write MERGE, atomic exclusive
commits."""

import os

import pytest
from pyspark.sql import functions as F

from flytemosaic_spark.sources import txlog


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


class TestBasics:
    def test_create_read(self, spark, tmp_path):
        p = str(tmp_path / "t")
        v = txlog.create_table(spark, p, _df(spark, [(1, "a"), (2, "b")]))
        assert v == 0
        got = sorted(
            (r["k"], r["v"]) for r in txlog.read_snapshot(spark, p).collect()
        )
        assert got == [(1, "a"), (2, "b")]

    def test_create_twice_fails(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        with pytest.raises(FileExistsError):
            txlog.create_table(spark, p, _df(spark, [(2, "b")]))

    def test_append_and_time_travel(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        txlog.append(spark, p, _df(spark, [(2, "b")]))
        txlog.append(spark, p, _df(spark, [(3, "c")]))
        assert txlog.latest_version(p) == 2
        assert txlog.read_snapshot(spark, p, 0).count() == 1
        assert txlog.read_snapshot(spark, p, 1).count() == 2
        assert txlog.read_snapshot(spark, p).count() == 3
        with pytest.raises(ValueError, match="out of range"):
            txlog.read_snapshot(spark, p, 9)

    def test_overwrite(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a"), (2, "b")]))
        txlog.overwrite(spark, p, _df(spark, [(9, "z")]))
        assert [r["k"] for r in txlog.read_snapshot(spark, p).collect()] == [9]
        # old version still readable (time travel over copy-on-write)
        assert txlog.read_snapshot(spark, p, 0).count() == 2

    def test_history(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        txlog.append(spark, p, _df(spark, [(2, "b")]))
        h = txlog.history(p)
        assert [x["operation"] for x in h] == ["CREATE", "APPEND"]
        assert all(x["n_added"] >= 1 for x in h)


class TestMerge:
    def test_merge_update_insert_delete(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(
            spark, p, _df(spark, [(1, "a"), (2, "b"), (3, "c")])
        )
        upd = _df(spark, [(2, "B"), (4, "d")])
        txlog.merge_into(spark, p, upd, ["k"])
        got = dict(
            (r["k"], r["v"]) for r in txlog.read_snapshot(spark, p).collect()
        )
        assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
        tomb = _df(spark, [(1, "a")]).withColumn("dead", F.lit(True))
        txlog.merge_into(spark, p, tomb, ["k"], delete_col="dead")
        assert sorted(
            r["k"] for r in txlog.read_snapshot(spark, p).collect()
        ) == [2, 3, 4]
        # every prior version still intact
        assert txlog.read_snapshot(spark, p, 0).count() == 3
        assert txlog.read_snapshot(spark, p, 1).count() == 4


class TestIsolation:
    def test_exclusive_commit_loser_raises(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        # two writers race for version 1: the second link loses
        txlog._commit(p, 1, [{"commitInfo": {"operation": "A"}}])
        with pytest.raises(txlog.ConcurrentCommitError):
            txlog._commit(p, 1, [{"commitInfo": {"operation": "B"}}])
        # the winning commit is intact, nothing partial appeared
        assert txlog.history(p)[1]["operation"] == "A"
        assert txlog.latest_version(p) == 1

    def test_loser_retry_succeeds(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        txlog._commit(p, 1, [{"commitInfo": {"operation": "A"}}])
        with pytest.raises(txlog.ConcurrentCommitError):
            txlog._commit(p, 1, [{"commitInfo": {"operation": "B"}}])
        txlog._commit(p, 2, [{"commitInfo": {"operation": "B-retry"}}])
        assert txlog.latest_version(p) == 2

    def test_reader_pins_snapshot(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        df = txlog.read_snapshot(spark, p)  # file list pinned here
        txlog.append(spark, p, _df(spark, [(2, "b")]))
        assert df.count() == 1  # unaffected by the later commit
        assert txlog.read_snapshot(spark, p).count() == 2

    def test_no_partial_state_visible(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        d = txlog._log_dir(p)
        before = set(os.listdir(d))
        with pytest.raises(txlog.ConcurrentCommitError):
            # direct race against the existing version 0
            txlog._commit(p, 0, [{"commitInfo": {"operation": "X"}}])
        assert set(os.listdir(d)) == before  # temp file cleaned up


class TestCheckpoint:
    def test_checkpoint_equivalent_replay(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        for k in range(2, 7):
            txlog.append(spark, p, _df(spark, [(k, "x")]))
        before = txlog.snapshot_files(p)
        v = txlog.write_checkpoint(p)
        assert v == txlog.latest_version(p)
        assert txlog.snapshot_files(p) == before
        # time travel BELOW the checkpoint still replays from 0
        assert txlog.read_snapshot(spark, p, 2).count() == 3
        # commits after the checkpoint replay from it
        txlog.append(spark, p, _df(spark, [(9, "z")]))
        assert txlog.read_snapshot(spark, p).count() == 7

    def test_checkpoint_after_merge(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(
            spark, p, _df(spark, [(1, "a"), (2, "b")])
        )
        txlog.merge_into(spark, p, _df(spark, [(2, "B"), (3, "c")]), ["k"])
        txlog.write_checkpoint(p)
        txlog.append(spark, p, _df(spark, [(4, "d")]))
        got = dict(
            (r["k"], r["v"]) for r in txlog.read_snapshot(spark, p).collect()
        )
        assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
        # checkpoint files never count as commit versions
        assert txlog.latest_version(p) == 2


class TestConcurrentWriters:
    def test_threaded_appends_all_land_via_retry(self, spark, tmp_path):
        # N writers race with real threads; every one must eventually
        # commit (losers retry on the fresh version), versions are
        # distinct and the final snapshot holds all rows
        import threading

        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(0, "seed")]))
        n_writers = 6
        errs = []

        def writer(k):
            try:
                for _ in range(50):  # retry budget
                    v = txlog.latest_version(p)
                    try:
                        txlog._commit(
                            p, v + 1,
                            [{"commitInfo": {"operation": f"W{k}"}},
                             {"add": {"path": f"w{k}.parquet"}}],
                        )
                        return
                    except txlog.ConcurrentCommitError:
                        continue
                errs.append(f"writer {k} exhausted retries")
            except Exception as e:  # pragma: no cover
                errs.append(repr(e))

        threads = [
            threading.Thread(target=writer, args=(k,))
            for k in range(n_writers)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        assert txlog.latest_version(p) == n_writers
        ops = [h["operation"] for h in txlog.history(p)[1:]]
        assert sorted(ops) == sorted(f"W{k}" for k in range(n_writers))
        # every writer's add action is in the final snapshot
        files = txlog.snapshot_files(p)
        for k in range(n_writers):
            assert any(f"w{k}.parquet" in f for f in files)


class TestVacuum:
    def test_vacuum_removes_unreferenced_keeps_recent(
        self, spark, tmp_path
    ):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a"), (2, "b")]))
        txlog.overwrite(spark, p, _df(spark, [(3, "c")]))  # v1
        txlog.overwrite(spark, p, _df(spark, [(4, "d")]))  # v2
        txlog.overwrite(spark, p, _df(spark, [(5, "e")]))  # v3
        stats = txlog.vacuum(p, retain_last=2)
        assert stats["floor"] == 2 and stats["removed"] >= 2
        # retained versions read fine
        assert [r["k"] for r in txlog.read_snapshot(spark, p, 2).collect()] == [4]
        assert [r["k"] for r in txlog.read_snapshot(spark, p, 3).collect()] == [5]
        # vacuumed versions raise CLEANLY, never read missing files
        with pytest.raises(ValueError, match="vacuumed"):
            txlog.read_snapshot(spark, p, 0)
        with pytest.raises(ValueError, match="vacuumed"):
            txlog.read_snapshot(spark, p, 1)

    def test_vacuum_never_touches_referenced_files(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        txlog.append(spark, p, _df(spark, [(2, "b")]))  # v1 refs v0 files
        stats = txlog.vacuum(p, retain_last=1)
        # v1's snapshot includes v0's files (append) -> nothing removed
        assert stats["removed"] == 0
        assert sorted(
            r["k"] for r in txlog.read_snapshot(spark, p).collect()
        ) == [1, 2]

    def test_writes_continue_after_vacuum(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        txlog.overwrite(spark, p, _df(spark, [(2, "b")]))
        txlog.vacuum(p, retain_last=1)
        txlog.append(spark, p, _df(spark, [(3, "c")]))
        assert sorted(
            r["k"] for r in txlog.read_snapshot(spark, p).collect()
        ) == [2, 3]


def _range_table(spark, p, n_buckets=5, per=20):
    """One commit per disjoint k-range so per-file stats partition the
    key space."""
    txlog.create_table(
        spark, p, _df(spark, [(k, f"v{k}") for k in range(per)])
    )
    for b in range(1, n_buckets):
        txlog.append(
            spark,
            p,
            _df(spark, [(b * per + k, f"v{b * per + k}") for k in range(per)]),
        )
    return n_buckets * per


class TestDataSkipping:
    def test_add_actions_carry_stats(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(5, "e"), (9, "i")]))
        adds = txlog._active_adds(p)
        assert adds
        for a in adds.values():
            st = a["stats"]
            assert st["numRecords"] >= 1
            assert st["min"]["k"] >= 5 and st["max"]["k"] <= 9
            assert st["min"]["v"] >= "e" and st["max"]["v"] <= "i"

    def test_point_lookup_opens_fewer_files(self, spark, tmp_path):
        p = str(tmp_path / "t")
        n = _range_table(spark, p)
        all_files = txlog.snapshot_files(p)
        pruned = txlog.snapshot_files(p, predicate=[("k", "=", 42)])
        assert len(pruned) < len(all_files)
        # IO spy: the pruned READ must only open the pruned files
        df = txlog.read_snapshot(spark, p, predicate=[("k", "=", 42)])
        scanned = df.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
        assert {r["f"].replace("file://", "") for r in scanned} <= set(
            pruned
        )
        # and the data under the predicate is complete
        got = df.where(F.col("k") == 42).collect()
        assert [(r["k"], r["v"]) for r in got] == [(42, "v42")]
        assert n == 100

    def test_range_predicates_prune_conservatively(self, spark, tmp_path):
        p = str(tmp_path / "t")
        _range_table(spark, p)
        full = txlog.read_snapshot(spark, p)
        for pred, cond in [
            ([("k", ">=", 60)], F.col("k") >= 60),
            ([("k", "<", 20)], F.col("k") < 20),
            ([("k", ">", 35), ("k", "<=", 55)],
             (F.col("k") > 35) & (F.col("k") <= 55)),
            ([("v", "=", "v7")], F.col("v") == "v7"),
        ]:
            want = sorted(r["k"] for r in full.where(cond).collect())
            got = sorted(
                r["k"]
                for r in txlog.read_snapshot(spark, p, predicate=pred)
                .where(cond)
                .collect()
            )
            assert got == want, pred

    def test_pruning_survives_checkpoint(self, spark, tmp_path):
        p = str(tmp_path / "t")
        _range_table(spark, p)
        txlog.write_checkpoint(p)
        txlog.append(spark, p, _df(spark, [(999, "z")]))
        pruned = txlog.snapshot_files(p, predicate=[("k", "=", 999)])
        assert len(pruned) < len(txlog.snapshot_files(p))
        got = (
            txlog.read_snapshot(spark, p, predicate=[("k", "=", 999)])
            .where(F.col("k") == 999)
            .collect()
        )
        assert [(r["k"], r["v"]) for r in got] == [(999, "z")]


class TestPrunedMerge:
    def test_merge_leaves_untouched_files_in_place(self, spark, tmp_path):
        p = str(tmp_path / "t")
        _range_table(spark, p)
        before = set(txlog.snapshot_files(p))
        upd = _df(spark, [(42, "UPDATED"), (43, "ALSO")])
        txlog.merge_into(spark, p, upd, ["k"])
        after = set(txlog.snapshot_files(p))
        # files provably outside [42, 43] survive the merge unrewritten
        survivors = before & after
        assert survivors, "pruned merge rewrote every file"
        rewritten = before - after
        assert len(rewritten) < len(before)
        got = {
            r["k"]: r["v"] for r in txlog.read_snapshot(spark, p).collect()
        }
        assert got[42] == "UPDATED" and got[43] == "ALSO"
        assert got[41] == "v41" and len(got) == 100

    def test_pruned_equals_unpruned_merge(self, spark, tmp_path):
        pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
        for p in (pa, pb):
            _range_table(spark, p)
        upd = _df(spark, [(7, "X"), (77, "Y"), (500, "NEW")])
        txlog.merge_into(spark, pa, upd, ["k"], prune_files=True)
        txlog.merge_into(spark, pb, upd, ["k"], prune_files=False)
        ga = sorted(
            (r["k"], r["v"])
            for r in txlog.read_snapshot(spark, pa).collect()
        )
        gb = sorted(
            (r["k"], r["v"])
            for r in txlog.read_snapshot(spark, pb).collect()
        )
        assert ga == gb
        assert ("500", "NEW") not in ga and (500, "NEW") in ga

    def test_merge_delete_with_pruning(self, spark, tmp_path):
        p = str(tmp_path / "t")
        _range_table(spark, p)
        tomb = spark.createDataFrame(
            [(13, "v13", True)], "k long, v string, dead boolean"
        )
        txlog.merge_into(spark, p, tomb, ["k"], delete_col="dead")
        ks = sorted(
            r["k"] for r in txlog.read_snapshot(spark, p).collect()
        )
        assert 13 not in ks and len(ks) == 99


class TestSchemaEvolution:
    def test_append_new_column_requires_flag(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        wide = spark.createDataFrame(
            [(2, "b", 3.5)], "k long, v string, score double"
        )
        with pytest.raises(ValueError, match="merge_schema"):
            txlog.append(spark, p, wide)
        txlog.append(spark, p, wide, merge_schema=True)
        got = {r["k"]: r for r in txlog.read_snapshot(spark, p).collect()}
        assert got[1]["score"] is None  # null backfill on old files
        assert got[2]["score"] == 3.5

    def test_time_travel_keeps_old_schema(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        wide = spark.createDataFrame(
            [(2, "b", 3.5)], "k long, v string, score double"
        )
        txlog.append(spark, p, wide, merge_schema=True)
        v0 = txlog.read_snapshot(spark, p, 0)
        assert v0.columns == ["k", "v"]
        v1 = txlog.read_snapshot(spark, p, 1)
        assert v1.columns == ["k", "v", "score"]

    def test_narrow_append_null_backfills(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a")]))
        narrow = spark.createDataFrame([(9,)], "k long")
        txlog.append(spark, p, narrow)  # fewer cols: always legal
        got = {r["k"]: r["v"] for r in txlog.read_snapshot(spark, p).collect()}
        assert got == {1: "a", 9: None}


class TestEmptySnapshotAndCDF:
    def test_fully_deleted_table_reads_empty_typed(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a"), (2, "b")]))
        tomb = spark.createDataFrame(
            [(1, "a", True), (2, "b", True)],
            "k long, v string, dead boolean",
        )
        txlog.merge_into(spark, p, tomb, ["k"], delete_col="dead")
        snap = txlog.read_snapshot(spark, p)
        assert snap.columns == ["k", "v"] and snap.count() == 0

    def test_change_feed_insert_update_delete(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a"), (2, "b")]))
        txlog.append(spark, p, _df(spark, [(3, "c")]))                 # v1
        txlog.merge_into(spark, p, _df(spark, [(2, "B!")]), ["k"])     # v2
        tomb = spark.createDataFrame(
            [(1, "a", True)], "k long, v string, dead boolean"
        )
        txlog.merge_into(spark, p, tomb, ["k"], delete_col="dead")     # v3
        cdf = txlog.table_changes(spark, p, 0, 3).collect()
        got = sorted(
            (r["_commit_version"], r["_change_type"], r["k"], r["v"])
            for r in cdf
        )
        assert got == [
            (1, "insert", 3, "c"),
            (2, "delete", 2, "b"),
            (2, "insert", 2, "B!"),
            (3, "delete", 1, "a"),
        ]

    def test_change_feed_cow_rewrites_cancel(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(
            spark, p, _df(spark, [(k, f"v{k}") for k in range(50)])
        )
        txlog.merge_into(
            spark, p, _df(spark, [(7, "SEVEN")]), ["k"],
            prune_files=False,  # force a full rewrite
        )
        cdf = txlog.table_changes(spark, p, 0, 1).collect()
        got = sorted(
            (r["_change_type"], r["k"], r["v"]) for r in cdf
        )
        # 49 rows were rewritten IDENTICALLY and must cancel
        assert got == [("delete", 7, "v7"), ("insert", 7, "SEVEN")]

    def test_change_feed_bag_multiplicity(self, spark, tmp_path):
        # the r10 one-pass signed-count diff must REPLICATE rows whose
        # add/remove counts differ by more than one (bag semantics,
        # exactly what the exceptAll pair emitted)
        p = str(tmp_path / "t")
        txlog.create_table(
            spark, p, _df(spark, [(1, "a"), (1, "a"), (2, "b")])
        )
        txlog.overwrite(
            spark, p, _df(spark, [(1, "a"), (2, "b"), (2, "b"), (2, "b")])
        )
        cdf = txlog.table_changes(spark, p, 0, 1).collect()
        got = sorted((r["_change_type"], r["k"], r["v"]) for r in cdf)
        assert got == [
            ("delete", 1, "a"),
            ("insert", 2, "b"),
            ("insert", 2, "b"),
        ]


class TestOptimize:
    def test_compaction_preserves_data_and_history(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(0, "v0")]))
        for k in range(1, 12):
            txlog.append(spark, p, _df(spark, [(k, f"v{k}")]))
        v_pre = txlog.latest_version(p)
        n_files_pre = len(txlog.snapshot_files(p))
        v = txlog.optimize(spark, p, target_files=2)
        assert v == v_pre + 1
        n_files_post = len(txlog.snapshot_files(p))
        assert n_files_post < n_files_pre and n_files_post <= 2
        got = sorted(
            (r["k"], r["v"]) for r in txlog.read_snapshot(spark, p).collect()
        )
        assert got == [(k, f"v{k}") for k in range(12)]
        # pre-optimize versions still time travel
        assert txlog.read_snapshot(spark, p, 3).count() == 4
        assert txlog.history(p)[-1]["operation"] == "OPTIMIZE"

    def test_optimize_noop_when_nothing_small(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(
            spark, p, _df(spark, [(k, f"v{k}") for k in range(10)])
        )
        v = txlog.optimize(spark, p, small_file_rows=1)
        assert v == txlog.latest_version(p)  # no new commit

    def test_cdf_emits_nothing_for_optimize(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(0, "a")]))
        for k in range(1, 6):
            txlog.append(spark, p, _df(spark, [(k, f"v{k}")]))
        v0 = txlog.latest_version(p)
        v1 = txlog.optimize(spark, p, target_files=1)
        assert v1 == v0 + 1
        assert txlog.table_changes(spark, p, v0, v1).count() == 0

    def test_zorder_tightens_both_dimensions(self, spark, tmp_path):
        p = str(tmp_path / "t")
        rows = [
            (i, i % 64, (i * 7) % 64, f"r{i}") for i in range(4096)
        ]
        df = spark.createDataFrame(
            rows, "k long, x long, y long, v string"
        )
        txlog.create_table(spark, p, df)
        pred = [("y", ">=", 8), ("y", "<", 16)]
        before = len(txlog.snapshot_files(p, predicate=pred))
        total_before = len(txlog.snapshot_files(p))
        txlog.optimize(spark, p, zorder_by=["y", "x"], target_files=16)
        after = len(txlog.snapshot_files(p, predicate=pred))
        total_after = len(txlog.snapshot_files(p))
        # hash-written files all span the y range; z-ordered ones don't
        assert before == total_before
        assert after < total_after
        # x predicate must ALSO prune (that is the z-order point)
        predx = [("x", ">=", 0), ("x", "<", 8)]
        assert len(txlog.snapshot_files(p, predicate=predx)) < total_after
        got = sorted(
            r["k"]
            for r in txlog.read_snapshot(spark, p, predicate=pred)
            .where((F.col("y") >= 8) & (F.col("y") < 16))
            .collect()
        )
        want = sorted(i for i in range(4096) if 8 <= (i * 7) % 64 < 16)
        assert got == want

    def test_zorder_single_column(self, spark, tmp_path):
        p = str(tmp_path / "t")
        df = _df(spark, [(k, f"v{k}") for k in range(1000)])
        txlog.create_table(spark, p, df)
        txlog.optimize(spark, p, zorder_by=["k"], target_files=8)
        pred = [("k", ">=", 100), ("k", "<", 200)]
        assert len(txlog.snapshot_files(p, predicate=pred)) < len(
            txlog.snapshot_files(p)
        )
        assert txlog.read_snapshot(spark, p).count() == 1000


class TestBloomIndex:
    def test_point_lookup_prunes_past_range_overlap(self, spark, tmp_path):
        p = str(tmp_path / "t")
        # interleaved keys: every file's RANGE covers every key, so
        # min/max pruning keeps everything — the bloom must not
        # repartition(2): every file spans (almost) the full key
        # range, so min/max pruning keeps everything
        txlog.create_table(
            spark, p,
            _df(spark, [(k, f"v{k}") for k in range(0, 400, 4)])
            .repartition(2),
        )
        for off in (1, 2, 3):
            txlog.append(
                spark, p,
                _df(spark, [(k, f"v{k}") for k in range(off, 400, 4)])
                .repartition(2),
            )
        pred = [("k", "=", 41)]
        range_only = len(txlog.snapshot_files(p, predicate=pred))
        total = len(txlog.snapshot_files(p))
        assert range_only == total  # ranges don't help here
        txlog.attach_blooms(spark, p, ["k"])
        bloomed = len(txlog.snapshot_files(p, predicate=pred))
        assert bloomed < total
        got = (
            txlog.read_snapshot(spark, p, predicate=pred)
            .where(F.col("k") == 41)
            .collect()
        )
        assert [(r["k"], r["v"]) for r in got] == [(41, "v41")]

    def test_parallel_file_meta_path_matches_serial(
        self, spark, tmp_path, monkeypatch
    ):
        # force the distributed footer-stat / bloom-build path (the
        # r10 guide-§5 driver-loop fix, normally gated at 32 files)
        # and prove it produces the same commit metadata the serial
        # loop does
        monkeypatch.setattr(txlog, "_PARALLEL_FILE_META", 0)
        p = str(tmp_path / "t")
        df = _df(spark, [(k, f"v{k}") for k in range(40)]).repartition(4)
        txlog.create_table(spark, p, df)
        adds = txlog._active_adds(p, txlog.latest_version(p))
        assert len(adds) >= 2
        for add in adds.values():
            st = add["stats"]
            assert st["numRecords"] > 0 and "k" in st["min"]
        txlog.attach_blooms(spark, p, ["k"])
        pred = [("k", "=", 7)]
        assert len(txlog.snapshot_files(p, predicate=pred)) < len(
            txlog.snapshot_files(p)
        )
        got = sorted(
            (r["k"], r["v"])
            for r in txlog.read_snapshot(spark, p).collect()
        )
        assert got == [(k, f"v{k}") for k in range(40)]

    def test_bloom_commit_is_metadata_only(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(spark, p, _df(spark, [(1, "a"), (2, "b")]))
        v0 = txlog.latest_version(p)
        v1 = txlog.attach_blooms(spark, p, ["k", "v"])
        assert v1 == v0 + 1
        # same files, same data, AND the change feed emits nothing
        assert txlog.read_snapshot(spark, p).count() == 2
        assert txlog.table_changes(spark, p, v0, v1).count() == 0
        assert txlog.history(p)[-1]["operation"] == "BLOOM"
        # idempotent: nothing missing -> no new commit
        assert txlog.attach_blooms(spark, p, ["k"]) == v1

    def test_point_merge_rewrites_fewer_files_with_bloom(
        self, spark, tmp_path
    ):
        pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
        for p in (pa, pb):
            txlog.create_table(
                spark, p,
                _df(spark, [(k, f"v{k}") for k in range(0, 300, 3)]),
            )
            txlog.append(
                spark, p,
                _df(spark, [(k, f"v{k}") for k in range(1, 300, 3)]),
            )
            txlog.append(
                spark, p,
                _df(spark, [(k, f"v{k}") for k in range(2, 300, 3)]),
            )
        txlog.attach_blooms(spark, pa, ["k"])
        upd = _df(spark, [(77, "UPDATED")])
        before_a = set(txlog.snapshot_files(pa))
        txlog.merge_into(spark, pa, upd, ["k"])
        txlog.merge_into(spark, pb, upd, ["k"])
        survivors_a = before_a & set(txlog.snapshot_files(pa))
        # the bloomed table rewrote only bloom-positive files
        assert len(survivors_a) > 0
        ga = {r["k"]: r["v"] for r in txlog.read_snapshot(spark, pa).collect()}
        gb = {r["k"]: r["v"] for r in txlog.read_snapshot(spark, pb).collect()}
        assert ga == gb and ga[77] == "UPDATED"

    def test_bloom_survives_checkpoint(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txlog.create_table(
            spark, p, _df(spark, [(k, f"v{k}") for k in range(100)])
        )
        txlog.attach_blooms(spark, p, ["k"])
        txlog.write_checkpoint(p)
        txlog.append(spark, p, _df(spark, [(999, "z")]))
        adds = txlog._active_adds(p)
        assert any(
            (a.get("stats") or {}).get("bloom", {}).get("k")
            for a in adds.values()
        )
