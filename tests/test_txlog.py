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
