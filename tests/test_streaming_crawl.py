"""Streaming crawl ingestion (streaming/crawl.py): checkpointed
incremental shard processing + content-converged txlog appends."""

import hashlib
import os

from flytemosaic_spark.operators.html import (
    _warc_page_html,
    extract_main_content,
)
from flytemosaic_spark.sources import txlog
from flytemosaic_spark.sources.warc import write_warc
from flytemosaic_spark.streaming.crawl import ingest_warc_stream


def _shard_bytes(k: int) -> bytes:
    pages = [
        (
            f"https://s{k % 7}.example/p{i}",
            200 if (k + i) % 5 else 404,
            _warc_page_html(k, i).encode(),
        )
        for i in range(3 + k % 5)
    ]
    return write_warc(pages, per_record_gzip=bool(k % 2))


def _content_keys(ks) -> set:
    out = set()
    for k in ks:
        for i in range(3 + k % 5):
            if (k + i) % 5 == 0:
                continue
            t = extract_main_content(_warc_page_html(k, i))["main_text"]
            out.add(hashlib.md5(t.encode()).hexdigest())
    return out


def _write_shards(src, ks):
    for k in ks:
        with open(os.path.join(src, f"shard{k}.warc"), "wb") as f:
            f.write(_shard_bytes(k))


class TestIngest:
    def test_incremental_drains_and_content_convergence(
        self, spark, tmp_path
    ):
        src = str(tmp_path / "landing")
        os.makedirs(src)
        table = str(tmp_path / "corpus")
        ckpt = str(tmp_path / "ckpt")

        batch1 = [0, 1, 2, 3]
        _write_shards(src, batch1)
        ingest_warc_stream(spark, src, table, ckpt)
        assert txlog.latest_version(table) == 0
        got0 = {
            r["h"] for r in txlog.read_snapshot(spark, table).collect()
        }
        assert got0 == _content_keys(batch1)

        # second drain, same checkpoint: only the NEW shards process,
        # and only globally-new content appends
        batch2 = [4, 5, 6]
        _write_shards(src, batch2)
        ingest_warc_stream(spark, src, table, ckpt)
        assert txlog.latest_version(table) == 1
        got1 = {
            r["h"] for r in txlog.read_snapshot(spark, table).collect()
        }
        assert got1 == _content_keys(batch1 + batch2)
        # version 0 unchanged (time travel)
        assert {
            r["h"]
            for r in txlog.read_snapshot(spark, table, 0).collect()
        } == got0

        # third drain with nothing new: NO new version
        ingest_warc_stream(spark, src, table, ckpt)
        assert txlog.latest_version(table) == 1

    def test_replay_is_content_idempotent(self, spark, tmp_path):
        src = str(tmp_path / "landing")
        os.makedirs(src)
        table = str(tmp_path / "corpus")
        _write_shards(src, [0, 1, 2])
        ingest_warc_stream(spark, src, table, str(tmp_path / "c1"))
        before = {
            r["h"] for r in txlog.read_snapshot(spark, table).collect()
        }
        # a FRESH checkpoint replays every shard (at-least-once):
        # the snapshot anti-join must contribute zero new keys
        ingest_warc_stream(spark, src, table, str(tmp_path / "c2"))
        after = {
            r["h"] for r in txlog.read_snapshot(spark, table).collect()
        }
        assert after == before


class TestStreamingCdf:
    """Streaming change feed (streaming/txlog.py): incremental drains
    converge to the batch table_changes result exactly."""

    def test_incremental_drains_match_batch_cdf(self, spark, tmp_path):
        from flytemosaic_spark.sources import txlog
        from flytemosaic_spark.streaming.txlog import (
            read_change_rows,
            stream_table_changes,
        )

        p = str(tmp_path / "t")
        ck = str(tmp_path / "ck")
        out = str(tmp_path / "cdf")

        def _df(rows):
            return spark.createDataFrame(rows, "k long, v string")

        txlog.create_table(spark, p, _df([(1, "a"), (2, "b")]))
        txlog.append(spark, p, _df([(3, "c")]))
        got1 = stream_table_changes(spark, p, ck, out)
        assert got1 == [0, 1]

        # more commits AFTER the first drain: only the delta processes
        txlog.merge_into(spark, p, _df([(2, "B!")]), ["k"])
        tomb = spark.createDataFrame(
            [(1, "a", True)], "k long, v string, dead boolean"
        )
        txlog.merge_into(spark, p, tomb, ["k"], delete_col="dead")
        got2 = stream_table_changes(spark, p, ck, out)
        assert got2 == [2, 3]

        streamed = sorted(
            (r["_commit_version"], r["_change_type"], r["k"], r["v"])
            for r in read_change_rows(spark, out).collect()
        )
        batch = sorted(
            (r["_commit_version"], r["_change_type"], r["k"], r["v"])
            for r in txlog.table_changes(spark, p, 0, 3).collect()
        )
        # version 0 is the initial-snapshot inserts on top of batch CDF
        v0 = [(0, "insert", 1, "a"), (0, "insert", 2, "b")]
        assert streamed == sorted(v0 + batch)

    def test_replay_is_idempotent(self, spark, tmp_path):
        from flytemosaic_spark.sources import txlog
        from flytemosaic_spark.streaming.txlog import (
            read_change_rows,
            stream_table_changes,
        )

        p = str(tmp_path / "t")
        out = str(tmp_path / "cdf")

        def _df(rows):
            return spark.createDataFrame(rows, "k long, v string")

        txlog.create_table(spark, p, _df([(1, "a")]))
        txlog.append(spark, p, _df([(2, "b")]))
        stream_table_changes(spark, p, str(tmp_path / "ck1"), out)
        n1 = read_change_rows(spark, out).count()
        # a FRESH checkpoint re-delivers every commit (at-least-once);
        # per-version overwrite keeps the output identical
        stream_table_changes(spark, p, str(tmp_path / "ck2"), out)
        n2 = read_change_rows(spark, out).count()
        assert n1 == n2 == 2
