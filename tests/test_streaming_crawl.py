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
