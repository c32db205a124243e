"""Incremental-skip semantics: anti-join work skipping, existence
bitmaps, byte-budget batching, and the idempotent-rerun contract
(run twice => the second plan is empty; reference scenes.py:93-138)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from flytemosaic_spark.operators.incremental import (
    download_batch,
    existence_bitmap,
    missing,
    successful,
    with_batches,
)


def test_missing_and_successful(spark):
    needed = spark.createDataFrame([(f"u{i}",) for i in range(10)], "url string")
    existing = spark.createDataFrame([(f"u{i}",) for i in range(0, 10, 2)], "url string")
    miss = missing(needed, existing)
    assert sorted(r.url for r in miss.collect()) == [f"u{i}" for i in range(1, 10, 2)]
    ok = successful(needed, existing)
    assert ok.count() == 5


def test_existence_bitmap_local_fs(spark, tmp_path):
    paths = [str(tmp_path / f"f{i}") for i in range(8)]
    for p in paths[:3]:
        open(p, "w").close()
    urls = spark.createDataFrame([(p,) for p in paths], "url string")
    got = {r.url: r.exists for r in existence_bitmap(urls).collect()}
    assert sum(got.values()) == 3
    assert all(got[p] for p in paths[:3])


def test_with_batches_sizing(spark):
    df = spark.createDataFrame(
        [(f"g{i % 2}", i) for i in range(100)], "feature string, idx int"
    )
    out = with_batches(
        df, "feature", "idx", scratch_bytes=40, bytes_per_row=1, safety_factor=4
    )  # 10 rows per batch, 50 rows per group -> 5 batches per group
    per = out.groupBy("feature", "batch").count().collect()
    assert all(r["count"] == 10 for r in per)
    assert out.agg(F.countDistinct("batch")).first()[0] == 5


def test_download_rerun_is_empty(spark, tmp_path):
    """The engine's core incremental contract, end to end."""
    dst_dir = tmp_path / "store"
    dst_dir.mkdir()
    work = spark.createDataFrame(
        [(f"src/{i}", str(dst_dir / f"{i}.bin")) for i in range(6)],
        "url string, dst_url string",
    )

    def fetch(src: str, dst: str) -> None:
        with open(dst, "w") as f:
            f.write(src)

    listing = existence_bitmap(work.select("dst_url"), url_col="dst_url")
    todo = missing(work, listing.where("exists").select("dst_url"), key="dst_url")
    assert todo.count() == 6
    res = download_batch(todo, fetch)
    assert res.where("ok").count() == 6

    # second run: everything exists -> empty plan
    listing2 = existence_bitmap(work.select("dst_url"), url_col="dst_url")
    todo2 = missing(work, listing2.where("exists").select("dst_url"), key="dst_url")
    assert todo2.count() == 0

    # partial failure: delete two outputs, rerun fetches exactly those
    for i in (1, 4):
        os.remove(str(dst_dir / f"{i}.bin"))
    listing3 = existence_bitmap(work.select("dst_url"), url_col="dst_url")
    todo3 = missing(work, listing3.where("exists").select("dst_url"), key="dst_url")
    assert sorted(r.url for r in todo3.collect()) == ["src/1", "src/4"]
    shutil.rmtree(dst_dir)
