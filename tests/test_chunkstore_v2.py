"""Custom DataSource (`format("chunkstore")`): read/write round-trip,
file-pruning filter pushdown, and interop with the functional API."""

from __future__ import annotations

import numpy as np
import pytest

from flytemosaic_spark.plans.partitioner import plan_partitions
from flytemosaic_spark.sources.chunkstore import (
    read_array,
    write_region_chunks,
    write_template,
)
from flytemosaic_spark.sources.chunkstore_v2 import register

SHAPE = (2, 3, 40, 50)
CHUNKS = (1, 3, 16, 16)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _store(spark, tmp_path, compression=None, seed=7):
    path = str(tmp_path / "store")
    rng = np.random.default_rng(seed)
    cube = rng.standard_normal(SHAPE).astype("f4")
    write_template(path, SHAPE, CHUNKS, compression_level=compression)
    plan = plan_partitions(
        spark, SHAPE[0], [0, 1, 2], SHAPE[2], SHAPE[3], CHUNKS[2], CHUNKS[3]
    ).collect()
    rows = []
    for r in plan:
        block = cube[r.t, r.band0 : r.band1, r.y0 : r.y1, r.x0 : r.x1]
        rows.append(
            (int(r.t), int(r.band0), int(r.y0), int(r.x0),
             list(block.shape), block.ravel().tolist())
        )
    df = spark.createDataFrame(
        rows, "t int, b0 int, y0 int, x0 int, shape array<int>, payload array<float>"
    )
    return path, cube, df


def test_datasource_write_then_functional_read(spark, tmp_path):
    path, cube, df = _store(spark, tmp_path)
    df.write.format("chunkstore").option("path", path).mode("append").save()
    np.testing.assert_array_equal(read_array(path), cube)


def test_datasource_read_roundtrip(spark, tmp_path):
    path, cube, df = _store(spark, tmp_path, compression=1)
    write_region_chunks(df, path)
    got = spark.read.format("chunkstore").option("path", path).load()
    # reassemble from scan rows
    out = np.full(SHAPE, np.nan, "f4")
    for r in got.collect():
        nb, ny, nx = r.shape
        block = np.asarray(r.payload, "f4").reshape(nb, ny, nx)
        ys = min(ny, SHAPE[2] - r.y0)
        xs = min(nx, SHAPE[3] - r.x0)
        out[r.t, r.b0 : r.b0 + nb, r.y0 : r.y0 + ys, r.x0 : r.x0 + xs] = block[
            :, :ys, :xs
        ]
    np.testing.assert_array_equal(out, cube)


def test_filter_pushdown_prunes_files(spark, tmp_path):
    path, cube, df = _store(spark, tmp_path)
    write_region_chunks(df, path)
    def fresh():
        return spark.read.format("chunkstore").option("path", path).load()

    rows = fresh().where("t = 1 AND y0 >= 16").collect()
    assert rows and all(r.t == 1 and r.y0 >= 16 for r in rows)
    # pruned scan returns fewer chunk rows than the full scan
    assert len(rows) < fresh().count()


def test_empty_result_when_filter_excludes_all(spark, tmp_path):
    path, cube, df = _store(spark, tmp_path)
    write_region_chunks(df, path)
    scan = spark.read.format("chunkstore").option("path", path).load()
    assert scan.where("t = 99").count() == 0
