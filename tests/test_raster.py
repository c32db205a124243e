"""Kernel correctness: long model vs chunk model vs numpy oracle.

The flagship composite (QA-masked temporal mean/median, reference
glad.py:259-282) is implemented twice (SURVEY §1.2); both forms must
agree with the plain-numpy reduction on the same synthetic cube."""

from __future__ import annotations

import numpy as np
import pytest

from flytemosaic_spark.fixtures import raster_long, raster_long_arrays
from flytemosaic_spark.operators.raster import (
    QA_CLEAR,
    band_slice,
    chunks_to_long,
    coarsen_long,
    composite_chunks,
    long_to_chunks,
    masked_temporal_mean_long,
    masked_temporal_median_long,
)

N_TILES, N_TIMES, N_BANDS, SIZE = 2, 4, 4, 16


@pytest.fixture(scope="module")
def cube(spark):
    df = raster_long(spark, N_TILES, N_TIMES, N_BANDS, SIZE).cache()
    arrays = raster_long_arrays(N_TILES, N_TIMES, N_BANDS, SIZE)
    yield df, arrays
    df.unpersist()


def _oracle(arrays, reducer):
    out = {}
    for tile, vals in arrays.items():
        qa = vals[:, N_BANDS - 1 : N_BANDS]
        masked = np.where(qa == QA_CLEAR, vals[:, : N_BANDS - 1], np.nan)
        with np.errstate(invalid="ignore"):
            out[tile] = (np.nanmean if reducer == "mean" else np.nanmedian)(
                masked, axis=0
            ).astype("f4")
    return out


def _to_cube(rows, n_bands, size):
    cubes = {}
    for r in rows:
        cubes.setdefault(r.tile_id, np.full((n_bands, size, size), np.nan, "f4"))[
            r.band - 1, r.y, r.x
        ] = np.nan if r.value is None else r.value
    return cubes


@pytest.mark.parametrize("reducer", ["mean", "median"])
def test_long_model_matches_numpy(cube, reducer):
    df, arrays = cube
    fn = masked_temporal_mean_long if reducer == "mean" else masked_temporal_median_long
    got = _to_cube(fn(df, qa_band=N_BANDS).collect(), N_BANDS - 1, SIZE)
    want = _oracle(arrays, reducer)
    for tile in want:
        np.testing.assert_allclose(got[tile], want[tile], rtol=1e-6, equal_nan=True)


@pytest.mark.parametrize("reducer", ["mean", "median"])
def test_chunk_model_matches_numpy(spark, cube, reducer):
    df, arrays = cube
    chunks = long_to_chunks(df, chunk=8, n_bands=N_BANDS)
    out = composite_chunks(chunks, reducer=reducer, qa_band=N_BANDS)
    got = _to_cube(chunks_to_long(out).collect(), N_BANDS - 1, SIZE)
    want = _oracle(arrays, reducer)
    for tile in want:
        np.testing.assert_allclose(got[tile], want[tile], rtol=1e-6, equal_nan=True)


def test_chunk_roundtrip_preserves_values(spark, cube):
    df, arrays = cube
    back = chunks_to_long(long_to_chunks(df, chunk=8, n_bands=N_BANDS), has_time=True)
    assert back.count() == df.count()
    a = {(r.tile_id, str(r.time), r.band, r.y, r.x): r.value for r in back.collect()}
    b = {(r.tile_id, str(r.time), r.band, r.y, r.x): r.value for r in df.collect()}
    assert a == b


def test_coarsen_matches_numpy(cube):
    df, arrays = cube
    factor = 4
    rows = coarsen_long(df, factor).collect()
    tile = sorted(arrays)[0]
    want = (
        arrays[tile]
        .reshape(N_TIMES, N_BANDS, SIZE // factor, factor, SIZE // factor, factor)
        .mean(axis=(3, 5))
    )
    got = {}
    for r in rows:
        if r.tile_id == tile:
            got[(str(r.time), r.band, r.yb, r.xb)] = r.value
    times = sorted({k[0] for k in got})
    for ti, t in enumerate(times):
        for b in range(N_BANDS):
            for yb in range(SIZE // factor):
                for xb in range(SIZE // factor):
                    np.testing.assert_allclose(
                        got[(t, b + 1, yb, xb)], want[ti, b, yb, xb], rtol=1e-5
                    )


def test_band_slice(cube):
    df, _ = cube
    assert band_slice(df, 1, 3).select("band").distinct().count() == 2
