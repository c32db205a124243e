"""Write-partition planner invariants.

Ports the reference's strongest test — the exactly-once coverage
property (reference: tests/unit/flytemosaic/test_mosaics.py:45-68,
"target += 1 then sum == size") — plus its size-law and error-path
cases (test_mosaics.py:9-42, :71-85), re-expressed over the DataFrame
planner."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flytemosaic_spark.plans.partitioner import plan_partitions, square_multiplier


def _coverage(plan_rows, n_time, n_bands, ny, nx) -> np.ndarray:
    cube = np.zeros((n_time, n_bands, ny, nx), dtype=np.int32)
    for r in plan_rows:
        cube[r.t, r.band0 : r.band1, r.y0 : r.y1, r.x0 : r.x1] += 1
    return cube


def test_exactly_once_coverage(spark):
    n_time, bands, ny, nx, cy, cx = 3, [0, 1, 2], 100, 130, 32, 32
    rows = plan_partitions(
        spark, n_time, bands, ny, nx, cy, cx, budget_bytes=4 * 32 * 32 * 3 * 4
    ).collect()
    cube = _coverage(rows, n_time, len(bands), ny, nx)
    assert cube.min() == 1 and cube.max() == 1  # every element exactly once


@settings(max_examples=15, deadline=None)
@given(
    ny=st.integers(5, 200),
    nx=st.integers(5, 200),
    chunk=st.integers(4, 64),
    n_time=st.integers(1, 4),
    mult=st.integers(1, 5),
)
def test_exactly_once_coverage_property(spark, ny, nx, chunk, n_time, mult):
    bands = [0, 1]
    budget = mult * mult * chunk * chunk * len(bands) * 4
    rows = plan_partitions(
        spark, n_time, bands, ny, nx, chunk, chunk, budget_bytes=budget
    ).collect()
    cube = _coverage(rows, n_time, len(bands), ny, nx)
    assert cube.min() == 1 and cube.max() == 1


def test_partition_byte_sizes_step_squares(spark):
    # budget for a 2x2 block of chunks -> every interior partition is
    # exactly 4 chunks' bytes (the n-squared growth law,
    # reference mosaics.py:240-243, 281)
    chunk, bands = 16, [0]
    budget = 4 * chunk * chunk * len(bands) * 4
    assert square_multiplier(budget, chunk * chunk * len(bands) * 4) == 2
    rows = plan_partitions(
        spark, 1, bands, 64, 64, chunk, chunk, budget_bytes=budget
    ).collect()
    assert all(r.n_bytes == budget for r in rows)
    assert len(rows) == 4  # 64/(16*2) squared


def test_non_contiguous_bands_raise(spark):
    with pytest.raises(ValueError, match="non-contiguous"):
        plan_partitions(spark, 1, [0, 2], 32, 32, 16, 16)


def test_seeded_shuffle_is_deterministic_multiset(spark):
    a = plan_partitions(spark, 2, [0], 64, 64, 16, 16, shuffle_seed=7).collect()
    b = plan_partitions(spark, 2, [0], 64, 64, 16, 16, shuffle_seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == len(set(map(tuple, a)))
