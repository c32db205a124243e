"""Shared Spark fixture. One session per test run — local mode with a
small core count so the suite stays fast; every config the engine
relies on (AQE, Arrow, UTC) comes from the same factory production
uses (flytemosaic_spark.session.get_spark)."""

from __future__ import annotations

import pytest

from flytemosaic_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8, driver_memory="8g")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF0001
