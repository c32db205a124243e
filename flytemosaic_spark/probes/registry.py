"""Registry plumbing for probe queries (see package docstring)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from flytemosaic_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Probe:
    """A named query with an optional DuckDB oracle.

    ``sql`` is None only for operators that are genuinely not
    SQL-expressible (custom stateful streaming, hash-family-specific
    sketches); the driver then records a weaker rows-only check.
    """

    name: str
    fn: QueryFn
    sql: str | None
    note: str = ""


_REGISTRY: dict[str, Probe] = {}


def probe(name: str, sql: str | None = None, note: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate probe name: {name}")
        _REGISTRY[name] = Probe(name=name, fn=fn, sql=sql, note=note)
        return fn

    return deco


def all_probes() -> dict[str, Probe]:
    return dict(_REGISTRY)


def get_probe(name: str) -> Probe:
    return _REGISTRY[name]


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader used by probe bodies."""
    return load_table(spark, sf_dir, name)
