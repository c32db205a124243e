"""Probe-query registry: one entry per operator in SURVEY.md §2.

Each probe pairs a Spark DataFrame builder with the equivalent ANSI
SQL that DuckDB runs on the same parquet tables. The driver compares
them (row count + schema + order-insensitive value hash) at sf0.01 —
so every computed column is aliased identically on both sides, and
floating-point aggregates are rounded identically on both sides.
"""

from flytemosaic_spark.probes.registry import Probe, all_probes, get_probe, probe

# Importing the modules populates the registry.
from flytemosaic_spark.probes import relational  # noqa: E402,F401
from flytemosaic_spark.probes import scalars  # noqa: E402,F401
from flytemosaic_spark.probes import extensions  # noqa: E402,F401
from flytemosaic_spark.probes import advanced  # noqa: E402,F401
from flytemosaic_spark.probes import curation  # noqa: E402,F401
from flytemosaic_spark.probes import roundtwo  # noqa: E402,F401
from flytemosaic_spark.probes import tpch  # noqa: E402,F401
from flytemosaic_spark.probes import evaluation  # noqa: E402,F401
from flytemosaic_spark.probes import roundthree  # noqa: E402,F401
from flytemosaic_spark.probes import roundfive  # noqa: E402,F401
from flytemosaic_spark.probes import roundsix  # noqa: E402,F401
from flytemosaic_spark.probes import roundseven  # noqa: E402,F401
from flytemosaic_spark.probes import roundeight  # noqa: E402,F401
from flytemosaic_spark.probes import roundnine  # noqa: E402,F401
from flytemosaic_spark.probes import roundten  # noqa: E402,F401
from flytemosaic_spark.probes import roundeleven  # noqa: E402,F401
from flytemosaic_spark.probes import roundtwelve  # noqa: E402,F401
from flytemosaic_spark.probes import roundthirteen  # noqa: E402,F401
from flytemosaic_spark.probes import roundfourteen  # noqa: E402,F401
from flytemosaic_spark.probes import roundfifteen  # noqa: E402,F401

__all__ = ["Probe", "all_probes", "get_probe", "probe"]
