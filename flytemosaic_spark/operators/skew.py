"""Skew-mitigation utilities for hot keys at 100 TB.

AQE's skew-join splitting handles most cases at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py); these
helpers cover the two shapes AQE does not:

- :func:`salted_agg` — two-phase aggregation for a groupBy whose key
  distribution is extreme (one key >> one partition). Phase 1
  aggregates on (key, salt) — spreading a hot key over ``n_salts``
  reducers — phase 2 merges the partials. Works for any algebraic
  aggregate (sum/count/min/max and compositions like mean).
- :func:`salted_join` — broadcast-free skewed equi-join: replicate the
  small side ``n_salts`` times, salt the big side randomly; each hot
  key's rows land on ``n_salts`` different reducers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``aggs`` maps output column name → (phase1 aggregate over input
    rows, phase2 merge over phase-1 partials; the phase-2 expression
    references the phase-1 output by its alias). Example — count and
    sum::

        salted_agg(df, ["k"], {
            "n":   (F.count("*"),    F.sum("n")),
            "tot": (F.sum("value"), F.sum("tot")),
        })
    """
    salt = F.floor(F.rand(seed=42) * n_salts).cast("int")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[a1.alias(name) for name, (a1, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[a2.alias(name) for name, (_, a2) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side uniformly, explode
    the small side across all salts, join on (keys + salt). Row-count
    semantics identical to ``big.join(small, on, how)`` for inner/left
    joins on unique small-side keys."""
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return big_s.join(small_s, [*on, "_salt"], how).drop("_salt")
