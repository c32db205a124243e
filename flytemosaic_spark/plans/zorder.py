"""Z-order (Morton) clustering for multi-dimensional scan pruning.

A 100 TB table sorted on one column prunes row groups only for
predicates on that column; predicates on a second column scan
everything. Interleaving the bits of both columns into one sort key
(the Z-order / Morton curve) makes every row group a small rectangle
in (a, b) space, so parquet min/max footer statistics prune on
EITHER dimension — the layout technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``, here as plain column expressions + a
``repartitionByRange`` write.

Everything is JVM-side bit arithmetic (shifts, masks, a literal-bound
fold); the only driver-side work is the min/max collection used to
normalize each column into the 2^bits grid — two scalars per column,
metadata scale. ``tests/test_zorder.py`` verifies the pruning claim
against the parquet footers themselves: for a point predicate on
either dimension, the fraction of row groups whose [min, max] spans
the value drops by an order of magnitude versus a single-column sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) as a long."""
    span = max(hi - lo, 1e-12)
    scaled = (c.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(
        float((1 << bits) - 1)
    )
    return F.least(
        F.greatest(scaled.cast("bigint"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton key: bit i of ``a`` goes to position 2i, of ``b`` to
    2i+1 — a fold over literal shift amounts, pure codegen."""
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> DataFrame:
    """Append ``_zkey``, the Morton interleave of the two columns
    normalized to their observed ranges."""
    lo_a, hi_a, lo_b, hi_b = df.select(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    return df.withColumn(
        "_zkey",
        _interleave(
            _normalize(F.col(col_a), float(lo_a), float(hi_a), bits),
            _normalize(F.col(col_b), float(lo_b), float(hi_b), bits),
            bits,
        ),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered on the Z-curve: range-partition by the
    Morton key (so files tile the curve), sort within partitions, drop
    the key. Downstream scans prune row groups on either column's
    min/max footer stats."""
    (
        zorder_key(df, col_a, col_b, bits)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
