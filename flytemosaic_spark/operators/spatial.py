"""Grid-binned spatial join — the scalable form of J1.

The reference's only spatial join intersects 19k tile polygons with
ONE query geometry (/root/reference/flytemosaic/datasets/glad.py:236-
239) — broadcast + refine covers that. The general case (two LARGE
box/polygon sets) is a theta join, O(|A|·|B|) if executed naively;
the standard scale plan turns it into an EQUI-join:

1. **Bin**: each bbox explodes to the grid cells it covers
   (``sequence`` over cell ranges — rows grow by the average box/cell
   ratio, a constant you control with the cell size).
2. **Join on cell**: only boxes sharing a cell meet — a plain
   shuffle/broadcast equi-join on (cx, cy).
3. **Refine + dedupe**: exact bbox-overlap predicate, then one
   representative per pair. The dedupe here assigns each candidate
   pair to ONE owner cell (the cell containing the overlap region's
   min corner), so no ``dropDuplicates`` shuffle is needed — the
   duplicate candidates are filtered, not aggregated away.

Same two-phase shape as the engine's bbox-prune + exact-refine
geometry path (functions/geometry.py); the exact polygon test slots
in after the bbox refine unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cells(minc: Column, maxc: Column, g: float) -> Column:
    return F.sequence(
        F.floor(minc / F.lit(g)).cast("long"),
        F.floor(maxc / F.lit(g)).cast("long"),
    )


def grid_bbox_join(
    a: DataFrame,
    b: DataFrame,
    cell: float,
    a_id: str = "a_id",
    b_id: str = "b_id",
) -> DataFrame:
    """All (a, b) pairs whose boxes overlap. Inputs carry
    (id, minx, miny, maxx, maxy); output (a_id, b_id).

    Owner-cell dedupe: a pair is emitted only from the cell holding
    (max(minx), max(miny)) — the overlap region's lower corner — so
    each pair survives exactly once without a distinct."""

    def binned(df: DataFrame, idc: str, prefix: str) -> DataFrame:
        return df.select(
            F.col(idc),
            *[
                F.col(c).alias(f"{prefix}{c}")
                for c in ("minx", "miny", "maxx", "maxy")
            ],
            F.explode(_cells(F.col("minx"), F.col("maxx"), cell)).alias("cx"),
            F.col("miny").alias("_ymin"),
            F.col("maxy").alias("_ymax"),
        ).select(
            "*", F.explode(_cells(F.col("_ymin"), F.col("_ymax"), cell)).alias("cy")
        ).drop("_ymin", "_ymax")

    aa = binned(a.withColumnRenamed(a_id, "a_id"), "a_id", "a_")
    bb = binned(b.withColumnRenamed(b_id, "b_id"), "b_id", "b_")
    j = aa.join(bb, ["cx", "cy"])
    overlap = (
        (F.col("a_minx") <= F.col("b_maxx"))
        & (F.col("b_minx") <= F.col("a_maxx"))
        & (F.col("a_miny") <= F.col("b_maxy"))
        & (F.col("b_miny") <= F.col("a_maxy"))
    )
    owner = (
        F.col("cx")
        == F.floor(F.greatest("a_minx", "b_minx") / F.lit(cell)).cast("long")
    ) & (
        F.col("cy")
        == F.floor(F.greatest("a_miny", "b_miny") / F.lit(cell)).cast("long")
    )
    return j.where(overlap & owner).select("a_id", "b_id")


def zonal_stats(
    pixels: DataFrame,
    zones: DataFrame,
    cell: float,
    value_col: str = "value",
) -> DataFrame:
    """Zonal statistics: aggregate point/pixel values within each
    zone's bbox (count / mean / min / max). ``pixels`` carries
    (x, y, value), ``zones`` carries (zone_id, minx, miny, maxx,
    maxy). A pixel inside several overlapping zones contributes to
    each.

    The classic raster x vector-zone reduction (the zonal form of the
    reference's per-tile composite, glad.py:259-282 aggregates within
    a tile footprint). Physically the same theta→equi rewrite as
    :func:`grid_bbox_join`: each pixel bins to exactly ONE grid cell
    (points need no owner-cell dedupe), zones explode to the cells
    their box covers, and the join key is the cell — so the pairing
    cost is bucket occupancy, never |pixels| x |zones|; the aggregate
    is partial (map-side) per (zone, cell) before the final combine.
    Exact polygon zones compose by refining the bbox matches with
    ``functions.geometry.rect_intersects_polygon``-style tests.
    """
    px = pixels.select(
        "x",
        "y",
        F.col(value_col).alias("_v"),
        F.floor(F.col("x") / F.lit(cell)).cast("long").alias("cx"),
        F.floor(F.col("y") / F.lit(cell)).cast("long").alias("cy"),
    )
    zn = zones.select(
        "zone_id",
        "minx",
        "miny",
        "maxx",
        "maxy",
        F.explode(_cells(F.col("minx"), F.col("maxx"), cell)).alias("cx"),
        F.col("miny").alias("_ymin"),
        F.col("maxy").alias("_ymax"),
    ).select(
        "*", F.explode(_cells(F.col("_ymin"), F.col("_ymax"), cell)).alias("cy")
    ).drop("_ymin", "_ymax")
    inside = (
        (F.col("x") >= F.col("minx"))
        & (F.col("x") <= F.col("maxx"))
        & (F.col("y") >= F.col("miny"))
        & (F.col("y") <= F.col("maxy"))
    )
    return (
        px.join(zn, ["cx", "cy"])
        .where(inside)
        .groupBy("zone_id")
        .agg(
            F.count("*").alias("n_pixels"),
            F.avg("_v").alias("mean_value"),
            F.min("_v").alias("min_value"),
            F.max("_v").alias("max_value"),
        )
    )
