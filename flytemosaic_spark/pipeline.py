"""End-to-end mosaic build — the reference's flagship workflow
(`build_dataset_mosaic_workflow`, reference flyte/build.py:179-228)
as ONE Spark job instead of a Flyte task DAG.

Stages (SURVEY §3.1, boundaries become shuffles instead of pods):

1. catalog planning — (bbox, times) → (tile, snapped-time) targets and
   their covering scene periods (reference flyte/scenes.py:29-57);
   pure column expressions, broadcast joins.
2. scene materialization — one row per (tile, time, period) scene
   payload via ``mapInPandas`` (here a deterministic synthetic source;
   a real deployment reads COGs the same way — the Spark shape is
   identical, reference utils.py:99-151).
3. composite kernel — ``groupBy(tile, time).applyInPandas`` QA-masked
   temporal mean/median over each target's scene stack (reference
   glad.py:259-282). The groupBy shuffle is the ONLY data shuffle in
   the whole pipeline.
4. mosaic assembly — map each tile onto the global pixel grid from the
   tile index (broadcast join; reference mosaics.py:116-175 does this
   with GTI metadata), producing chunk-aligned region rows.
5. template + region-parallel writes — S9/S10 two-phase sink into the
   Zarr-compatible chunk store; partitions disjoint by construction.

At 100 TB: stage 2/3 scale with (tiles × times × periods) and
shuffle once on (tile, time); stage 4 is a metadata broadcast; stage 5
writes are embarrassingly parallel and idempotent.
"""

from __future__ import annotations

import datetime as dt
import os
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.functions.temporal import clamp, date_to_period
from flytemosaic_spark.operators.catalog import EARLIEST, feature_targets
from flytemosaic_spark.operators.raster import QA_CLEAR
from flytemosaic_spark.sources.chunkstore import write_region_chunks, write_template


def synthetic_scene(tile_id: str, period: int, n_bands: int, size: int) -> np.ndarray:
    """Deterministic fake scene (bands, y, x); band ``n_bands`` is the
    QA flag. Stands in for a COG read — same array contract."""
    seed = (zlib.crc32(tile_id.encode()) & 0x7FFFFFFF) ^ period
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 4000, size=(n_bands, size, size)).astype("f4")
    arr[n_bands - 1] = rng.integers(0, 2, size=(size, size))
    return arr


def target_scene_periods(
    spark: SparkSession,
    tile_index: DataFrame,
    bbox: tuple[float, float, float, float],
    times: list[dt.datetime],
    window_days: int = 365,
    latest: str = "2026-01-01",
) -> DataFrame:
    """Stage 1 — (tile_id, time, period) for every scene feeding every
    (tile, snapped-time) composite target (J6 cross + J7 expansion)."""
    targets = feature_targets(spark, tile_index, bbox, times).select("tile_id", "time")
    lo = date_to_period(
        clamp(
            F.col("time") - F.expr(f"INTERVAL {window_days} DAYS"),
            F.lit(EARLIEST).cast("timestamp"),
            F.lit(latest).cast("timestamp"),
        )
    )
    hi = date_to_period(
        clamp(
            F.col("time"),
            F.lit(EARLIEST).cast("timestamp"),
            F.lit(latest).cast("timestamp"),
        )
    )
    return targets.select(
        "tile_id", "time", F.explode(F.sequence(lo, hi)).alias("period")
    )


def build_mosaic(
    spark: SparkSession,
    tile_index: DataFrame,
    bbox: tuple[float, float, float, float],
    times: list[dt.datetime],
    store_path: str,
    n_bands: int = 4,
    tile_px: int = 32,
    reducer: str = "mean",
    window_days: int = 365,
    skip_existing: bool = False,
) -> dict:
    """Run the full §3.1 lifecycle into ``store_path``. Returns the
    store layout (shape/chunks/tile origins/time order) for readers.

    The store is (time, band, y, x): value bands only (QA consumed by
    the composite), chunks = one tile slab — tile-aligned writes are
    chunk-aligned by construction, so region writes never contend.
    """
    scene_periods = target_scene_periods(
        spark, tile_index, bbox, times, window_days=window_days
    )

    # deterministic global layout (driver-side metadata, tiny)
    tiles = sorted(
        (r.tile_id, r.minx, r.miny)
        for r in tile_index.join(
            scene_periods.select("tile_id").distinct(), "tile_id", "left_semi"
        )
        .select("tile_id", "minx", "miny")
        .collect()
    )
    xs = sorted({t[1] for t in tiles})
    ys = sorted({t[2] for t in tiles})
    origin = {
        tid: (ys.index(miny) * tile_px, xs.index(minx) * tile_px)
        for tid, minx, miny in tiles
    }
    t_order = [
        r.time
        for r in scene_periods.select("time").distinct().orderBy("time").collect()
    ]
    t_index = {t: i for i, t in enumerate(t_order)}

    shape = (len(t_order), n_bands - 1, len(ys) * tile_px, len(xs) * tile_px)
    chunks = (1, n_bands - 1, tile_px, tile_px)
    write_template(
        store_path,
        shape,
        chunks,
        attrs={
            "dims": ["time", "band", "y", "x"],
            "times": [str(t) for t in t_order],
            "bands": [f"b{i+1}" for i in range(n_bands - 1)],
        },
    )

    # Incremental skip (J4): drop targets whose chunk already exists in
    # the store — the reference's rerun-and-skip core (scenes.py:219-232)
    # applied at the mosaic layer. The listing is metadata-scale.
    if skip_existing:
        existing = [
            n.split(".") for n in os.listdir(store_path) if not n.startswith(".")
        ]
        if existing:
            done = spark.createDataFrame(
                [(int(t), int(y) * tile_px, int(x) * tile_px) for t, _, y, x in existing],
                "t int, oy int, ox int",
            )
            done_targets = (
                done.join(
                    F.broadcast(
                        spark.createDataFrame(
                            [
                                (tid, y0, x0, t_index[t])
                                for tid, (y0, x0) in origin.items()
                                for t in t_order
                            ],
                            "tile_id string, oy int, ox int, t int",
                        )
                    ),
                    ["t", "oy", "ox"],
                )
                .select("tile_id", F.lit(True).alias("_done"), "t")
            )
            time_lookup = spark.createDataFrame(
                [(t, i) for t, i in t_index.items()], "time timestamp, t int"
            )
            scene_periods = (
                scene_periods.join(F.broadcast(time_lookup), "time")
                .join(done_targets, ["tile_id", "t"], "left_anti")
                .drop("t")
            )

    # Stage 2 — materialize scenes (Arrow-batched; real reader drops in
    # here unchanged). One row per (tile, time, period) scene block.
    scene_schema = (
        "tile_id string, time timestamp, period long, payload array<float>"
    )

    def load_scenes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                synthetic_scene(t, int(p), n_bands, tile_px).ravel()
                for t, p in zip(pdf["tile_id"], pdf["period"])
            ]
            out = pdf[["tile_id", "time", "period"]].copy()
            out["payload"] = payloads
            yield out

    scenes = scene_periods.repartition(
        spark.sparkContext.defaultParallelism, "tile_id", "time"
    ).mapInPandas(load_scenes, scene_schema)

    # Stage 3 — composite per (tile, time): the flagship kernel.
    comp_schema = "tile_id string, time timestamp, payload array<float>"

    def composite(pdf: pd.DataFrame) -> pd.DataFrame:
        stack = np.stack(
            [
                np.asarray(p, dtype="f4").reshape(n_bands, tile_px, tile_px)
                for p in pdf["payload"]
            ]
        )
        qa = stack[:, n_bands - 1 : n_bands]
        vals = np.where(qa == QA_CLEAR, stack[:, : n_bands - 1], np.nan)
        with np.errstate(invalid="ignore"):
            out = (np.nanmean if reducer == "mean" else np.nanmedian)(vals, axis=0)
        return pd.DataFrame(
            {
                "tile_id": [pdf["tile_id"].iloc[0]],
                "time": [pdf["time"].iloc[0]],
                "payload": [out.astype("f4").ravel()],
            }
        )

    features = scenes.groupBy("tile_id", "time").applyInPandas(composite, comp_schema)

    # Stage 4 — global placement: tile origins + time index via a
    # broadcast lookup (metadata-scale).
    origin_df = spark.createDataFrame(
        [(tid, y0, x0) for tid, (y0, x0) in origin.items()],
        "tile_id string, y0 int, x0 int",
    )
    time_df = spark.createDataFrame(
        [(t, i) for t, i in t_index.items()], "time timestamp, t int"
    )
    regions = (
        features.join(F.broadcast(origin_df), "tile_id")
        .join(F.broadcast(time_df), "time")
        .select(
            "t",
            F.lit(0).alias("b0"),
            "y0",
            "x0",
            F.array(
                F.lit(n_bands - 1), F.lit(tile_px), F.lit(tile_px)
            ).alias("shape"),
            "payload",
        )
    )

    # Stage 5 — parallel disjoint region writes (S10).
    n_chunks = write_region_chunks(regions, store_path)
    return {
        "path": store_path,
        "shape": shape,
        "chunks": chunks,
        "origins": origin,
        "times": t_order,
        "n_chunks_written": n_chunks,
    }
