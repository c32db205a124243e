"""Custom Spark DataSource for the chunk store — the "optional
DataSource V2" from SURVEY §4/§7, implemented with PySpark 4's Python
DataSource API so the store is a first-class format:

    spark.dataSource.register(ChunkStoreDataSource)
    df = (spark.read.format("chunkstore")
          .option("path", store).load())           # parallel scan
    df.write.format("chunkstore").option("path", store).mode("append")

Scale properties mirrored from the reference's GTI metadata planning
(flytemosaic/mosaics.py:33-39):

- **planning is metadata-only** — partitions are derived from chunk
  file names (``t.b.y.x``), no chunk bytes are touched at plan time;
- **filter pushdown prunes files**: comparisons on the origin columns
  (t, b0, y0, x0) are consumed by ``pushFilters`` and applied to the
  file-name-derived origins, so pruned chunks are never opened — the
  same effect as parquet row-group min/max skipping;
- **one task reads a bounded batch of chunks** and yields Arrow
  batches, so executor memory is bounded regardless of store size.
"""

from __future__ import annotations

import math
import os
import re
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

SCHEMA = "t int, b0 int, y0 int, x0 int, shape array<int>, payload array<float>"
_ORIGIN_COLS = ("t", "b0", "y0", "x0")
_FILES_PER_TASK = 32

# Committed chunk files are exactly 't.b.y.x'; anything else (a
# writer's in-flight '<name>.tmp-<pid>', stray metadata) must never
# reach map(int, ...) — a stream batch that lists mid-write would
# crash otherwise, and tailing a live writer is the stream reader's
# stated purpose.
_CHUNK_NAME_RE = re.compile(r"^\d+\.\d+\.\d+\.\d+$")


def _read_meta(path: str) -> dict:
    import json

    with open(os.path.join(path, ".zarray")) as f:
        return json.load(f)


@dataclass
class _ChunkBatch(InputPartition):
    files: list[str]


class ChunkStoreReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.meta = _read_meta(self.path)
        self._pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume origin-column comparisons (they prune whole chunk
        files); return everything else for Spark to evaluate.

        Reset on every call: Spark re-plans a reused DataFrame through
        the same reader instance, and the previous query's pushed
        filters must not leak into this one."""
        self._pushed = []
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col in _ORIGIN_COLS and isinstance(
                f,
                (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In),
            ):
                self._pushed.append(f)
            elif col in _ORIGIN_COLS and isinstance(f, IsNotNull):
                self._pushed.append(f)  # origins are never null
            else:
                yield f  # not consumed

    def _origin_ok(self, origin: dict[str, int]) -> bool:
        for f in self._pushed:
            if isinstance(f, IsNotNull):
                continue  # origins are never null
            v = origin[f.attribute[0]]
            if isinstance(f, EqualTo) and not v == f.value:
                return False
            if isinstance(f, GreaterThan) and not v > f.value:
                return False
            if isinstance(f, GreaterThanOrEqual) and not v >= f.value:
                return False
            if isinstance(f, LessThan) and not v < f.value:
                return False
            if isinstance(f, LessThanOrEqual) and not v <= f.value:
                return False
            if isinstance(f, In) and v not in f.value:
                return False
        return True

    def partitions(self) -> Sequence[InputPartition]:
        ct, cb, cy, cx = self.meta["chunks"]
        keep = []
        for name in sorted(os.listdir(self.path)):
            if not _CHUNK_NAME_RE.match(name):
                continue
            ti, bi, yi, xi = map(int, name.split("."))
            origin = {"t": ti * ct, "b0": bi * cb, "y0": yi * cy, "x0": xi * cx}
            if self._origin_ok(origin):
                keep.append(os.path.join(self.path, name))
        if not keep:
            return [_ChunkBatch([])]
        return [
            _ChunkBatch(keep[i : i + _FILES_PER_TASK])
            for i in range(0, len(keep), _FILES_PER_TASK)
        ]

    def read(self, partition: _ChunkBatch):
        import pyarrow as pa

        rows = [
            _decode_chunk(
                os.path.dirname(fpath), os.path.basename(fpath), self.meta
            )
            for fpath in partition.files
        ]
        yield pa.record_batch(
            {
                "t": pa.array([r[0] for r in rows], pa.int32()),
                "b0": pa.array([r[1] for r in rows], pa.int32()),
                "y0": pa.array([r[2] for r in rows], pa.int32()),
                "x0": pa.array([r[3] for r in rows], pa.int32()),
                "shape": pa.array([r[4] for r in rows], pa.list_(pa.int32())),
                "payload": pa.array(
                    [r[5] for r in rows], pa.list_(pa.float32())
                ),
            }
        )


@dataclass
class _WroteChunks(WriterCommitMessage):
    n_chunks: int


class ChunkStoreWriter(DataSourceWriter):
    """Region-parallel writer: each task writes the disjoint,
    chunk-aligned regions of its rows (S10 semantics — atomic rename,
    idempotent). The template (.zarray) must exist."""

    def __init__(self, options):
        self.path = options["path"]
        self.meta = _read_meta(self.path)

    def write(self, rows) -> _WroteChunks:
        import numpy as np

        meta = self.meta
        ct, cb, cy, cx = meta["chunks"]
        comp = meta.get("compressor")
        fill = (
            math.nan
            if meta["fill_value"] in ("NaN", None)
            else float(meta["fill_value"])
        )
        n = 0
        for row in rows:
            nb, ny, nx = row.shape
            block = np.asarray(row.payload, dtype=meta["dtype"]).reshape(nb, ny, nx)
            t, b0, y0, x0 = int(row.t), int(row.b0), int(row.y0), int(row.x0)
            assert t % ct == 0 and b0 % cb == 0 and y0 % cy == 0 and x0 % cx == 0
            for byi in range(0, ny, cy):
                for bxi in range(0, nx, cx):
                    for bbi in range(0, nb, cb):
                        cidx = (t // ct, (b0 + bbi) // cb, (y0 + byi) // cy, (x0 + bxi) // cx)
                        chunk = np.full((cb, cy, cx), fill, dtype=meta["dtype"])
                        sub = block[bbi : bbi + cb, byi : byi + cy, bxi : bxi + cx]
                        chunk[: sub.shape[0], : sub.shape[1], : sub.shape[2]] = sub
                        from flytemosaic_spark.sources.codecs import (
                            compress_chunk,
                        )

                        payload = compress_chunk(
                            chunk.tobytes(order="C"), comp
                        )
                        fname = os.path.join(self.path, ".".join(map(str, cidx)))
                        tmp = f"{fname}.tmp-{os.getpid()}"
                        with open(tmp, "wb") as f:
                            f.write(payload)
                        os.replace(tmp, fname)
                        n += 1
        return _WroteChunks(n)

    def commit(self, messages):
        return None

    def abort(self, messages):
        # partial chunk files are overwritten by the retry (idempotent)
        return None


def _decode_chunk(path: str, fname: str, meta: dict) -> tuple:
    """(t, b0, y0, x0, shape, payload) for one ``t.b.y.x`` chunk file —
    shared by the batch partition reader and the stream reader."""
    import numpy as np

    from flytemosaic_spark.sources.codecs import decompress_chunk

    ct, cb, cy, cx = meta["chunks"]
    ti, bi, yi, xi = map(int, fname.split("."))
    with open(os.path.join(path, fname), "rb") as fh:
        raw = fh.read()
    raw = decompress_chunk(raw, meta.get("compressor"))
    arr = np.frombuffer(raw, dtype=meta["dtype"]).astype("f4")
    return (
        ti * ct,
        bi * cb,
        yi * cy,
        xi * cx,
        [cb, cy, cx],
        arr.tolist(),
    )


class ChunkStoreStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming over the chunk store: each batch is the
    set of chunk files not yet seen — the streaming twin of the S6/J4
    bulk-ingest listing anti-join (a region-parallel writer appends
    disjoint chunks; the stream tails them).

    The offset is the SET of seen file names (JSON dict), which makes
    replay (``readBetweenOffsets``) exact regardless of arrival order
    — chunk names carry grid indices, not timestamps, so no
    lexicographic high-water mark exists. The seen-set grows with the
    store; a production deployment compacts it exactly like Spark's
    own FileStreamSource seen-files log (bounded by maxFileAge). At
    the gate scale the offset is a few hundred names."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("chunkstore stream requires option 'path'")
        self.meta = _read_meta(self.path)

    def _chunk_files(self) -> list[str]:
        return sorted(
            n for n in os.listdir(self.path) if _CHUNK_NAME_RE.match(n)
        )

    def initialOffset(self) -> dict:
        return {"seen": {}}

    def read(self, start: dict):
        seen = dict(start.get("seen", {}))
        new = [n for n in self._chunk_files() if n not in seen]
        rows = [_decode_chunk(self.path, n, self.meta) for n in new]
        for n in new:
            seen[n] = 1
        return iter(rows), {"seen": seen}

    def readBetweenOffsets(self, start: dict, end: dict):
        prev = start.get("seen", {})
        names = [n for n in end.get("seen", {}) if n not in prev]
        return iter(_decode_chunk(self.path, n, self.meta) for n in names)


class ChunkStoreDataSource(DataSource):
    """``spark.read.format("chunkstore")`` / ``df.write.format(...)``
    / ``spark.readStream.format("chunkstore")``."""

    @classmethod
    def name(cls) -> str:
        return "chunkstore"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> ChunkStoreReader:
        return ChunkStoreReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ChunkStoreWriter:
        return ChunkStoreWriter(self.options)

    def simpleStreamReader(self, schema: StructType) -> ChunkStoreStreamReader:
        return ChunkStoreStreamReader(self.options)


def register(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ChunkStoreDataSource)
