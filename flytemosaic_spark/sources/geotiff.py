"""Minimal REAL GeoTIFF codec — pure stdlib (struct + zlib) + numpy.

The reference reads scene COGs and writes feature GeoTIFFs through
GDAL (reference flytemosaic/datasets/utils.py:123-126,
flytemosaic/datasets/glad.py:140-151). This container has no GDAL, so
this module implements the TIFF 6.0 baseline subset that covers the
reference's actual files — tiled or stripped, DEFLATE- or
LZW-compressed, baseline-JPEG (via the pure-numpy codec in
``sources/jpeg.py``, including the TIFF ``JPEGTables`` abbreviated
streams) or raw (LZW with the spec's early code-width change),
8/16/32-bit integer and 32/64-bit float samples, horizontal-
differencing predictor, chunky (planar 1) AND band-separate (planar
2) multi-band layouts, GeoTIFF ModelPixelScale +
ModelTiepoint georeferencing — so the raster seams (`pipeline.py`
stage 2, `operators/multimodal.py`) can decode REAL payloads
end-to-end in this sandbox. JPEG tiles may be 8-bit (baseline or
progressive) or 12-bit (bits=12 in the IFD, uint16 arrays — the GDAL
convention); PackBits (32773) rounds out the classic compressions,
and ZSTD (50000 — the modern GDAL COG default, ``-co
COMPRESS=ZSTD``) decodes through the pure-Python RFC 8878 decoder in
``sources/zstd.py`` (encode uses pyarrow's bundled libzstd when
present, else the module's own REAL encoder — LZ matches +
predefined-FSE sequence coding, frames libzstd itself accepts). Formats beyond the subset
(CCITT/JPEG2000/WebP compressions, arithmetic-coded JPEG, mixed
per-band sample types) raise NotImplementedError naming the feature,
same honesty contract as the other codec tiers.

Decode supports both byte orders, WINDOWED reads (only blocks
intersecting the window are ever decompressed — the cloud-optimized
access pattern), chained IFDs (COG overviews, ``ifd=k``), and TRUE
range reads (:func:`decode_geotiff_ranged`: an ``fetch(offset, size)``
seam — the HTTP-Range / S3 shape — transfers the header region plus
only the intersecting tiles' byte ranges, so a 256x256 window of a
multi-GB remote scene moves kilobytes); encode
emits little-endian with optional nearest-subsampled overview IFDs.
Everything is byte-deterministic — the encoder is a valid test
oracle for the decoder and vice versa.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# tag ids (TIFF 6.0 + GeoTIFF)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_TILE_W = 322
_T_TILE_L = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325
_T_SAMPLE_FORMAT = 339
_T_JPEG_TABLES = 347  # abbreviated DQT/DHT stream shared by all tiles
_T_PIXEL_SCALE = 33550
_T_TIEPOINT = 33922
_T_GDAL_NODATA = 42113  # ASCII float, written by every GDAL GeoTIFF

_TYPE_SIZES = {
    1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 11: 4, 12: 8,
    16: 8, 17: 8,  # BigTIFF LONG8 / SLONG8
}
_TYPE_FMT = {
    1: "B", 2: "B", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i",
    11: "f", 12: "d", 16: "Q", 17: "q",
}

# (bits, sample_format) -> numpy dtype char
_DTYPES = {
    (8, 1): "u1",
    (16, 1): "u2",
    (32, 1): "u4",
    (8, 2): "i1",
    (16, 2): "i2",
    (32, 2): "i4",
    (32, 3): "f4",
    (64, 3): "f8",
}
_FMT_OF_KIND = {"u": 1, "i": 2, "f": 3}


def _read_ifd(
    buf: bytes, bo: str, off: int, big: bool = False
) -> tuple[dict[int, list], int]:
    """Parse one IFD; returns (tags, next_ifd_offset) — 0 = end of the
    chain (a COG chains full resolution -> overviews). ``big`` =
    BigTIFF layout (8-byte counts/offsets, 20-byte entries)."""
    if big:
        (n,) = struct.unpack_from(bo + "Q", buf, off)
    else:
        (n,) = struct.unpack_from(bo + "H", buf, off)
    hdr, esz, inline, ofmt = (8, 20, 8, "Q") if big else (2, 12, 4, "I")
    tags: dict[int, list] = {}
    for i in range(int(n)):
        e = off + hdr + i * esz
        if big:
            tag, typ = struct.unpack_from(bo + "HH", buf, e)
            (cnt,) = struct.unpack_from(bo + "Q", buf, e + 4)
        else:
            tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, e)
        if typ not in _TYPE_SIZES:
            continue  # unknown value type: skip the tag, per spec
        size = _TYPE_SIZES[typ] * cnt
        vpos = e + (12 if big else 8)
        voff = (
            vpos
            if size <= inline
            else struct.unpack_from(bo + ofmt, buf, vpos)[0]
        )
        if typ == 5:  # RATIONAL: pairs of uint32
            vals = [
                a / b if b else float("nan")
                for a, b in struct.iter_unpack(
                    bo + "II", buf[voff : voff + size]
                )
            ]
        elif typ == 2:  # ASCII
            vals = [buf[voff : voff + cnt].rstrip(b"\0").decode("latin-1")]
        else:
            vals = list(
                struct.unpack_from(bo + str(cnt) + _TYPE_FMT[typ], buf, voff)
            )
        tags[tag] = vals
    (nxt,) = struct.unpack_from(bo + ofmt, buf, off + hdr + int(n) * esz)
    return tags, nxt


def _packbits_decode(data: bytes) -> bytes:
    """TIFF PackBits (compression 32773): byte-oriented RLE."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:  # n+1 literal bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: noop, per spec
    return bytes(out)


def _packbits_encode(row: bytes) -> bytes:
    """PackBits one row (the spec compresses rows independently)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i
        while j < n - 1 and row[j] == row[j + 1] and j - i < 127:
            j += 1
        if j > i:  # run of 2..128
            out.append(257 - (j - i + 1))
            out.append(row[i])
            i = j + 1
            continue
        j = i
        while j < n and j - i < 128:
            if j < n - 2 and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)


def _undiff(block: np.ndarray) -> np.ndarray:
    """Invert predictor 2 (horizontal differencing) along the row axis
    with the spec's modulo-2^bits wraparound — accumulate in the
    same-width unsigned view so overflow wraps exactly."""
    if block.dtype.kind == "f":
        raise NotImplementedError("predictor 2 on float samples")
    if block.dtype != block.dtype.newbyteorder("="):
        # big-endian (MM) multi-byte samples: the unsigned view below
        # reinterprets raw bytes, so accumulate AFTER swapping to native
        # order or the sums are computed on byte-swapped values
        block = block.astype(block.dtype.newbyteorder("="))
    u = block.view(f"u{block.dtype.itemsize}")
    np.add.accumulate(u, axis=1, out=u)
    return block


def decode_geotiff(
    payload: bytes,
    window: tuple[int, int, int, int] | None = None,
    ifd: int = 0,
    fetch=None,
) -> tuple[np.ndarray, dict]:
    """Decode a baseline(-subset) TIFF/GeoTIFF into
    ``(array[H, W, bands], meta)``. ``meta`` carries ``pixel_scale``
    (3 doubles) and ``tiepoint`` (6 doubles) when the GeoTIFF tags are
    present, plus ``transform`` = (x0, dx, y0, dy) derived from them
    (north-up affine, the reference's COG case), and ``n_ifds`` (the
    IFD-chain length — a COG's overview count + 1).

    ``window`` = (row0, col0, height, width) decodes ONLY the tiles /
    strips intersecting that region — blocks outside it are never
    decompressed, the cloud-optimized access pattern (the reference
    reads per-tile windows from scene COGs, utils.py:123-126; over
    HTTP the skipped blocks are skipped range requests). ``ifd``
    selects a chained IFD (0 = full resolution, 1.. = overviews).

    ``fetch`` (optional, ``fetch(offset, size) -> bytes``) is the
    RANGE-READ seam: block data is pulled through it instead of
    sliced from ``payload``, so ``payload`` only needs to cover the
    header/IFD region — :func:`decode_geotiff_ranged` wires this up
    so a windowed read of a multi-GB remote COG transfers the header
    plus ONLY the intersecting tiles' byte ranges."""
    big = False
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    elif payload[:4] in (b"II+\x00", b"MM\x00+"):
        # BigTIFF: magic 43, then offset-size (8) + 0, then Q offset
        bo = "<" if payload[:2] == b"II" else ">"
        osz, zero = struct.unpack_from(bo + "HH", payload, 4)
        if osz != 8 or zero != 0:
            raise NotImplementedError(f"BigTIFF offset size {osz}")
        big = True
    else:
        raise ValueError("not a TIFF payload")
    if big:
        (ifd_off,) = struct.unpack_from(bo + "Q", payload, 8)
    else:
        (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    chain = []
    off = ifd_off
    while off:
        tags, off = _read_ifd(payload, bo, off, big=big)
        chain.append(tags)
    if not 0 <= ifd < len(chain):
        raise ValueError(f"ifd {ifd} out of range (file has {len(chain)})")
    t = chain[ifd]

    w, h = int(t[_T_WIDTH][0]), int(t[_T_LENGTH][0])
    spp = int(t.get(_T_SPP, [1])[0])
    bits = t.get(_T_BITS, [8])
    fmt = t.get(_T_SAMPLE_FORMAT, [1] * spp)
    if len(set(bits)) != 1 or len(set(fmt)) != 1:
        raise NotImplementedError("mixed per-band sample types")
    key = (int(bits[0]), int(fmt[0]))
    comp = int(t.get(_T_COMPRESSION, [1])[0])
    if key in _DTYPES:
        dt = np.dtype(bo + _DTYPES[key])
    elif comp == 7 and key == (12, 1):
        # 12-bit samples exist ONLY inside JPEG codestreams here (the
        # GDAL convention); they decode to uint16
        dt = np.dtype(bo + "u2")
    else:
        raise NotImplementedError(f"sample type bits={key[0]} format={key[1]}")
    # none / LZW / deflate (both codes) / baseline JPEG / PackBits / ZSTD
    if comp not in (1, 5, 7, 8, 32946, 32773, 50000):
        raise NotImplementedError(
            f"TIFF compression {comp} "
            "(none/LZW/deflate/JPEG/PackBits/ZSTD supported)"
        )
    if comp == 7 and key not in ((8, 1), (12, 1)):
        raise NotImplementedError(
            "JPEG-in-TIFF with samples other than 8- or 12-bit unsigned"
        )
    jpeg_tables = (
        bytes(t[_T_JPEG_TABLES]) if _T_JPEG_TABLES in t else None
    )
    planar = int(t.get(_T_PLANAR, [1])[0])
    if planar not in (1, 2):
        raise NotImplementedError(f"planar configuration {planar}")
    if planar == 2 and comp == 7:
        raise NotImplementedError("planar configuration 2 with JPEG")
    # planar 2: each block carries ONE band; blocks are ordered plane
    # by plane (all of band 0's tiles/strips, then band 1's, ...)
    nb = 1 if planar == 2 and spp > 1 else spp
    pred = int(t.get(_T_PREDICTOR, [1])[0])
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {pred}")

    wy, wx, oh, ow = (0, 0, h, w) if window is None else window
    if not (0 <= wy and 0 <= wx and oh > 0 and ow > 0
            and wy + oh <= h and wx + ow <= w):
        raise ValueError(f"window {window} out of bounds for {h}x{w}")

    if fetch is None:
        def _get(o, c):
            return payload[int(o) : int(o) + int(c)]
    else:
        def _get(o, c):
            return fetch(int(o), int(c))

    def unpack(o, c):
        raw = _get(o, c)
        if comp == 5:
            return _lzw_decode(raw)
        if comp in (8, 32946):
            return zlib.decompress(raw)
        if comp == 32773:
            return _packbits_decode(raw)
        if comp == 50000:
            from flytemosaic_spark.sources.zstd import decode_zstd

            return decode_zstd(raw)
        return raw

    def block(o, c, bh, bw):
        """One decoded block as a (bh, bw, spp) array (predictor
        inverted; JPEG blocks cropped/padded to the block grid)."""
        if comp == 7:
            from flytemosaic_spark.sources.jpeg import decode_jpeg

            a = decode_jpeg(_get(o, c), tables=jpeg_tables)
            if a.shape[2] != spp:
                raise ValueError(
                    f"JPEG block has {a.shape[2]} components, IFD says {spp}"
                )
            if a.shape[:2] == (bh, bw):
                return a
            padded = np.zeros((bh, bw, spp), dtype=a.dtype)
            eh, ew = min(bh, a.shape[0]), min(bw, a.shape[1])
            padded[:eh, :ew] = a[:eh, :ew]
            return padded
        arr = np.frombuffer(unpack(o, c), dtype=dt).reshape(bh, bw, nb)
        if pred == 2:
            arr = _undiff(arr.copy().reshape(bh, bw * nb)).reshape(
                bh, bw, nb
            )
        return arr

    out = np.zeros((oh, ow, spp), dtype=dt.newbyteorder("="))
    if _T_TILE_OFFSETS in t:
        tw, tl = int(t[_T_TILE_W][0]), int(t[_T_TILE_L][0])
        across = (w + tw - 1) // tw
        per_plane = across * ((h + tl - 1) // tl)
        offsets, counts = t[_T_TILE_OFFSETS], t[_T_TILE_COUNTS]
        for i in range(len(offsets)):
            plane, pos = divmod(i, per_plane) if nb != spp else (0, i)
            ty, tx = (pos // across) * tl, (pos % across) * tw
            # blocks outside the window are never read or decompressed
            if (ty >= wy + oh or ty + tl <= wy
                    or tx >= wx + ow or tx + tw <= wx):
                continue
            tile = block(offsets[i], counts[i], tl, tw)
            sy, sx = max(ty, wy), max(tx, wx)
            ey = min(ty + tl, wy + oh, h)
            ex = min(tx + tw, wx + ow, w)
            dst = out[sy - wy : ey - wy, sx - wx : ex - wx]
            src = tile[sy - ty : ey - ty, sx - tx : ex - tx]
            if nb != spp:
                dst[:, :, plane : plane + 1] = src
            else:
                dst[:] = src
    else:
        rps = int(t.get(_T_ROWS_PER_STRIP, [h])[0])
        per_plane = (h + rps - 1) // rps
        offsets, counts = t[_T_STRIP_OFFSETS], t[_T_STRIP_COUNTS]
        for i in range(len(offsets)):
            plane, pos = divmod(i, per_plane) if nb != spp else (0, i)
            y = pos * rps
            rows = min(rps, h - y)
            if y >= wy + oh or y + rows <= wy:
                continue
            strip = block(offsets[i], counts[i], rows, w)
            sy = max(y, wy)
            ey = min(y + rows, wy + oh)
            dst = out[sy - wy : ey - wy]
            src = strip[sy - y : ey - y, wx : wx + ow]
            if nb != spp:
                dst[:, :, plane : plane + 1] = src
            else:
                dst[:] = src

    meta: dict = {"n_ifds": len(chain)}
    if _T_GDAL_NODATA in t:
        try:
            meta["nodata"] = float(t[_T_GDAL_NODATA][0])
        except ValueError:
            pass  # malformed ascii: omit rather than crash
    if _T_PIXEL_SCALE in t:
        meta["pixel_scale"] = tuple(t[_T_PIXEL_SCALE])
    if _T_TIEPOINT in t:
        meta["tiepoint"] = tuple(t[_T_TIEPOINT])
    if "pixel_scale" in meta and "tiepoint" in meta:
        sx, sy = meta["pixel_scale"][0], meta["pixel_scale"][1]
        i, j, _, x, y_, _ = meta["tiepoint"][:6]
        # north-up affine: x = x0 + col*dx, y = y0 - row*dy
        meta["transform"] = (x - i * sx, sx, y_ + j * sy, -sy)
    return out, meta


def encode_geotiff(
    arr: np.ndarray,
    tile: int | None = 256,
    compress: bool | str = True,
    predictor: bool = False,
    pixel_scale: tuple[float, float, float] | None = None,
    tiepoint: tuple[float, ...] | None = None,
    overviews: list[int] | None = None,
    big: bool = False,
    nodata: float | None = None,
    jpeg_quality: int = 90,
    planar: int = 1,
) -> bytes:
    """Encode ``arr`` ((H, W) or (H, W, bands), supported dtype) as a
    little-endian tiled (or single-strip when ``tile=None``) TIFF.
    ``tile`` is rounded up to the spec's multiple of 16; edge tiles
    are zero-padded exactly like GDAL writes them. ``predictor``
    enables horizontal differencing (integer dtypes only — the COG
    default for integer imagery). GeoTIFF georeferencing goes in via
    ``pixel_scale`` (sx, sy, sz) + ``tiepoint`` (i, j, k, x, y, z).
    ``overviews`` (e.g. ``[2, 4, 8]``) appends nearest-subsampled
    reduced-resolution IFDs to the chain — the structure that makes a
    TIFF a COG (decode them with ``decode_geotiff(..., ifd=k)``).
    ``big=True`` emits BigTIFF (8-byte offsets — required past 4 GB,
    which a 100 TB deployment's scene COGs do hit; classic TIFF's
    uint32 offsets silently wrap there)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    kind, bits = arr.dtype.kind, arr.dtype.itemsize * 8
    if kind not in _FMT_OF_KIND or (bits, _FMT_OF_KIND[kind]) not in _DTYPES:
        raise NotImplementedError(f"dtype {arr.dtype} not encodable")
    if predictor and kind == "f":
        raise NotImplementedError("predictor 2 on float samples")
    comp_code = {
        True: 8, "deflate": 8, "lzw": 5, "jpeg": 7, "packbits": 32773,
        "zstd": 50000, False: 1, None: 1,
    }[compress]
    if comp_code == 7:
        if arr.shape[2] not in (1, 3) or arr.dtype not in (
            np.uint8,
            np.uint16,
        ):
            raise NotImplementedError(
                "JPEG compression: uint8 (8-bit) or uint16 (12-bit) "
                "with 1 or 3 bands only"
            )
        if arr.dtype == np.uint16:
            if int(arr.max()) > 4095:
                raise ValueError("12-bit JPEG samples must be < 4096")
            bits = 12  # GDAL's 12-bit-in-JPEG TIFF convention
        if predictor:
            raise NotImplementedError("predictor with JPEG compression")
    if planar not in (1, 2):
        raise NotImplementedError(f"planar configuration {planar}")
    if planar == 2 and comp_code == 7:
        raise NotImplementedError("planar configuration 2 with JPEG")
    if comp_code == 5:
        pack = _lzw_encode
    elif comp_code == 8:
        pack = zlib.compress
    elif comp_code == 50000:
        from flytemosaic_spark.sources.zstd import encode_zstd

        pack = encode_zstd
    else:
        pack = lambda b: b  # noqa: E731

    def pack_block(flat: np.ndarray) -> bytes:
        if comp_code == 32773:  # PackBits: rows compress independently
            return b"".join(
                _packbits_encode(flat[r].tobytes())
                for r in range(flat.shape[0])
            )
        return pack(flat.tobytes())
    base = np.ascontiguousarray(arr, dtype=arr.dtype.newbyteorder("<"))
    # (array, subsample factor) per IFD — the factor scales the geo
    # tags so decode_geotiff(..., ifd=k) returns a transform with the
    # overview's true pixel size, not the full-resolution one
    levels = [(base, 1)] + [
        (np.ascontiguousarray(base[::f, ::f]), f) for f in (overviews or [])
    ]

    def diff(block2d: np.ndarray) -> np.ndarray:
        u = block2d.view(f"u{block2d.dtype.itemsize}").copy()
        u[:, 1:] = u[:, 1:] - u[:, :-1]
        return u.view(block2d.dtype)

    def build_level(a: np.ndarray, factor: int = 1):
        """-> (entries, chunks) for one IFD; offsets patched later.
        ``factor`` = subsample factor vs the base level (1 for the
        full-resolution IFD) — geo tags are rescaled by it."""
        h, w, spp = a.shape
        chunks: list[bytes] = []
        # planar 2: one band per block, plane-major block order
        planes = (
            [a[:, :, p : p + 1] for p in range(spp)]
            if planar == 2 and spp > 1
            else [a]
        )
        if tile is not None:
            tw = tl = max(16, ((tile + 15) // 16) * 16)
            for pa in planes:
                nb = pa.shape[2]
                for ty in range(0, h, tl):
                    for tx in range(0, w, tw):
                        block = np.zeros((tl, tw, nb), dtype=a.dtype)
                        ey, ex = min(tl, h - ty), min(tw, w - tx)
                        block[:ey, :ex] = pa[ty : ty + ey, tx : tx + ex]
                        if comp_code == 7:
                            from flytemosaic_spark.sources.jpeg import (
                                encode_jpeg,
                            )

                            chunks.append(
                                encode_jpeg(block, quality=jpeg_quality)
                            )
                            continue
                        flat = block.reshape(tl, tw * nb)
                        if predictor:
                            flat = diff(flat)
                        chunks.append(pack_block(flat))
        elif comp_code == 7:
            from flytemosaic_spark.sources.jpeg import encode_jpeg

            chunks.append(encode_jpeg(a, quality=jpeg_quality))
        else:
            for pa in planes:
                flat = pa.reshape(h, w * pa.shape[2])
                if predictor:
                    flat = diff(flat)
                chunks.append(pack_block(flat))
        entries: list[tuple[int, int, list]] = [
            (_T_WIDTH, 4, [w]),
            (_T_LENGTH, 4, [h]),
            (_T_BITS, 3, [bits] * spp),
            (_T_COMPRESSION, 3, [comp_code]),
            (_T_SPP, 3, [spp]),
            (_T_PLANAR, 3, [planar if spp > 1 else 1]),
            (_T_SAMPLE_FORMAT, 3, [_FMT_OF_KIND[kind]] * spp),
        ]
        if comp_code == 7:
            # YCbCr(4:4:4) for color, min-is-black for gray — what the
            # JFIF streams the tiles hold actually encode
            entries.append((_T_PHOTOMETRIC, 3, [6 if spp == 3 else 1]))
            if spp == 3:
                entries.append((530, 3, [1, 1]))  # YCbCrSubSampling
        if predictor:
            entries.append((_T_PREDICTOR, 3, [2]))
        if tile is not None:
            entries += [
                (_T_TILE_W, 3, [tw]),
                (_T_TILE_L, 3, [tl]),
                (_T_TILE_OFFSETS, 4, [0] * len(chunks)),  # patched later
                (_T_TILE_COUNTS, 4, [len(c) for c in chunks]),
            ]
        else:
            entries += [
                (_T_STRIP_OFFSETS, 4, [0] * len(chunks)),  # patched later
                (_T_ROWS_PER_STRIP, 4, [h]),
                (_T_STRIP_COUNTS, 4, [len(c) for c in chunks]),
            ]
        if nodata is not None:
            # GDAL convention: ASCII float, NUL-terminated
            entries.append(
                (
                    _T_GDAL_NODATA,
                    2,
                    list(f"{nodata:g}".encode("ascii") + b"\0"),
                )
            )
        if pixel_scale is not None:
            # overview pixels are ``factor``× larger in model units
            ps = list(pixel_scale)
            ps[0] *= factor
            ps[1] *= factor
            entries.append((_T_PIXEL_SCALE, 12, ps))
        if tiepoint is not None:
            # raster coords of the tiepoint shrink by the factor so the
            # (i*sx)-derived origin is level-invariant
            tp = list(tiepoint)
            tp[0] /= factor
            tp[1] /= factor
            entries.append((_T_TIEPOINT, 12, tp))
        entries.sort(key=lambda e: e[0])
        return entries, chunks

    built = [build_level(a, f) for a, f in levels]
    if big:
        # BigTIFF: offsets/counts carried as LONG8 so values past 4 GB
        # are representable
        built = [
            (
                [
                    (tag, 16, vals)
                    if tag
                    in (
                        _T_TILE_OFFSETS,
                        _T_STRIP_OFFSETS,
                        _T_TILE_COUNTS,
                        _T_STRIP_COUNTS,
                    )
                    else (tag, typ, vals)
                    for tag, typ, vals in entries
                ],
                chunks,
            )
            for entries, chunks in built
        ]
    hdr_len = 16 if big else 8
    ifd_hdr, entry_sz, inline, ofmt = (
        (8, 20, 8, "Q") if big else (2, 12, 4, "I")
    )
    # layout: header | [IFD_i | ext_i]* | all pixel chunks
    pos = hdr_len
    ifd_offs = []
    for entries, _ in built:
        ifd_offs.append(pos)
        ext_size = sum(
            _TYPE_SIZES[typ] * len(vals)
            for _, typ, vals in entries
            if _TYPE_SIZES[typ] * len(vals) > inline
        )
        pos += (ifd_hdr + len(entries) * entry_sz + len(struct.pack("<" + ofmt, 0))) + ext_size
    data_pos = pos
    chunk_offsets: list[list[int]] = []
    for _, chunks in built:
        offs = []
        for c in chunks:
            offs.append(data_pos)
            data_pos += len(c)
        chunk_offsets.append(offs)

    buf = bytearray()
    if big:
        buf += b"II+\x00" + struct.pack("<HHQ", 8, 0, ifd_offs[0])
    else:
        buf += b"II*\x00" + struct.pack("<I", ifd_offs[0])
    for li, (entries, chunks) in enumerate(built):
        ext_off = ifd_offs[li] + ifd_hdr + len(entries) * entry_sz + (
            8 if big else 4
        )
        ext = bytearray()
        body = bytearray()
        body += struct.pack("<Q" if big else "<H", len(entries))
        for tag, typ, vals in entries:
            if tag in (_T_TILE_OFFSETS, _T_STRIP_OFFSETS):
                vals = chunk_offsets[li]
            size = _TYPE_SIZES[typ] * len(vals)
            if big:
                body += struct.pack("<HHQ", tag, typ, len(vals))
            else:
                body += struct.pack("<HHI", tag, typ, len(vals))
            if size <= inline:
                body += struct.pack(
                    "<" + str(len(vals)) + _TYPE_FMT[typ], *vals
                ).ljust(inline, b"\0")
            else:
                body += struct.pack("<" + ofmt, ext_off + len(ext))
                ext += struct.pack(
                    "<" + str(len(vals)) + _TYPE_FMT[typ], *vals
                )
        nxt = ifd_offs[li + 1] if li + 1 < len(built) else 0
        body += struct.pack("<" + ofmt, nxt)
        buf += body + ext
    for _, chunks in built:
        for c in chunks:
            buf += c
    return bytes(buf)


# ---------------------------------------------------------------------------
# TIFF LZW (compression code 5) — MSB-first variable-width codes with
# the spec's EARLY code-width change (libtiff semantics); the other
# compression real-world COGs commonly use besides DEFLATE.
# ---------------------------------------------------------------------------

_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    table: list[bytes] = []
    width = 9
    next_code = 258
    prev: bytes | None = None

    def reset():
        nonlocal table, width, next_code, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        next_code = 258
        prev = None

    reset()
    buf = nbits = 0
    for b in data:
        buf = (buf << 8) | b
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == _LZW_CLEAR:
                reset()
                continue
            if code == _LZW_EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
                next_code += 1
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            # TIFF early change, decoder side: the decoder's table is
            # ONE entry behind the encoder's (it completes the previous
            # entry on each code), so it widens at 510/1022/2046 —
            # (1<<width)-2 — to change width at the same point in the
            # code stream where the encoder changed at (1<<width)-1
            if next_code == (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    buf = nbits = 0

    def emit(code: int, width: int):
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {}
    width = 9
    next_code = 258

    def reset():
        nonlocal table, width, next_code
        table = {bytes([i]): i for i in range(256)}
        width = 9
        next_code = 258

    reset()
    emit(_LZW_CLEAR, width)
    w = b""
    for byte in data:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # early change: the writer widens as soon as next_code can no
        # longer be represented MINUS the spec's off-by-one
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        w = c
        if next_code >= 4094:  # table nearly full: flush and restart
            emit(table[w], width)
            emit(_LZW_CLEAR, width)
            reset()
            w = b""
    if w:
        emit(table[w], width)
        # the decoder completes one table entry on EVERY received code,
        # including this final flush — count it (and widen if that
        # crosses the early-change boundary) or EOI is written one bit
        # narrower than the decoder reads it (libtiff LZWPostEncode
        # does the same free_ent++ before CODE_EOI)
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(_LZW_EOI, width)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_geotiff_ranged(
    fetch,
    window: tuple[int, int, int, int] | None = None,
    ifd: int = 0,
    initial_prefix: int = 65536,
    max_prefix: int = 64 * 1024 * 1024,
) -> tuple[np.ndarray, dict]:
    """Windowed decode over a RANGE READER — the true cloud-optimized
    access pattern: ``fetch(offset, size) -> bytes`` (an HTTP Range /
    S3 GetObject(Range=...) adapter, or :func:`file_range_reader` for
    local files). The header/IFD region is fetched with doubling
    retries starting at ``initial_prefix`` (COGs keep IFDs up front;
    the loop also handles header-last writers up to ``max_prefix``),
    then block data is pulled per intersecting tile through ``fetch``
    — a 256x256 window of a multi-GB scene transfers kilobytes.

    ``fetch`` may return FEWER bytes than asked at end-of-file (the
    HTTP Range semantics).
    """
    buf = fetch(0, initial_prefix)
    while True:
        try:
            return decode_geotiff(
                bytes(buf), window=window, ifd=ifd, fetch=fetch
            )
        except (struct.error, IndexError, ValueError) as exc:
            # a short header region parses as garbage — grow and retry;
            # re-raise once growth stops (EOF) or the cap is reached
            if len(buf) >= max_prefix:
                raise
            more = fetch(len(buf), len(buf))
            if not more:
                raise exc
            buf = bytes(buf) + bytes(more)


def file_range_reader(path: str):
    """A ``fetch(offset, size)`` adapter over a local file — the test
    stand-in for an object-store range reader (same contract: short
    reads at EOF, never errors past it)."""

    def fetch(offset: int, size: int) -> bytes:
        with open(path, "rb") as fh:
            fh.seek(offset)
            return fh.read(size)

    return fetch
