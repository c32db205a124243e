"""Multimodal columns: image/audio/video as opaque binary payloads
with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side plumbing is fully real — schema, partitioning, UDF
signatures, Arrow batch shapes — and the codec layer has REAL tiers
next to the deterministic fake: PNG decodes via PIL when importable,
else a built-in stdlib-zlib decoder (all five scanline unfilters,
8/16-bit gray/GA/RGB/RGBA, indexed-color PLTE at depths 1/2/4/8 with
tRNS alpha, Adam7 interlace); JPEG — baseline, progressive, and
12-bit — the same way (PIL, else the
pure-numpy T.81 codec in ``sources/jpeg.py``); GIF87a/89a incl.
animation via ``sources/gif.py``; TIFF/GeoTIFF/BigTIFF
via ``sources/geotiff.py``; WAV via the stdlib ``wave`` module
(16-bit PCM, multichannel downmix); FLAC via the pure-numpy codec in
``sources/flac.py`` (fixed + LPC prediction, Rice partitions, all
four channel assignments, CRC/MD5-verified); MP4 container metadata
AND sample-table demux via the real ISO-BMFF parser in
``sources/mp4.py``, with MJPEG tracks frame-decoded through
``sources/jpeg.py`` (real video frame sampling); BMP (8/24/32-bit);
MP3 frame-header metadata via ``sources/mp3.py``; EXIF APP1 parsing +
the 8 orientation transforms via ``sources/exif.py``; SubRip caption
tracks; WARC crawl archives (``sources/warc.py``) and WebDataset tar
shards (``sources/webdataset.py``) as corpus containers; image
near-dup via dHash + Hamming-band LSH; audio resampling and log-mel
features. Only inter-frame
video (H.264/AV1) and MP3 bitstreams raise NotImplementedError naming
the ffmpeg swap point — that part of the seam is honest, not hidden
(``sources/mp3.py`` documents why a from-memory MP3 decoder would be
dishonest).

Fake payload format (deterministic from media_id):
    b"FAKE" | width:int32 | height:int32 | channels:uint8 | pixels...
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.schemas import MEDIA

_MAGIC = b"FAKE"


def _fake_payload(media_id: int, width: int, height: int, channels: int) -> bytes:
    rng = np.random.default_rng(media_id)
    pixels = rng.integers(0, 256, size=width * height * channels, dtype=np.uint8)
    return _MAGIC + struct.pack("<iiB", width, height, channels) + pixels.tobytes()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type -> channel count (8-bit, non-interlaced support)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, pos: int, h: int, stride: int, bpp: int):
    """Unfilter ``h`` scanlines of ``stride`` bytes starting at byte
    ``pos`` (all five filters; the left neighbor is ``bpp`` bytes
    back, per spec). Returns (rows uint8 (h, stride), next pos)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(h):
        ft = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    return out, pos


# Adam7 passes: (row start, row step, col start, col step)
_ADAM7 = (
    (0, 8, 0, 8), (0, 8, 4, 8), (4, 8, 0, 4), (0, 4, 2, 4),
    (2, 4, 0, 2), (0, 2, 1, 2), (1, 2, 0, 1),
)


def _decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decoder — pure stdlib zlib + numpy, no image library
    needed: chunk walk, concatenated-IDAT inflate, all five scanline
    unfilters (None/Sub/Up/Average/Paeth), Adam7 INTERLACED streams
    (seven independently-filtered sub-images scattered onto the
    grid), and indexed-color (PLTE) images at depths 1/2/4/8 with
    optional tRNS alpha (palette PNGs dominate web-scraped icons and
    charts). Truecolor/gray at 8- and 16-bit as before — 16-bit gray
    is the depth-map/elevation-tile case; returns uint8 or uint16.
    Everything else raises with the exact unsupported feature
    named."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    plte = trns = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data
            )
            ok = (
                color in _PNG_CHANNELS and depth in (8, 16)
            ) or (color == 3 and depth in (1, 2, 4, 8))
            if not ok or ilace not in (0, 1):
                raise NotImplementedError(
                    f"PNG feature unsupported by the built-in decoder: "
                    f"depth={depth} color={color} interlace={ilace} "
                    "(install PIL for full coverage)"
                )
            meta = (w, h, color, depth, ilace)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, color, depth, ilace = meta
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    ch = 1 if color == 3 else _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    bits_pp = ch * depth
    bpp = max(1, bits_pp // 8)  # filter offset, bytes

    grid = np.zeros(
        (h, w, ch), dtype=np.uint16 if depth == 16 else np.uint8
    )
    passes = _ADAM7 if ilace else ((0, 1, 0, 1),)
    pos = 0
    for r0, rs, c0, cs in passes:
        ph = (h - r0 + rs - 1) // rs
        pw = (w - c0 + cs - 1) // cs
        if ph <= 0 or pw <= 0:
            continue
        stride = (pw * bits_pp + 7) // 8
        rows, pos = _png_unfilter(raw, pos, ph, stride, bpp)
        if depth == 16:
            sub = (
                rows.reshape(ph, pw * ch, 2)
                .view(">u2")[:, :, 0]
                .astype(np.uint16)
                .reshape(ph, pw, ch)
            )
        elif depth == 8:
            sub = rows[:, : pw * ch].reshape(ph, pw, ch)
        else:  # sub-byte palette indices, MSB-first within each byte
            bits = np.unpackbits(rows, axis=1)
            vals = bits.reshape(ph, -1, depth)
            weights = 1 << np.arange(depth - 1, -1, -1)
            sub = (vals * weights).sum(axis=2).astype(np.uint8)
            sub = sub[:, :pw].reshape(ph, pw, 1)
        grid[r0::rs, c0::cs] = sub
    if pos != len(raw):
        raise ValueError("PNG scanline payload has wrong length")

    if color == 3:
        idx = grid[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]
        if trns is None:
            return rgb
        alpha = np.full(len(plte), 255, np.uint8)
        alpha[: len(trns)] = trns
        return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
    return grid


def _encode_png(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal spec-valid PNG encoder (filter 0 rows) for round-trip
    tests and for producing portable sink payloads without PIL —
    uint8 or uint16 input (16-bit emits depth-16 network-order);
    ``interlace`` writes the Adam7 pass structure (each pass its own
    filtered sub-image)."""
    import zlib

    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    depth = 16 if arr.dtype == np.uint16 else 8

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    if depth == 16:
        rows = arr.astype(">u2")
    else:
        rows = arr.astype(np.uint8)
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0
    )
    if interlace:
        parts = []
        for r0, rs, c0, cs in _ADAM7:
            sub = rows[r0::rs, c0::cs]
            if sub.shape[0] and sub.shape[1]:
                parts += [
                    b"\x00" + sub[y].tobytes() for y in range(sub.shape[0])
                ]
        body = b"".join(parts)
    else:
        body = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


def _decode_bmp(payload: bytes) -> np.ndarray:
    """REAL BMP decoder (BITMAPINFOHEADER subset): uncompressed 8-bit
    palette / 24-bit BGR / 32-bit BGRA, bottom-up or top-down rows,
    4-byte row padding. The bitmap case web scrapes still produce;
    anything else (RLE, bitfields, OS/2 headers) raises named."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (8, 24, 32):
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} "
            "(uncompressed 8/24/32-bit supported)"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * (bpp // 8) + 3) & ~3
    rows = np.frombuffer(
        payload, np.uint8, stride * h, data_off
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", payload, 46)
        n_colors = n_colors or 256
        pal = np.frombuffer(
            payload, np.uint8, 4 * n_colors, 14 + hdr_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRx -> RGB
        return pal[rows[:, :w]]
    px = rows[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    if bpp == 24:
        return px[:, :, ::-1].copy()  # BGR -> RGB
    bgra = px
    out = np.empty((h, w, 4), np.uint8)
    out[:, :, 0] = bgra[:, :, 2]
    out[:, :, 1] = bgra[:, :, 1]
    out[:, :, 2] = bgra[:, :, 0]
    out[:, :, 3] = bgra[:, :, 3]
    return out


def _encode_bmp(arr: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP writer (the decoder's oracle)."""
    h, w, ch = arr.shape
    if ch != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp wants uint8 (H, W, 3)")
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = arr[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\0" * (stride - len(row))
    hdr = b"BM" + struct.pack(
        "<IHHI", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return hdr + bytes(body)


def _decode_payload(payload: bytes) -> np.ndarray:
    """THE CODEC SEAM — now three tiers:

    1. deterministic FAKE container (synthetic tests);
    2. REAL PNG: PIL when importable (full format coverage), else the
       built-in stdlib-zlib decoder (:func:`_decode_png` — 8-bit
       gray/GA/RGB/RGBA, all five unfilters), so PNG round-trips work
       even in this no-image-library sandbox; REAL JPEG (baseline AND
       progressive) the same way (PIL, else ``sources/jpeg.py``); REAL TIFF/GeoTIFF/
       BigTIFF via ``sources/geotiff.py``;
    3. anything else (MP4/...) raises NotImplementedError naming the
       swap point (ffmpeg).
    """
    if payload.startswith(_MAGIC):
        width, height, channels = struct.unpack_from("<iiB", payload, 4)
        pixels = np.frombuffer(payload, dtype=np.uint8, offset=4 + 9)
        return pixels.reshape(height, width, channels)
    if payload.startswith(_PNG_MAGIC):
        try:
            import io

            from PIL import Image  # noqa: F401 — optional full decoder
        except ImportError:
            return _decode_png(payload)
        a = np.asarray(Image.open(io.BytesIO(payload)))
        return a.reshape(a.shape[0], a.shape[1], -1)
    if payload[:4] in (b"II*\x00", b"MM\x00*", b"II+\x00", b"MM\x00+"):
        from flytemosaic_spark.sources.geotiff import decode_geotiff

        return decode_geotiff(payload)[0]
    if payload[:3] == b"\xff\xd8\xff":
        try:
            import io

            from PIL import Image  # optional full decoder
        except ImportError:
            from flytemosaic_spark.sources.jpeg import decode_jpeg

            return decode_jpeg(payload)
        a = np.asarray(Image.open(io.BytesIO(payload)))
        return a.reshape(a.shape[0], a.shape[1], -1)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from flytemosaic_spark.sources.gif import decode_gif

        frames, _ = decode_gif(payload)
        return frames[0]  # first frame RGBA; frame_sample uses the rest
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from flytemosaic_spark.sources.webp import decode_webp

        return decode_webp(payload)  # VP8L tier; VP8 lossy is a seam
    raise NotImplementedError(
        "codec not available: payload is not the FAKE container, PNG, "
        "JPEG, WebP(VP8L), GIF, BMP, or TIFF/GeoTIFF; MP4/... need "
        "ffmpeg at this seam"
    )


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table: n rows of fake images with varying
    dimensions."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        c = int(rng.choice([1, 3]))
        rows.append((i, "image", _fake_payload(i, w, h, c), w, h, None, None))
    return spark.createDataFrame(rows, MEDIA)


def decode_stats(media: DataFrame) -> DataFrame:
    """Decode each payload and emit per-media pixel statistics —
    the decode/feature-extract pattern over mapInPandas. One Arrow
    batch in, one out; payload bytes never round-trip through the JVM
    row format more than once."""
    schema = (
        "media_id long, width int, height int, channels int, "
        "mean_px double, std_px double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _decode_payload(bytes(payload))
                out.append(
                    (
                        int(mid),
                        arr.shape[1],
                        arr.shape[0],
                        arr.shape[2],
                        float(arr.mean()),
                        float(arr.std()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "channels", "mean_px", "std_px"],
            )

    return media.select("media_id", "payload").mapInPandas(run, schema)


def resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of every payload (pure numpy — no codec
    needed once decoded). Returns the same media schema with new
    payloads; at scale this is the standard normalize-before-training
    pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                arr = _decode_payload(bytes(payload))
                h, w, c = arr.shape
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                small = arr[np.ix_(yi, xi)]
                payloads.append(
                    _MAGIC + struct.pack("<iiB", out_w, out_h, c) + small.tobytes()
                )
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["width"] = out_w
            pdf["height"] = out_h
            yield pdf

    return media.mapInPandas(run, MEDIA)


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame/row sampling: keep every ``every``-th pixel row — the
    video-frame-sampling pattern applied to the fake container."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, heights = [], []
            for payload in pdf["payload"]:
                arr = _decode_payload(bytes(payload))[::every]
                h, w, c = arr.shape
                payloads.append(_MAGIC + struct.pack("<iiB", w, h, c) + arr.tobytes())
                heights.append(h)
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["height"] = heights
            yield pdf

    return media.mapInPandas(run, MEDIA)


def embed_media(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic feature extraction: a hash-seeded embedding per
    payload (stands in for a vision encoder; the Spark shape — binary
    in, array<float> out, Arrow-batched — is the real thing)."""
    schema = "media_id long, embedding array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                seed = int.from_bytes(digest[:8], "little")
                embs.append(
                    np.random.default_rng(seed).standard_normal(dim).astype("f4")
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": embs})

    return media.select("media_id", "payload").mapInPandas(run, schema)


def extract_patches(media: DataFrame, patch: int = 4) -> DataFrame:
    """ViT-style patch pooling: decode each payload, split the image
    into non-overlapping ``patch`` x ``patch`` tiles and emit one row
    per tile with its mean and max over all channels — the patch-
    embedding front end of a vision transformer, minus the learned
    projection (which is a matmul over these pooled tiles).

    Long-form output (media_id, py, px, mean_px, max_px) so downstream
    joins/apis stay columnar; images whose sides are not multiples of
    ``patch`` are cropped to the largest covered grid, matching the
    common ViT preprocessing contract.
    """
    schema = "media_id long, py int, px int, mean_px double, max_px int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _decode_payload(bytes(payload))
                h, w, c = arr.shape
                gh, gw = h // patch, w // patch
                tiles = (
                    arr[: gh * patch, : gw * patch]
                    .reshape(gh, patch, gw, patch, c)
                    .astype(np.float64)
                )
                means = tiles.mean(axis=(1, 3, 4))
                maxes = tiles.max(axis=(1, 3, 4)).astype(np.int64)
                py, px = np.meshgrid(range(gh), range(gw), indexing="ij")
                frames.append(
                    pd.DataFrame(
                        {
                            "media_id": int(mid),
                            "py": py.ravel().astype("int32"),
                            "px": px.ravel().astype("int32"),
                            "mean_px": means.ravel(),
                            "max_px": maxes.ravel(),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return media.select("media_id", "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Audio: fake PCM container + frame-energy VAD segmentation
# ---------------------------------------------------------------------------

_AUDIO_MAGIC = b"FAKS"


def _fake_audio_payload(media_id: int, n_frames: int = 50, frame: int = 400) -> bytes:
    """Deterministic int16 PCM: per 400-sample frame, loud (speech-like,
    amplitude ~8000) or quiet (noise-floor, ~200) chosen by a seeded
    rng — so VAD has real voiced runs to find."""
    rng = np.random.default_rng(media_id)
    loud = rng.random(n_frames) < 0.55
    samples = np.concatenate(
        [
            (
                rng.normal(0.0, 8000.0 if v else 200.0, frame)
                .clip(-32767, 32767)
                .astype(np.int16)
            )
            for v in loud
        ]
    )
    return (
        _AUDIO_MAGIC
        + struct.pack("<ii", 16000, samples.size)
        + samples.tobytes()
    )


def _decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """THE AUDIO CODEC SEAM — three REAL tiers plus the fake:

    1. deterministic FAKS container (synthetic tests);
    2. REAL RIFF/WAVE PCM via the stdlib ``wave`` module (16-bit mono
       or interleaved-averaged-to-mono) — no external library needed;
    3. REAL FLAC via the pure-numpy codec in ``sources/flac.py``
       (CONSTANT/VERBATIM/FIXED/LPC subframes, Rice partitions, all
       four channel assignments, CRC + MD5 verified), downmixed to
       mono with the same mean-then-truncate rule as WAV;
    4. MP3/... raise NotImplementedError naming the swap point
       (soundfile/ffmpeg).
    """
    if payload.startswith(_AUDIO_MAGIC):
        rate, n = struct.unpack_from("<ii", payload, 4)
        samples = np.frombuffer(
            payload, dtype=np.int16, offset=4 + 8, count=n
        )
        return rate, samples
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise NotImplementedError(
                    f"WAV sample width {w.getsampwidth()} unsupported "
                    "(16-bit PCM only)"
                )
            rate = w.getframerate()
            nch = w.getnchannels()
            frames = np.frombuffer(
                w.readframes(w.getnframes()), dtype=np.int16
            )
        if nch > 1:  # downmix: average channels, keep int16
            frames = (
                frames.reshape(-1, nch).mean(axis=1).astype(np.int16)
            )
        return rate, frames
    if payload.startswith(b"fLaC"):
        from flytemosaic_spark.sources.flac import decode_flac

        rate, arr = decode_flac(payload)
        if arr.shape[1] > 1:  # downmix: average channels, keep int16
            frames = arr.astype(np.float64).mean(axis=1).astype(np.int16)
        else:
            frames = arr[:, 0].astype(np.int16)
        return rate, frames
    raise NotImplementedError(
        "codec not available: payload is neither the FAKS container, "
        "RIFF/WAVE, nor FLAC; MP3/... need soundfile or ffmpeg at this "
        "seam"
    )


def synthesize_audio(spark: SparkSession, n: int = 32) -> DataFrame:
    rows = [(i, _fake_audio_payload(i)) for i in range(n)]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def synthesize_flac_audio(
    keys: DataFrame, key_col: str = "s_suppkey"
) -> DataFrame:
    """REAL FLAC payloads whose PCM derives arithmetically from the
    key: sample i of clip k is ``(k*7919 + i*104729) % 4001 - 2000``
    (odd keys get a second channel ``(k*31 + i*7) % 1999 - 999``),
    n = 512 + (k*13) % 1024 samples at 16 kHz, encoded on executors
    with block_size=256 (multi-frame) and auto stereo decorrelation —
    so a downstream decode round-trips REAL compressed bitstreams and
    an SQL oracle can recompute the expected PCM stats exactly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.flac import encode_flac

        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                n = 512 + (k * 13) % 1024
                i = np.arange(n, dtype=np.int64)
                s = (k * 7919 + i * 104729) % 4001 - 2000
                pcm = np.stack([s, (k * 31 + i * 7) % 1999 - 999], axis=1) \
                    if k % 2 else s
                out.append(
                    (k, encode_flac(pcm, 16000, block_size=256))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    # keys usually arrive as ONE tiny parquet partition — spread the
    # per-clip codec work across cores (the shuffle moves 8-byte keys,
    # the payloads are BORN distributed and never move again). The
    # partition count is EXPLICIT: AQE would coalesce an 8 KB shuffle
    # back to one partition and serialize the codec work.
    n = keys.sparkSession.sparkContext.defaultParallelism
    return keys.select(key_col).repartition(n, F.col(key_col)).mapInPandas(
        run, "media_id long, payload binary"
    )


def audio_pcm_stats(audio: DataFrame) -> DataFrame:
    """Decode each clip through the audio codec seam (FAKS / WAV /
    FLAC) and emit exact integer PCM statistics — the verification
    pass of the audio tier: one Arrow batch in, one metadata-scale
    row per clip out, payloads never shuffle."""
    schema = (
        "media_id long, sample_rate long, n_samples long, "
        "sum_amp long, min_amp long, max_amp long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = _decode_audio(bytes(payload))
                a = samples.astype(np.int64)
                out.append(
                    (
                        int(mid),
                        int(rate),
                        int(a.size),
                        int(a.sum()),
                        int(a.min()),
                        int(a.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_samples",
                    "sum_amp", "min_amp", "max_amp",
                ],
            )

    return audio.select("media_id", "payload").mapInPandas(run, schema)


def frame_energy_vad(
    audio: DataFrame, frame: int = 400, threshold: float = 1.0e6
) -> DataFrame:
    """Frame-energy voice-activity segmentation over Arrow-batched
    ``mapInPandas``: per clip, chop the PCM stream into ``frame``-sample
    frames, energy = mean(sample^2) per frame, voiced = energy above
    the threshold; returns per-clip frame counts and the longest voiced
    run — the pre-filter an audio-training pipeline runs to drop
    silence-only clips and to cut long recordings at pauses.

    Scale shape: one Arrow batch in, one small typed row out per clip;
    clips never leave their partition, output is metadata-scale. The
    decode is the clearly-marked FAKS seam (swap for soundfile/ffmpeg).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = _decode_audio(bytes(payload))
                n_frames = samples.size // frame
                fr = (
                    samples[: n_frames * frame]
                    .astype(np.float64)
                    .reshape(n_frames, frame)
                )
                energy = (fr * fr).mean(axis=1)
                voiced = energy > threshold
                longest = run_len = 0
                for v in voiced:
                    run_len = run_len + 1 if v else 0
                    longest = max(longest, run_len)
                out.append(
                    (
                        int(mid),
                        int(rate),
                        int(n_frames),
                        int(voiced.sum()),
                        int(longest),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_frames",
                    "n_voiced",
                    "longest_voiced_run",
                ],
            )

    schema = (
        "media_id long, sample_rate long, n_frames long, "
        "n_voiced long, longest_voiced_run long"
    )
    return audio.select("media_id", "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Video: REAL ISO-BMFF (MP4) container metadata — sources/mp4.py
# ---------------------------------------------------------------------------


def video_metadata(videos: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container-metadata scan over binary MP4 payloads — the
    ffprobe-style pass a curation pipeline runs BEFORE any decode
    (filter by duration/resolution/codec/track layout). One Arrow
    batch in, one typed row per video out; box parsing is
    ``sources/mp4.parse_mp4`` (pure stdlib, real ISO-BMFF structure).
    Frame decode stays at the documented ffmpeg seam."""
    schema = (
        "media_id long, width long, height long, duration_ms long, "
        "codec string, n_tracks long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.mp4 import parse_mp4

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                meta = parse_mp4(bytes(payload))
                vid = next(
                    (t for t in meta["tracks"] if t["kind"] == "vide"),
                    None,
                )
                out.append(
                    (
                        int(mid),
                        int(vid["width"]) if vid else 0,
                        int(vid["height"]) if vid else 0,
                        int(meta["duration_ms"]),
                        vid["codec"] if vid else None,
                        len(meta["tracks"]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "duration_ms",
                    "codec", "n_tracks",
                ],
            )

    return videos.select("media_id", payload_col).mapInPandas(run, schema)


def synthesize_videos(keys: DataFrame, key_col: str = "s_suppkey") -> DataFrame:
    """Real MP4 payloads whose metadata derives arithmetically from the
    key (width = 320 + 37k mod 1600, height = 180 + 53k mod 900,
    duration = 1000 + 97k mod 600000 ms, codec by k mod 3, audio track
    when k is odd) — built on executors, so a downstream
    :func:`video_metadata` round-trips REAL container bytes and an SQL
    oracle can recompute the expected values exactly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.mp4 import encode_minimal_mp4

        codecs = ["avc1", "hev1", "av01"]
        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                out.append(
                    (
                        k,
                        encode_minimal_mp4(
                            duration_ms=1000 + (k * 97) % 600000,
                            width=320 + (k * 37) % 1600,
                            height=180 + (k * 53) % 900,
                            video_codec=codecs[k % 3],
                            audio=bool(k % 2),
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return keys.select(key_col).mapInPandas(
        run, "media_id long, payload binary"
    )


def synthesize_mjpeg_videos(
    keys: DataFrame, key_col: str = "s_suppkey"
) -> DataFrame:
    """REAL MJPEG-in-MP4 payloads: clip k has 4 + k % 13 frames of
    32x24 grayscale, frame j a constant ``(k*11 + j*29) % 256`` —
    constant 8x8-aligned gray blocks survive JPEG quantization
    EXACTLY (DC-only blocks, zero chroma), so decoded pixel values
    are SQL-recomputable and the oracle checks the whole
    container-demux + entropy-decode + IDCT path, not just box
    arithmetic. Chunked 4 samples/chunk to exercise stsc runs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.jpeg import encode_jpeg
        from flytemosaic_spark.sources.mp4 import encode_mp4_with_samples

        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                jpegs = [
                    encode_jpeg(
                        np.full(
                            (24, 32, 1), (k * 11 + j * 29) % 256, np.uint8
                        ),
                        quality=90,
                    )
                    for j in range(4 + k % 13)
                ]
                out.append(
                    (
                        k,
                        encode_mp4_with_samples(
                            jpegs, codec="jpeg", width=32, height=24, fps=10
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    # spread per-clip codec work across cores (see synthesize_flac_audio)
    n = keys.sparkSession.sparkContext.defaultParallelism
    return keys.select(key_col).repartition(n, F.col(key_col)).mapInPandas(
        run, "media_id long, payload binary"
    )


def video_frame_stats(videos: DataFrame, every: int = 2) -> DataFrame:
    """REAL video frame sampling: demux the MP4 sample table, slice
    every ``every``-th sample out of mdat, and — for MJPEG tracks —
    decode each kept frame through the pure-numpy T.81 codec. Emits
    one metadata-scale row per clip with exact integer pixel sums
    (``sum_kept_px`` = sum over kept frames of the frame's integer
    mean, exact for the constant-gray fixtures). Inter-frame codecs
    (avc1/av01/...) raise at the documented ffmpeg seam.

    Scale shape: payloads never shuffle — one mapInPandas task reads,
    demuxes, and decodes; only typed scalars leave Python."""
    schema = (
        "media_id long, n_samples long, n_kept long, width long, "
        "height long, duration_ms long, sum_kept_px long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.jpeg import decode_jpeg
        from flytemosaic_spark.sources.mp4 import parse_mp4

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                meta = parse_mp4(data)
                vid = next(
                    t for t in meta["tracks"] if t["kind"] == "vide"
                )
                if vid["codec"] != "jpeg":
                    raise NotImplementedError(
                        f"frame decode for codec {vid['codec']} needs "
                        "ffmpeg at this seam (MJPEG is built in)"
                    )
                kept = vid["samples"][::every]
                total = 0
                for off, sz in kept:
                    frame = decode_jpeg(data[off : off + sz])
                    total += int(float(frame.mean()) + 0.5)
                out.append(
                    (
                        int(mid),
                        int(vid["sample_count"]),
                        len(kept),
                        int(vid["width"]),
                        int(vid["height"]),
                        int(meta["duration_ms"]),
                        total,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_samples", "n_kept", "width",
                    "height", "duration_ms", "sum_kept_px",
                ],
            )

    return videos.select("media_id", "payload").mapInPandas(run, schema)


def synthesize_gifs(keys: DataFrame, key_col: str = "s_suppkey") -> DataFrame:
    """REAL animated-GIF payloads: clip k has 2 + k % 7 solid-color
    16x20 frames, frame j colored ((k*3+j*11)%256, (k*5+j*13)%256,
    (k*7+j*17)%256) — exact palettes make the GIF codec its own
    oracle, so decoded pixel sums are SQL-recomputable. Odd keys are
    written INTERLACED (the 4-pass row order)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.gif import encode_gif

        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                frames = [
                    np.full(
                        (16, 20, 3),
                        [
                            (k * 3 + j * 11) % 256,
                            (k * 5 + j * 13) % 256,
                            (k * 7 + j * 17) % 256,
                        ],
                        dtype=np.uint8,
                    )
                    for j in range(2 + k % 7)
                ]
                out.append(
                    (k, encode_gif(frames, delay_cs=10,
                                   interlace=bool(k % 2)))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    n = keys.sparkSession.sparkContext.defaultParallelism
    return keys.select(key_col).repartition(n, F.col(key_col)).mapInPandas(
        run, "media_id long, payload binary"
    )


def gif_frame_stats(gifs: DataFrame) -> DataFrame:
    """Decode every GIF (all frames, compositing honored) and emit
    exact integer stats — media demux + LZW entropy decode inside the
    gate, one metadata-scale row per clip; payloads never shuffle."""
    schema = (
        "media_id long, n_frames long, width long, height long, "
        "sum_rgb long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.gif import decode_gif

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, meta = decode_gif(bytes(payload))
                # solid frames: the mean IS the color, exactly
                total = int(
                    frames[:, :, :, :3]
                    .astype(np.int64)
                    .mean(axis=(1, 2))
                    .sum()
                )
                out.append(
                    (
                        int(mid),
                        meta["n_frames"],
                        meta["width"],
                        meta["height"],
                        total,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_frames", "width", "height", "sum_rgb",
                ],
            )

    return gifs.select("media_id", "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Image near-duplicate detection: dHash + Hamming-band LSH
# ---------------------------------------------------------------------------


def image_dhash(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """64-bit difference hash per image — THE standard perceptual
    near-dup signature for image curation (robust to small noise,
    recompression and resizes): decode through the codec seam
    (PNG/JPEG/GIF/TIFF/fake), grayscale by channel mean,
    nearest-neighbor resize to 9x8, bit (r*8 + c) = 1 iff
    gray[r, c] > gray[r, c+1]. Emits (media_id, dhash) — the hash is
    the signed-int64 view of the 64-bit pattern. Arrow-batched; the
    payloads never shuffle, only 8-byte hashes leave the task."""
    schema = "media_id long, dhash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                arr = _decode_payload(bytes(payload)).astype(np.float64)
                gray = arr.mean(axis=2)
                h, w = gray.shape
                yi = (np.arange(8) * h // 8).astype(int)
                xi = (np.arange(9) * w // 9).astype(int)
                g = gray[np.ix_(yi, xi)]
                bits = (g[:, :-1] > g[:, 1:]).reshape(-1)
                val = 0
                for i in np.flatnonzero(bits):
                    val |= 1 << int(i)
                if val >= 1 << 63:
                    val -= 1 << 64
                out.append((int(mid), val))
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return media.select("media_id", payload_col).mapInPandas(run, schema)


def image_neardup_pairs(
    hashes: DataFrame, threshold: int = 3
) -> DataFrame:
    """Near-duplicate image pairs from dHashes via Hamming-band LSH:
    the 64-bit hash splits into four 16-bit bands; by pigeonhole any
    pair within Hamming distance 3 shares at least one intact band,
    so candidates come from four equi-joins (no all-pairs), then the
    exact ``bit_count(xor) <= threshold`` check confirms. The scale
    shape of MinHash-LSH (operators/dedup.py) applied to images."""
    arr = F.array(
        *[
            F.shiftrightunsigned(F.col("dhash"), 16 * b).bitwiseAND(
                F.lit(65535)
            )
            for b in range(4)
        ]
    )
    banded = hashes.select(
        F.col("media_id"), F.col("dhash"), F.posexplode(arr).alias(
            "band", "bucket"
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.media_id") < F.col("b.media_id"))
        .where(
            F.bit_count(
                F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))
            )
            <= F.lit(threshold)
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
        )
        .distinct()
    )


def synthesize_dhash_images(
    keys: DataFrame, key_col: str = "s_suppkey", groups: int = 25
) -> DataFrame:
    """PNG images whose dHash is EXACTLY a designed 64-bit pattern per
    group g = k % groups: row pixels walk +-12 steps so each adjacent
    comparison realizes one designed bit with margin 12, and odd keys
    add +-2 noise the margin provably absorbs — same-group images are
    near-dups BY CONSTRUCTION, cross-group hashes share no 16-bit band
    and sit >= 19 bits apart (checked for g < 25 at design time), so
    the expected pair set is pure arithmetic an SQL oracle replays."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_rows = []
        for pdf in batches:
            for k in pdf[key_col]:
                k = int(k)
                g = k % groups
                h = 0
                for b in range(4):
                    h |= ((g * 1000003 + b * 7919) % 65536) << (16 * b)
                img = np.zeros((8, 9), dtype=np.int32)
                img[:, 0] = 128
                for r in range(8):
                    for c in range(8):
                        bit = (h >> (r * 8 + c)) & 1
                        img[r, c + 1] = img[r, c] + (-12 if bit else 12)
                if k % 2:
                    noise = (
                        (k * 31 + np.arange(72).reshape(8, 9) * 9) % 5
                    ) - 2
                    img = img + noise
                payload = _encode_png(img.astype(np.uint8)[:, :, None])
                out_rows.append((k, payload))
            yield pd.DataFrame(out_rows, columns=["media_id", "payload"])
            out_rows = []

    n = keys.sparkSession.sparkContext.defaultParallelism
    return keys.select(key_col).repartition(n, F.col(key_col)).mapInPandas(
        run, "media_id long, payload binary"
    )


def audio_resample_stats(
    audio: DataFrame, up: int = 3, down: int = 4
) -> DataFrame:
    """Linear-interpolation resampling (the resample-to-16k pass every
    speech pipeline runs) with EXACT cross-engine arithmetic: output
    sample j sits at input position j*down/up held as the integer pair
    (j*down // up, j*down % up), so the interpolation weight is ONE
    division and the value ONE fused multiply-add — the same IEEE tree
    an SQL oracle replays (the CRS-probe contract applied to DSP).
    Emits per-clip integer stats of the resampled stream; decode is
    the audio codec seam (FAKS/WAV/FLAC)."""
    schema = (
        "media_id long, n_out long, sum_amp long, min_amp long, "
        "max_amp long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, samples = _decode_audio(bytes(payload))
                s = samples.astype(np.float64)
                n_in = s.size
                n_out = (n_in * up) // down
                j = np.arange(n_out, dtype=np.int64)
                num = j * down
                nidx = num // up
                f = (num % up) / float(up)
                nxt = np.minimum(nidx + 1, n_in - 1)
                v = s[nidx] + (s[nxt] - s[nidx]) * f
                r = np.floor(v + 0.5).astype(np.int64)
                out.append(
                    (
                        int(mid),
                        int(n_out),
                        int(r.sum()),
                        int(r.min()) if n_out else 0,
                        int(r.max()) if n_out else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_out", "sum_amp", "min_amp", "max_amp",
                ],
            )

    return audio.select("media_id", "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Subtitle (SRT) text tracks — the caption scan of video curation
# ---------------------------------------------------------------------------


def _parse_srt(text: str) -> list[tuple[int, int, str]]:
    """Parse SubRip: blocks of 'index / HH:MM:SS,mmm --> HH:MM:SS,mmm /
    text...' separated by blank lines -> [(start_ms, end_ms, text)].
    Tolerates CRLF and stray blank lines; malformed time lines raise."""
    cues = []
    for block in text.replace("\r\n", "\n").split("\n\n"):
        lines = [ln for ln in block.split("\n") if ln.strip()]
        if len(lines) < 2:
            continue
        # lines[0] is the numeric index; the time line is next
        tl = lines[1] if "-->" in lines[1] else lines[0]
        if "-->" not in tl:
            raise ValueError("SRT block has no time line")
        a, b = [p.strip() for p in tl.split("-->")]

        def ms(ts: str) -> int:
            hh, mm, rest = ts.split(":")
            ss, mmm = rest.split(",")
            return (
                int(hh) * 3600000 + int(mm) * 60000
                + int(ss) * 1000 + int(mmm)
            )

        body = "\n".join(lines[2:]) if "-->" in lines[1] else "\n".join(
            lines[1:]
        )
        cues.append((ms(a), ms(b), body))
    return cues


def _format_srt_ts(t: int) -> str:
    hh, t = divmod(t, 3600000)
    mm, t = divmod(t, 60000)
    ss, mmm = divmod(t, 1000)
    return f"{hh:02d}:{mm:02d}:{ss:02d},{mmm:03d}"


def synthesize_srt(keys: DataFrame, key_col: str = "s_suppkey") -> DataFrame:
    """Real SubRip payloads with key-derived cue timings and text
    lengths (cue j of doc k: start j*2000 + (k*37)%1000 ms, duration
    500 + (k*13 + j*29)%1500 ms, text 'a' * (5 + (k*11 + j*3)%40)) —
    an SQL oracle recomputes the parsed totals exactly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                blocks = []
                for j in range(2 + k % 9):
                    start = j * 2000 + (k * 37) % 1000
                    end = start + 500 + (k * 13 + j * 29) % 1500
                    text = "a" * (5 + (k * 11 + j * 3) % 40)
                    blocks.append(
                        f"{j + 1}\n{_format_srt_ts(start)} --> "
                        f"{_format_srt_ts(end)}\n{text}"
                    )
                out.append((k, "\n\n".join(blocks).encode("utf-8")))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return keys.select(key_col).mapInPandas(
        run, "media_id long, payload binary"
    )


def subtitle_stats(subs: DataFrame) -> DataFrame:
    """Parse each SRT payload and emit exact cue statistics — the
    caption-track pre-filter of a video curation pipeline (drop clips
    with no/too-sparse captions, compute speech density)."""
    schema = (
        "media_id long, n_cues long, total_ms long, total_chars long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                cues = _parse_srt(bytes(payload).decode("utf-8"))
                out.append(
                    (
                        int(mid),
                        len(cues),
                        sum(e - s for s, e, _ in cues),
                        sum(len(t) for _, _, t in cues),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_cues", "total_ms", "total_chars"],
            )

    return subs.select("media_id", "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Audio features: framed STFT -> mel filterbank -> log energies
# ---------------------------------------------------------------------------


def _mel_filterbank(
    n_mels: int, n_fft: int, rate: int
) -> np.ndarray:
    """Triangular mel filterbank (HTK mel scale, the public formula
    m = 2595 log10(1 + f/700)): (n_mels, n_fft//2 + 1) weights."""

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    pts = from_mel(
        np.linspace(to_mel(0.0), to_mel(rate / 2.0), n_mels + 2)
    )
    bins = np.floor((n_fft + 1) * pts / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        lo, ctr, hi = bins[m], bins[m + 1], bins[m + 2]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[m, k] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[m, k] = (hi - k) / (hi - ctr)
    return fb


def audio_logmel_stats(
    audio: DataFrame,
    n_fft: int = 256,
    hop: int = 128,
    n_mels: int = 16,
) -> DataFrame:
    """Log-mel feature extraction — THE front end of every speech
    model: Hann-windowed framed rfft, power spectrum, triangular mel
    filterbank, log energies — all vectorized numpy over the clip's
    frame matrix at once. Emits per-clip aggregates (frame count, the
    dominant mel band of the summed energies, and the rounded total
    log-mel mass) because probe outputs must be scalar columns; the
    full (n_frames, n_mels) feature matrix is what a training
    pipeline would write — same kernel, different sink. Verified by
    physics in tests: pure tones land in the predicted mel band and
    Parseval holds through the framing."""
    schema = (
        "media_id long, n_frames long, dominant_mel long, "
        "total_logmel long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        window = np.hanning(n_fft)
        for pdf in batches:
            out = []
            fb = None
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = _decode_audio(bytes(payload))
                if fb is None:
                    fb = _mel_filterbank(n_mels, n_fft, rate)
                s = samples.astype(np.float64)
                n_frames = max(0, 1 + (s.size - n_fft) // hop)
                if n_frames == 0:
                    out.append((int(mid), 0, -1, 0))
                    continue
                idx = (
                    np.arange(n_frames)[:, None] * hop
                    + np.arange(n_fft)[None, :]
                )
                frames = s[idx] * window[None, :]
                spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                mel = spec @ fb.T  # (n_frames, n_mels)
                logmel = np.log1p(mel)
                energy = logmel.sum(axis=0)
                out.append(
                    (
                        int(mid),
                        int(n_frames),
                        int(energy.argmax()),
                        int(np.floor(logmel.sum() + 0.5)),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_frames", "dominant_mel", "total_logmel",
                ],
            )

    return audio.select("media_id", "payload").mapInPandas(run, schema)


def synthesize_mp3(keys: DataFrame, key_col: str = "s_suppkey") -> DataFrame:
    """Structurally valid CBR MP3 shells with key-derived frame plans
    (bitrate index 1 + k%14, sample-rate index k%3, 20 + k%50 frames,
    (k*7)%200 bytes of ID3v2 padding) — the header-walk parser's
    fixtures; an SQL oracle recomputes every reported field."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.mp3 import encode_mp3_shell

        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                out.append(
                    (
                        k,
                        encode_mp3_shell(
                            20 + k % 50,
                            bitrate_idx=1 + k % 14,
                            rate_idx=k % 3,
                            mode=k % 4,
                            id3_padding=(k * 7) % 200,
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return keys.select(key_col).mapInPandas(
        run, "media_id long, payload binary"
    )


def mp3_metadata(audios: DataFrame) -> DataFrame:
    """The MP3 ffprobe pass: walk every frame header (sources/mp3.py)
    and emit duration/bitrate/sample-rate per clip — what an audio
    curation pipeline filters on BEFORE any bitstream decode (which
    stays at the documented ffmpeg seam)."""
    schema = (
        "media_id long, sample_rate long, n_frames long, "
        "duration_ms long, mean_bitrate_kbps long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.mp3 import parse_mp3

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                m = parse_mp3(bytes(payload))
                out.append(
                    (
                        int(mid),
                        m["sample_rate"],
                        m["n_frames"],
                        m["duration_ms"],
                        m["mean_bitrate_kbps"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_frames",
                    "duration_ms", "mean_bitrate_kbps",
                ],
            )

    return audios.select("media_id", "payload").mapInPandas(run, schema)


def synthesize_exif_jpegs(
    keys: DataFrame, key_col: str = "s_suppkey"
) -> DataFrame:
    """Real JPEGs with key-derived EXIF APP1 segments (orientation
    1 + k%8, ISO 100 + (k*7)%700, capture day 1 + k%28) — fixtures
    for the EXIF scan; the SQL oracle recomputes every field."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.exif import (
            build_exif_app1,
            inject_app1,
        )
        from flytemosaic_spark.sources.jpeg import encode_jpeg

        base = encode_jpeg(np.full((16, 24, 1), 100, np.uint8), quality=90)
        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                app1 = build_exif_app1(
                    make="cam" + str(k % 5),
                    model="m",
                    orientation=1 + k % 8,
                    datetime=f"2024:01:{1 + k % 28:02d} 00:00:00",
                    exposure=(1, 125),
                    iso=100 + (k * 7) % 700,
                    pixel_x=24,
                    pixel_y=16,
                )
                out.append((k, inject_app1(base, app1)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return keys.select(key_col).mapInPandas(
        run, "media_id long, payload binary"
    )


def exif_scan(media: DataFrame) -> DataFrame:
    """The EXIF curation pass: parse the APP1 TIFF stream, decode the
    pixels, APPLY the orientation transform (a phone photo with
    orientation 6 otherwise trains sideways), and emit the upright
    dimensions plus the filter fields (camera, ISO, capture time)."""
    schema = (
        "media_id long, make string, orientation long, iso long, "
        "capture_dt string, upright_w long, upright_h long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.exif import (
            apply_orientation,
            parse_exif,
        )

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                meta = parse_exif(data)
                arr = apply_orientation(
                    _decode_payload(data), meta["orientation"]
                )
                out.append(
                    (
                        int(mid),
                        meta["make"],
                        meta["orientation"],
                        meta["iso"],
                        meta["datetime"],
                        arr.shape[1],
                        arr.shape[0],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "make", "orientation", "iso",
                    "capture_dt", "upright_w", "upright_h",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Corpus containers: WARC (Common Crawl) + WebDataset tar shards
# ---------------------------------------------------------------------------


def synthesize_warc(keys: DataFrame, key_col: str = "s_suppkey") -> DataFrame:
    """Real WARC files (warcinfo + HTTP response records) with
    key-derived pages; odd keys use the Common Crawl per-record-gzip
    layout, even keys plain bytes — both read paths exercised."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.warc import write_warc

        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                pages = [
                    (
                        f"https://s{k % 7}.example/p{i}",
                        200 if (k + i) % 5 else 404,
                        b"a" * (20 + (k * 13 + i * 17) % 300),
                    )
                    for i in range(3 + k % 8)
                ]
                out.append(
                    (k, write_warc(pages, per_record_gzip=bool(k % 2)))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return keys.select(key_col).mapInPandas(
        run, "media_id long, payload binary"
    )


def warc_page_stats(warcs: DataFrame) -> DataFrame:
    """The crawl-ingest scan: parse every WARC record, split HTTP
    responses, and emit per-file page statistics (response count, 200
    count, body volume) — the first pass of a Common-Crawl-shaped
    curation pipeline. One shard per task; records never shuffle."""
    schema = (
        "media_id long, n_responses long, n_ok long, total_body_bytes long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.warc import (
            parse_warc,
            split_http_response,
        )

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_resp = n_ok = total = 0
                for rec in parse_warc(bytes(payload)):
                    if rec["type"] != "response":
                        continue
                    status, _, body = split_http_response(rec["content"])
                    n_resp += 1
                    n_ok += status == 200
                    total += len(body)
                out.append((int(mid), n_resp, n_ok, total))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_responses", "n_ok", "total_body_bytes",
                ],
            )

    return warcs.select("media_id", "payload").mapInPandas(run, schema)


def synthesize_webdataset(
    keys: DataFrame, key_col: str = "s_suppkey"
) -> DataFrame:
    """Real WebDataset tar shards: shard k holds 2 + k%5 samples, each
    a {cls, txt, png} triplet with key-derived content (the png is a
    REAL solid-gray PNG so decoded means are exact)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.webdataset import write_shard

        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                samples = []
                for i in range(2 + k % 5):
                    png = _encode_png(
                        np.full(
                            (8, 8, 1), (k * 5 + i * 11) % 256, np.uint8
                        )
                    )
                    samples.append(
                        (
                            f"{i:06d}",
                            {
                                "cls": str((k * 3 + i) % 10).encode(),
                                "txt": b"a" * (5 + (k + i * 7) % 50),
                                "png": png,
                            },
                        )
                    )
                out.append((k, write_shard(samples)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return keys.select(key_col).mapInPandas(
        run, "media_id long, payload binary"
    )


def webdataset_sample_stats(shards: DataFrame) -> DataFrame:
    """EXPLODE tar shards into one row per training sample — the
    WebDataset access pattern: group members by key prefix, decode the
    image part through the codec seam, read labels and text lengths.
    Shard bytes stay in their task; only typed sample rows leave."""
    schema = (
        "media_id long, sample_idx long, cls long, txt_len long, "
        "mean_px long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.webdataset import parse_shard

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for s in parse_shard(bytes(payload)):
                    img_ext = next(
                        e
                        for e in ("png", "jpg", "jpeg", "webp", "gif",
                                  "bmp", "tif")
                        if e in s["parts"]
                    )
                    img = _decode_payload(s["parts"][img_ext])
                    out.append(
                        (
                            int(mid),
                            int(s["key"]),
                            int(s["parts"]["cls"].decode()),
                            len(s["parts"]["txt"]),
                            int(img.astype(np.float64).mean()),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_idx", "cls", "txt_len", "mean_px",
                ],
            )

    return shards.select("media_id", "payload").mapInPandas(run, schema)


def synthesize_ogg_opus(
    keys: DataFrame, key_col: str = "s_suppkey"
) -> DataFrame:
    """Structurally valid Ogg Opus shells with key-derived page plans
    (3 + k%12 audio pages of 960*(1 + k%40) samples, 1 + k%2 channels,
    preskip 312) — fixtures for the container scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.ogg import encode_ogg_opus_shell

        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                out.append(
                    (
                        k,
                        encode_ogg_opus_shell(
                            3 + k % 12,
                            samples_per_page=960 * (1 + k % 40),
                            channels=1 + k % 2,
                            preskip=312,
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return keys.select(key_col).mapInPandas(
        run, "media_id long, payload binary"
    )


def ogg_opus_metadata(audios: DataFrame) -> DataFrame:
    """The Ogg Opus ffprobe pass: walk pages (CRC-verified), read
    OpusHead, and derive the EXACT duration from the final granule
    position — the speech-dataset curation scan before any decode
    (SILK/CELT stays at the named ffmpeg/libopus seam)."""
    schema = (
        "media_id long, channels long, preskip long, n_pages long, "
        "duration_ms long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.ogg import parse_ogg_opus

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                m = parse_ogg_opus(bytes(payload))
                out.append(
                    (
                        int(mid),
                        m["channels"],
                        m["preskip"],
                        m["n_pages"],
                        m["duration_ms"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "channels", "preskip", "n_pages",
                    "duration_ms",
                ],
            )

    return audios.select("media_id", "payload").mapInPandas(run, schema)


def synthesize_zstd_cogs(
    keys: DataFrame, key_col: str = "s_suppkey"
) -> DataFrame:
    """REAL ZSTD-compressed tiled GeoTIFFs (the modern GDAL COG
    default, ``-co COMPRESS=ZSTD`` — compression code 50000; the
    reference reads them via GDAL at
    flytemosaic/datasets/utils.py:123-126). Pixels derive
    arithmetically from the key: ``px[y, x] = (k*31 + y*17 + x*7) %
    60001`` as uint16 over a 64x64 scene, encoded on executors with
    32-px tiles (libzstd via pyarrow when present — genuinely
    compressed Huffman+FSE streams — else valid store-mode frames;
    both decode through the pure-Python RFC 8878 tier in
    ``sources/zstd.py``). Each row also carries its per-key read
    window, so a downstream windowed decode exercises the
    cloud-optimized access path and an SQL oracle can recompute the
    expected pixel stats exactly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.geotiff import encode_geotiff

        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                y, x = np.mgrid[0:64, 0:64]
                px = ((k * 31 + y * 17 + x * 7) % 60001).astype("u2")
                out.append(
                    (
                        k,
                        encode_geotiff(px, tile=32, compress="zstd"),
                        k % 29,
                        (k * 3) % 31,
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "wy", "wx"]
            )

    # spread the codec work with an EXPLICIT partition count — AQE
    # would coalesce the tiny key shuffle to one partition and
    # serialize it (the x222 trap)
    n = keys.sparkSession.sparkContext.defaultParallelism
    return keys.select(key_col).repartition(n, F.col(key_col)).mapInPandas(
        run, "media_id long, payload binary, wy long, wx long"
    )


def cog_window_stats(cogs: DataFrame, wh: int = 24, ww: int = 24) -> DataFrame:
    """Windowed-decode each COG payload at its per-row (wy, wx) window
    and emit exact integer pixel stats — only blocks intersecting the
    window are decompressed (the cloud-optimized pattern), payloads
    never shuffle, output is metadata-scale."""
    schema = (
        "media_id long, n_px long, sum_px long, min_px long, max_px long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.geotiff import decode_geotiff

        for pdf in batches:
            out = []
            for mid, payload, wy, wx in zip(
                pdf["media_id"], pdf["payload"], pdf["wy"], pdf["wx"]
            ):
                px, _ = decode_geotiff(
                    bytes(payload), window=(int(wy), int(wx), wh, ww)
                )
                a = px.astype(np.int64)
                out.append(
                    (int(mid), int(a.size), int(a.sum()),
                     int(a.min()), int(a.max()))
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_px", "sum_px", "min_px", "max_px"],
            )

    return cogs.select("media_id", "payload", "wy", "wx").mapInPandas(
        run, schema
    )


def synthesize_webp(keys: DataFrame, key_col: str = "s_suppkey") -> DataFrame:
    """Real VP8L .webp files with key-derived pixels; key % 4 cycles
    the encoder path (plain LZ77 / color cache / subtract-green +
    predictor / palette) so every decoder tier sits in the gate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.webp import encode_webp

        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                h, w = 8 + k % 5, 8 + (k * 3) % 7
                y, x, c = np.ogrid[0:h, 0:w, 0:4]
                opt = k % 4
                if opt == 3:
                    m = (k + y + x) % (2 + k % 10)
                    arr = ((m * 37 + c * 11 + k) % 256).astype(np.uint8)
                else:
                    arr = ((k * 7 + y * 5 + x * 3 + c * 11) % 256).astype(
                        np.uint8
                    )
                kw = [
                    dict(use_lz77=True),
                    dict(use_lz77=True, cache_bits=4),
                    dict(subtract_green=True, predictor_mode=7),
                    dict(palette=True),
                ][opt]
                out.append((k, encode_webp(arr, **kw)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    n = keys.sparkSession.sparkContext.defaultParallelism
    return keys.select(key_col).repartition(n, F.col(key_col)).mapInPandas(
        run, "media_id long, payload binary"
    )


def synthesize_pdf(keys: DataFrame, key_col: str = "s_suppkey") -> DataFrame:
    """Real PDF files with key-derived text; key % 9 cycles the
    encoder path (plain / Flate / A85+Flate chain + hex strings / LZW
    + T* lines / RunLength + quote lines / xref stream + Tm lines /
    xref stream + object streams + ToUnicode CMap / WinAnsi +
    Differences remap / Type0 Identity-H CID with 2-byte codes) so
    every decoder tier sits in the gate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.pdf import encode_pdf

        variants = [
            dict(),
            dict(filters=("flate",)),
            dict(filters=("a85", "flate"), hex_strings=True),
            dict(filters=("lzw",), line_op="tstar"),
            dict(filters=("rl",), hex_strings=True, line_op="quote"),
            dict(xref_stream=True, filters=("flate",), line_op="tm"),
            dict(
                xref_stream=True,
                object_streams=True,
                filters=("flate",),
                encoding="tounicode",
            ),
            dict(encoding="differences", filters=("flate",)),
            dict(encoding="cid", filters=("flate",)),
        ]
        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                pages = []
                for i in range(1 + k % 3):
                    lines = []
                    for j in range(2 + (k + i) % 4):
                        ch = chr(97 + (k + i * 2 + j * 3) % 26)
                        lines.append(ch * (4 + (k * 3 + i * 5 + j * 7) % 17))
                    pages.append(lines)
                out.append((k, encode_pdf(pages, **variants[k % 9])))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    n = keys.sparkSession.sparkContext.defaultParallelism
    return keys.select(key_col).repartition(n, F.col(key_col)).mapInPandas(
        run, "media_id long, payload binary"
    )


def pdf_text_stats(media: DataFrame) -> DataFrame:
    """Extract text from .pdf payloads (sources/pdf.py) and emit the
    page count, character count, and the md5 of the full text (pages
    joined by form-feed) — one wrong byte anywhere in the xref walk,
    filter chain, content tokenizer, or encoding maps shifts the md5."""
    schema = "media_id long, n_pages int, n_chars long, text_md5 string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from flytemosaic_spark.sources.pdf import extract_pdf_text

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pages = extract_pdf_text(bytes(payload))
                full = "\f".join(pages)
                out.append(
                    (
                        int(mid),
                        len(pages),
                        sum(len(p) for p in pages),
                        hashlib.md5(full.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_pages", "n_chars", "text_md5"],
            )

    return media.select("media_id", "payload").mapInPandas(run, schema)


def webp_pixel_stats(media: DataFrame) -> DataFrame:
    """Decode .webp payloads through the image codec seam and emit
    exact integer pixel statistics (one wrong byte anywhere in the
    VP8L entropy/transform chain shifts sum_px)."""
    schema = (
        "media_id long, width int, height int, n_px long, sum_px long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                a = _decode_payload(bytes(payload))
                out.append(
                    (
                        int(mid), a.shape[1], a.shape[0], int(a.size),
                        int(a.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "n_px", "sum_px"],
            )

    return media.select("media_id", "payload").mapInPandas(run, schema)


def synthesize_avro(keys: DataFrame, key_col: str = "s_suppkey") -> DataFrame:
    """Real Avro OCF payloads with key-derived records; key % 3 cycles
    the block codec (null / deflate / snappy) and records exercise
    nested records, arrays, maps, enums, fixed, and nullable unions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.avro import encode_avro

        schema = {
            "type": "record", "name": "Doc",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "q", "type": "double"},
                {"name": "tags",
                 "type": {"type": "array", "items": "string"}},
                {"name": "attrs",
                 "type": {"type": "map", "values": "long"}},
                {"name": "kind",
                 "type": {"type": "enum", "name": "Kind",
                          "symbols": ["A", "B", "C"]}},
                {"name": "note", "type": ["null", "string"]},
            ],
        }
        codecs = ["null", "deflate", "snappy"]
        for pdf in batches:
            out = []
            for k in pdf[key_col]:
                k = int(k)
                recs = []
                for i in range(3 + k % 5):
                    recs.append(
                        {
                            "id": k * 100 + i,
                            # quarters are exact in binary doubles
                            "q": ((k * 7 + i * 3) % 100) / 4.0,
                            "tags": [f"t{j}" for j in range(i % 3)],
                            "attrs": {"a": k + i, "b": i},
                            "kind": "ABC"[(k + i) % 3],
                            "note": None if (k + i) % 2 else f"n{i}",
                        }
                    )
                out.append(
                    (k, encode_avro(recs, schema, codec=codecs[k % 3]))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    n = keys.sparkSession.sparkContext.defaultParallelism
    return keys.select(key_col).repartition(n, F.col(key_col)).mapInPandas(
        run, "media_id long, payload binary"
    )


def avro_scan_stats(media: DataFrame) -> DataFrame:
    """Decode .avro payloads (sources/avro.py) and emit exact record
    statistics — one wrong byte in the varint/union/codec chain
    shifts a sum."""
    schema = (
        "media_id long, n_recs long, sum_id long, sum_q4 long, "
        "n_tags long, n_notes long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flytemosaic_spark.sources.avro import decode_avro

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, recs = decode_avro(bytes(payload))
                out.append(
                    (
                        int(mid),
                        len(recs),
                        sum(r["id"] for r in recs),
                        int(sum(r["q"] * 4 for r in recs)),
                        sum(len(r["tags"]) for r in recs),
                        sum(1 for r in recs if r["note"] is not None),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_recs", "sum_id", "sum_q4",
                         "n_tags", "n_notes"],
            )

    return media.select("media_id", "payload").mapInPandas(run, schema)
