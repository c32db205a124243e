"""Minimal REAL GIF codec — pure stdlib + numpy (GIF87a/89a).

GIF is everywhere in web-scraped multimodal corpora (the curation
pipelines the multimodal tier serves meet it constantly), and this
container has no PIL — so the decoder is real: logical screen
descriptor, global/local color tables, graphic-control extensions
(delay, disposal, transparency), INTERLACED images (the 4-pass row
order), the GIF flavor of LZW (LSB-first variable 3..12-bit codes,
clear/end codes, table growth to 4096 with mid-stream resets), and
ANIMATION compositing honoring disposal methods 1 (leave), 2
(restore background) and 3 (restore previous) — frame extraction for
the video-adjacent "frame sample" pattern.

The encoder writes single- or multi-frame GIF89a from uint8 RGB(A)
arrays with at most 256 distinct colors per frame (an exact palette
is built; MORE colors raise — color quantization is a modeling
choice, not a container feature, and staying exact keeps
``decode(encode(x)) == x`` a true oracle for the whole
LZW/palette/interlace path).

Note the LZW here differs from TIFF's (sources/geotiff.py): GIF packs
codes LSB-first and grows the table one code LATER (no "early
change"); the two implementations are deliberately separate.
"""

from __future__ import annotations

import struct

import numpy as np

_HDRS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# GIF-flavor LZW
# ---------------------------------------------------------------------------


def _lzw_decode_gif(data: bytes, min_code_size: int) -> bytearray:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    acc = n = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << n
        n += 8
        while n >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            n -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def _lzw_encode_gif(pixels: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = n = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, n
        acc |= code << n
        n += size
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for px in pixels:
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        # decoder grows its read size when ITS table reaches the
        # boundary — which happens one code after ours is assigned
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code == 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([px])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

# interlace passes: (first row, row step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        size = buf[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        out += buf[pos : pos + size]
        pos += size


def decode_gif(payload: bytes) -> tuple[np.ndarray, dict]:
    """Decode all frames -> ``(frames[n, H, W, 4] uint8 RGBA, meta)``.
    ``meta`` = {"width", "height", "n_frames", "delays_cs" (per-frame
    hundredths of a second), "loop" (iterations, 0 = forever, None if
    no NETSCAPE block)}. Frames are fully composited onto the logical
    screen honoring transparency and disposal methods."""
    if payload[:6] not in _HDRS:
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    screen = np.zeros((h, w, 4), dtype=np.uint8)  # transparent black
    frames: list[np.ndarray] = []
    delays: list[int] = []
    loop = None
    transparent: int | None = None
    delay_cs = 0
    disposal = 0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                (delay_cs,) = struct.unpack_from("<H", data, 1)
                transparent = data[3] if flags & 0x01 else None
            elif label == 0xFF and data[:11] == b"NETSCAPE2.0":
                if len(data) >= 14 and data[11] == 1:
                    (loop,) = struct.unpack_from("<H", data, 12)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(
                n, 3
            )
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image has no color table")
        mcs = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = np.frombuffer(
            bytes(_lzw_decode_gif(data, mcs))[: iw * ih], np.uint8
        )
        if idx.size != iw * ih:
            raise ValueError("GIF frame has too few pixels")
        if ipacked & 0x40:  # interlaced: reorder rows
            rows = np.empty(ih, dtype=np.int64)
            r = 0
            for first, step in _INTERLACE:
                for y in range(first, ih, step):
                    rows[y] = r
                    r += 1
            idx = idx.reshape(ih, iw)[rows].reshape(-1)
        idx = idx.reshape(ih, iw)

        prev_region = screen[top : top + ih, left : left + iw].copy()
        rgba = np.empty((ih, iw, 4), dtype=np.uint8)
        rgba[:, :, :3] = table[np.minimum(idx, len(table) - 1)]
        rgba[:, :, 3] = 255
        if transparent is not None:
            mask = idx == transparent
            # transparent pixels leave the screen unchanged
            rgba[mask] = screen[top : top + ih, left : left + iw][mask]
        screen[top : top + ih, left : left + iw] = rgba
        frames.append(screen.copy())
        delays.append(delay_cs)
        if disposal == 2:  # restore to background (transparent)
            screen[top : top + ih, left : left + iw] = 0
        elif disposal == 3:  # restore to previous
            screen[top : top + ih, left : left + iw] = prev_region
        transparent = None
        delay_cs = 0
        disposal = 0

    if not frames:
        raise ValueError("GIF has no image data")
    meta = {
        "width": int(w),
        "height": int(h),
        "n_frames": len(frames),
        "delays_cs": delays,
        "loop": loop,
    }
    return np.stack(frames), meta


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    delay_cs: int = 10,
    loop: int = 0,
    interlace: bool = False,
) -> bytes:
    """Encode uint8 RGB frames ((H, W, 3) or a list / (n, H, W, 3))
    as GIF89a with an exact palette (raises past 256 distinct colors
    — quantize upstream). Multi-frame input emits an animation with
    a NETSCAPE loop block and per-frame graphic control."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f) for f in frames]
    if not frames or any(
        f.ndim != 3 or f.shape[2] != 3 or f.dtype != np.uint8
        for f in frames
    ):
        raise ValueError("encode_gif wants uint8 (H, W, 3) frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one size")

    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise NotImplementedError(
            f"{len(colors)} distinct colors: GIF needs a palette of "
            "<= 256 (quantize upstream; exact palettes keep the codec "
            "its own oracle)"
        )
    # palette size: power of two >= n, minimum 2
    bits = max(1, int(len(colors) - 1).bit_length())
    n_pal = 1 << bits
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1),
                       0, 0)
    out += pal.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop) + b"\x00"
    mcs = max(2, bits)
    for f in frames:
        if len(frames) > 1:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs)
            out += b"\x00\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        flat = f.reshape(-1, 3)
        idx = np.fromiter(
            (lut[tuple(px)] for px in flat), dtype=np.uint8, count=len(flat)
        ).reshape(h, w)
        if interlace:
            order = [
                y for first, step in _INTERLACE for y in range(first, h, step)
            ]
            idx = idx[order]
        out.append(mcs)
        comp = _lzw_encode_gif(idx.reshape(-1).tobytes(), mcs)
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
