"""Minimal REAL baseline JPEG codec — pure stdlib (struct) + numpy.

The reference reads any GDAL-supported raster compression
(reference flytemosaic/datasets/utils.py:123-126), and JPEG is the
dominant visual-band COG compression. This container has no GDAL/PIL,
so this module implements ITU-T T.81 baseline sequential DCT, the
subset GDAL actually emits for JPEG-in-TIFF and standalone JFIF:

- decode: baseline (SOF0), 8-bit, 1 or 3 components, any sampling
  factors up to 2x2 (4:4:4, 4:2:2, 4:2:0), restart markers, and
  *abbreviated* streams whose DQT/DHT arrive separately (the TIFF
  ``JPEGTables`` tag) — anything else (progressive SOF2, 12-bit,
  arithmetic coding, 4 components) raises NotImplementedError naming
  the feature, the same honesty contract as ``geotiff.py``;
- encode: baseline JFIF, grayscale or YCbCr 4:4:4 / 4:2:0, the T.81
  Annex K quantization + Huffman tables with IJG quality scaling.

Entropy coding is per-symbol Python (bounded by block count), while
dequantization, the 2-D DCT/IDCT (separable 8x8 basis matmul), chroma
resampling and colorspace conversion are vectorized numpy over all
blocks at once — fast enough that a 256x256 tile decodes in
milliseconds, which is what the Spark-side mapInPandas batches see.

JPEG is lossy: the encoder is NOT a bit-oracle for the decoder (unlike
the deflate/LZW tiers); tests assert reconstruction error bounds and
exactness on DC-only (flat) images instead.
"""

from __future__ import annotations

import struct

import numpy as np

# T.81 Annex K.1 luminance / K.2 chrominance quantization tables
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag scan order: _ZIGZAG[i] = raster index of the i-th scanned coeff
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# T.81 Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# separable 8-point DCT-II basis: _DCT[k, n] = c_k/2 * cos((2n+1)k pi/16)
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(0.125) if _k == 0 else 0.5
        _DCT[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _build_huff_decoder(bits: list[int], huffval: list[int]) -> dict:
    """Canonical Huffman (T.81 C.2): {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huff_encoder(bits: list[int], huffval: list[int]) -> dict:
    """{symbol: (code, length)} for encoding."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00
    destuffing and RSTn skipping handled by the caller's segmenter."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc = (self.acc << 8) | 0  # pad past end (EOB runs)
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v

    def huff(self, table: dict) -> int:
        code, length = 0, 0
        for _ in range(16):
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _destuff(data: bytes) -> tuple[list[bytes], bool]:
    """Split entropy data on restart markers, removing FF00 stuffing.
    Returns (segments, saw_rst)."""
    segs, cur, i, n = [], bytearray(), 0, len(data)
    while i < n:
        b = data[i]
        if b == 0xFF and i + 1 < n:
            nxt = data[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # any other marker terminates the scan
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, len(segs) > 1


def _parse_tables(buf: bytes, off: int, end: int, state: dict) -> None:
    """Consume DQT/DHT/DRI segments into ``state`` (shared by the
    main stream and a TIFF JPEGTables prelude)."""
    while off + 4 <= end:
        if buf[off] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = buf[off + 1]
        if marker in (0xD8, 0xD9):  # SOI/EOI in a tables-only stream
            off += 2
            continue
        (seg_len,) = struct.unpack_from(">H", buf, off + 2)
        seg, seg_end = off + 4, off + 2 + seg_len
        if marker == 0xDB:  # DQT
            while seg < seg_end:
                pq, tq = buf[seg] >> 4, buf[seg] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                q = np.frombuffer(buf, np.uint8, 64, seg + 1).astype(np.int32)
                state["quant"][tq] = q
                seg += 65
        elif marker == 0xC4:  # DHT
            while seg < seg_end:
                tc, th = buf[seg] >> 4, buf[seg] & 0x0F
                bits = list(buf[seg + 1 : seg + 17])
                nv = sum(bits)
                vals = list(buf[seg + 17 : seg + 17 + nv])
                state["huff"][(tc, th)] = _build_huff_decoder(bits, vals)
                seg += 17 + nv
        elif marker == 0xDD:  # DRI
            (state["dri"],) = struct.unpack_from(">H", buf, seg)
        off = seg_end


def decode_jpeg(payload: bytes, tables: bytes | None = None) -> np.ndarray:
    """Decode a baseline JPEG to ``uint8 (H, W, components)``.
    ``tables`` is an optional abbreviated tables-only stream (the TIFF
    ``JPEGTables`` tag) consumed before the payload's own segments."""
    state: dict = {"quant": {}, "huff": {}, "dri": 0}
    if tables:
        _parse_tables(tables, 0, len(tables), state)
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")

    comps, h = None, None
    off = 2
    while off + 4 <= len(payload):
        if payload[off] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[off + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack_from(">H", payload, off + 2)
        seg, seg_end = off + 4, off + 2 + seg_len
        if marker in (0xDB, 0xC4, 0xDD):
            _parse_tables(payload, off, seg_end, state)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (only baseline SOF0 supported)"
            )
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w = struct.unpack_from(">BHH", payload, seg)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG samples")
            nc = payload[seg + 5]
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[seg + 6 + 3 * i : seg + 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker == 0xDA:  # SOS: entropy data follows
            ns = payload[seg]
            for i in range(ns):
                cid, tabs = payload[seg + 1 + 2 * i : seg + 3 + 2 * i]
                for c in comps:
                    if c["id"] == cid:
                        c["td"], c["ta"] = tabs >> 4, tabs & 0x0F
            data_off = seg_end
            return _decode_scan(payload[data_off:], comps, h, w, state)
        off = seg_end
    raise ValueError("JPEG stream has no SOS segment")


def _decode_scan(
    data: bytes, comps: list[dict], h: int, w: int, state: dict
) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks across (MCU-padded)
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)

    segs, _ = _destuff(data)
    dri = state["dri"]
    n_mcu = mcux * mcuy
    mcu = 0
    for seg in segs:
        rd = _BitReader(seg)
        pred = {c["id"]: 0 for c in comps}
        stop = min(n_mcu, mcu + dri) if dri else n_mcu
        while mcu < stop:
            my, mx = divmod(mcu, mcux)
            for c in comps:
                dc_tab = state["huff"].get((0, c["td"]))
                ac_tab = state["huff"].get((1, c["ta"]))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("JPEG scan references missing DHT")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int32)
                        t = rd.huff(dc_tab)
                        pred[c["id"]] += _extend(rd.bits(t), t)
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = rd.huff(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            blk[k] = _extend(rd.bits(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk
            mcu += 1
    if mcu < n_mcu:
        raise ValueError("JPEG stream truncated before last MCU")

    planes = []
    for c in comps:
        q = state["quant"].get(c["tq"])
        if q is None:
            raise ValueError("JPEG scan references missing DQT")
        deq = np.zeros((len(c["coef"]), 64), dtype=np.float64)
        deq[:, _ZIGZAG] = c["coef"] * q[np.newaxis, :].astype(np.float64)
        blocks = deq.reshape(-1, 8, 8)
        # 2-D IDCT over every block at once: M^T B M
        pix = np.einsum("kn,bkl,lm->bnm", _DCT, blocks, _DCT) + 128.0
        plane = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # nearest upsample to full resolution, then crop
        plane = plane.repeat(vmax // c["v"], 0).repeat(hmax // c["h"], 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = planes[0][:, :, np.newaxis]
    else:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        out = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_Q_LUMA * s + 50) // 100, 1, 255)
    qc = np.clip((_Q_CHROMA * s + 50) // 100, 1, 255)
    return ql.astype(np.int32), qc.astype(np.int32)


def _encode_blocks(
    plane: np.ndarray, q: np.ndarray
) -> np.ndarray:
    """FDCT + quantize + zigzag every 8x8 block of an MCU-padded
    plane -> (n_blocks, 64) int32 in raster block order."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ).astype(np.float64) - 128.0
    coefs = np.einsum("kn,bnm,lm->bkl", _DCT, blocks, _DCT)
    zz = coefs.reshape(-1, 64)[:, _ZIGZAG]
    qz = q[np.newaxis, _ZIGZAG].astype(np.float64)
    return np.round(zz / qz).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, magnitude-bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, v if v > 0 else v + (1 << t) - 1


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode ``uint8 (H, W)``, ``(H, W, 1)`` or ``(H, W, 3)`` as a
    baseline JFIF JPEG (grayscale, or YCbCr 4:4:4 / 4:2:0 when
    ``subsample``). ``restart_interval`` > 0 emits a DRI segment and
    RSTn markers every that many MCUs (what GDAL writes for large
    strips, and the decoder's resync path)."""
    if arr.ndim == 2:
        arr = arr[:, :, np.newaxis]
    if arr.dtype != np.uint8 or arr.shape[2] not in (1, 3):
        raise NotImplementedError(
            "JPEG encode: uint8 with 1 or 3 channels only"
        )
    h, w, nc = arr.shape
    ql, qc = _quality_tables(quality)
    if nc == 3:
        a = arr.astype(np.float64)
        y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        cb = -0.168736 * a[..., 0] - 0.331264 * a[..., 1] + 0.5 * a[..., 2] + 128
        cr = 0.5 * a[..., 0] - 0.418688 * a[..., 1] - 0.081312 * a[..., 2] + 128
        planes = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]
    else:
        planes = [arr[..., 0].astype(np.float64)]

    hs = 2 if (nc == 3 and subsample) else 1
    mcu_px = 8 * hs
    ph = (h + mcu_px - 1) // mcu_px * mcu_px
    pw = (w + mcu_px - 1) // mcu_px * mcu_px

    def pad(p):  # edge-replicate to the MCU grid
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    comp_planes = [pad(planes[0])]
    if nc == 3:
        for p in planes[1:]:
            p = pad(p)
            if subsample:
                p = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            comp_planes.append(p)

    qtabs = [ql] + ([qc] * (nc - 1) if nc == 3 else [])
    coef_sets = [
        _encode_blocks(p, qtabs[min(i, 1)])
        for i, p in enumerate(comp_planes)
    ]

    dc_enc = [_build_huff_encoder(*_HUFF_DC_LUMA)]
    ac_enc = [_build_huff_encoder(*_HUFF_AC_LUMA)]
    if nc == 3:
        dc_enc.append(_build_huff_encoder(*_HUFF_DC_CHROMA))
        ac_enc.append(_build_huff_encoder(*_HUFF_AC_CHROMA))

    bw_ = _BitWriter()
    samp = [(hs, hs)] + [(1, 1)] * (nc - 1)
    bws = [p.shape[1] // 8 for p in comp_planes]
    mcux = pw // mcu_px
    mcuy = ph // mcu_px
    pred = [0] * nc
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw_.flush()
            bw_.out += bytes(
                [0xFF, 0xD0 + (m // restart_interval - 1) % 8]
            )
            pred = [0] * nc
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            t_i = min(ci, 1)
            for by in range(sv):
                for bx in range(sh):
                    row = my * sv + by
                    col = mx * sh + bx
                    blk = coef_sets[ci][row * bws[ci] + col]
                    diff = int(blk[0]) - pred[ci]
                    pred[ci] = int(blk[0])
                    t, mag = _magnitude(diff)
                    code, ln = dc_enc[t_i][t]
                    bw_.write(code, ln)
                    if t:
                        bw_.write(mag, t)
                    run = 0
                    nz = np.nonzero(blk[1:])[0]
                    last = nz[-1] + 1 if len(nz) else 0
                    for k in range(1, last + 1):
                        v = int(blk[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_enc[t_i][0xF0]
                            bw_.write(code, ln)
                            run -= 16
                        t, mag = _magnitude(v)
                        code, ln = ac_enc[t_i][(run << 4) | t]
                        bw_.write(code, ln)
                        bw_.write(mag, t)
                        run = 0
                    if last < 63:
                        code, ln = ac_enc[t_i][0x00]  # EOB
                        bw_.write(code, ln)
    bw_.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\0" + bytes(
        [1, 1, 0, 0, 1, 0, 1, 0, 0]
    )
    for tq, q in enumerate(qtabs[:2] if nc == 3 else qtabs[:1]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(x) for x in q[_ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, min(ci, 1)])
    huffs = [(0, 0, _HUFF_DC_LUMA), (1, 0, _HUFF_AC_LUMA)]
    if nc == 3:
        huffs += [(0, 1, _HUFF_DC_CHROMA), (1, 1, _HUFF_AC_CHROMA)]
    for tc, th, (bits, vals) in huffs:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(vals), (tc << 4) | th
        )
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, (min(ci, 1) << 4) | min(ci, 1)])
    out += b"\0\x3f\0"
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
