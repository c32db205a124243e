"""Minimal REAL JPEG codec — pure stdlib (struct) + numpy.

The reference reads any GDAL-supported raster compression
(reference flytemosaic/datasets/utils.py:123-126); JPEG is the
dominant visual-band COG compression, and progressive JPEG dominates
web-scraped imagery (the multimodal training-data case). This
container has no GDAL/PIL, so this module implements ITU-T T.81:

- decode: baseline sequential (SOF0) AND progressive (SOF2 — DC
  first/refinement and AC band first/refinement scans with EOB runs,
  T.81 G.2), 8-bit AND 12-bit samples (12-bit: 16-bit DQT values,
  2048 level shift, uint16 output — the GDAL/medical convention),
  1 or 3 components, sampling factors up to 2x2
  (4:4:4, 4:2:2, 4:2:0), restart markers, non-interleaved scans over
  the component's own block grid, and *abbreviated* streams whose
  DQT/DHT arrive separately (the TIFF ``JPEGTables`` tag) — anything
  else (hierarchical/lossless SOFs, arithmetic coding, 4
  components) raises NotImplementedError naming the feature, the
  same honesty contract as ``geotiff.py``;
- encode: JFIF, grayscale or YCbCr 4:4:4 / 4:2:0, the T.81 Annex K
  quantization + Huffman tables with IJG quality scaling; baseline
  by default, ``progressive=True`` emits an SOF2 multi-scan stream
  (spectral selection + two-level successive approximation, the
  libjpeg-default script shape); uint16 input encodes 12-bit
  baseline (x16-scaled Annex K tables, flat extended Huffman tables
  covering DC categories to 15 / AC sizes to 15 — the 8-bit Annex K
  tables cannot express 12-bit magnitudes).

Entropy coding is per-symbol Python (bounded by block count), while
dequantization, the 2-D DCT/IDCT (separable 8x8 basis matmul), chroma
resampling and colorspace conversion are vectorized numpy over all
blocks at once — fast enough that a 256x256 tile decodes in
milliseconds, which is what the Spark-side mapInPandas batches see.

JPEG is lossy: the encoder is NOT a bit-oracle for the decoder the
way the deflate/LZW tiers are — but baseline and progressive encodes
quantize identically, so their DECODES must match bit-for-bit, which
is the test oracle for every progressive scan path.
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

# progressive AC table: the Annex K sequential tables lack the EOBn
# (n > 0) symbols progressive scans need, so the progressive encoder
# uses this generated table — every EOBn (n 0..14), ZRL, and (run,
# size 1..10) symbol at code length 9 (176 codes of 512; the all-ones
# codeword stays unused, as T.81 C.2 requires). Valid canonical
# Huffman, deliberately unoptimized: the decoder must take ANY table.
_HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    [n << 4 for n in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)],
)

# 12-bit sample streams need DC categories to 15 and AC sizes to 15
# (orthonormal-FDCT bound ||coef|| <= 16384 for 12-bit input) — beyond
# the Annex K 8-bit tables. Flat canonical tables, same discipline as
# _HUFF_AC_PROG: DC = 15 codes at length 4 + 1 at length 5; AC = 242
# codes at length 8 (Kraft 242/256; all-ones codeword unused).
_HUFF_DC_12 = (
    [0, 0, 0, 15, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(16)),
)
_HUFF_AC_12 = (
    [0, 0, 0, 0, 0, 0, 0, 242, 0, 0, 0, 0, 0, 0, 0, 0],
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 16)],
)

# separable 8-point DCT-II basis: _DCT[k, n] = c_k/2 * cos((2n+1)k pi/16)
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(0.125) if _k == 0 else 0.5
        _DCT[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _build_huff_decoder(bits: list[int], huffval: list[int]) -> tuple:
    """Canonical Huffman (T.81 C.2): ({(length, code): symbol}, lut).

    ``lut`` is a 256-entry first-8-bits fast table (r11): entry p
    holds (symbol, length) when a code of length <= 8 prefixes p, else
    None — one peek replaces up to 8 per-bit walk steps in
    :meth:`_BitReaderMSB.huff`; decode behavior is bit-identical
    because canonical codes are prefix-free."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    lut: list = [None] * 256
    for (length, code), sym in table.items():
        if length <= 8:
            base = code << (8 - length)
            for j in range(1 << (8 - length)):
                lut[base + j] = (sym, length)
    return table, lut


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

    def huff(self, table: tuple) -> int:
        m, lut = table
        if self.n < 16:
            self._fill()
        # fast path (r11): one 8-bit peek against the first-8-bits
        # LUT; the accumulator pads zeros past stream end exactly like
        # the per-bit walk did
        e = lut[(self.acc >> (self.n - 8)) & 0xFF]
        if e is not None:
            sym, ln = e
            self.n -= ln
            return sym
        # >8-bit codes: continue the canonical walk from 8 bits in
        # (the LUT proved no code of length <= 8 matches this prefix)
        code = (self.acc >> (self.n - 8)) & 0xFF
        self.n -= 8
        length = 8
        for _ in range(8):
            code = (code << 1) | self.bits(1)
            length += 1
            sym = m.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _destuff(data: bytes) -> tuple[list[bytes], int]:
    """Split one scan's entropy data on restart markers, removing FF00
    stuffing. Returns (segments, bytes_consumed) — consumption stops
    at the first non-RST marker so the caller can keep parsing the
    following segments (progressive streams have many scans)."""
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
    return segs, i


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
                if pq == 0:
                    q = np.frombuffer(buf, np.uint8, 64, seg + 1).astype(
                        np.int32
                    )
                    seg += 65
                else:  # 16-bit precision (12-bit sample streams)
                    q = np.frombuffer(buf, ">u2", 64, seg + 1).astype(
                        np.int32
                    )
                    seg += 129
                state["quant"][tq] = q
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
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG to
    ``uint8 (H, W, components)``. ``tables`` is an optional
    abbreviated tables-only stream (the TIFF ``JPEGTables`` tag)
    consumed before the payload's own segments."""
    state: dict = {"quant": {}, "huff": {}, "dri": 0}
    if tables:
        _parse_tables(tables, 0, len(tables), state)
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")

    comps, h, w, progressive = None, None, None, False
    saw_scan = False
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
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} "
                "(baseline SOF0 and progressive SOF2 supported)"
            )
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w = struct.unpack_from(">BHH", payload, seg)
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit JPEG samples")
            state["prec"] = prec
            nc = payload[seg + 5]
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[seg + 6 + 3 * i : seg + 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            _alloc_coef(comps, w, h)
        elif marker == 0xDA:  # SOS: one scan's entropy data follows
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = payload[seg]
            scan_comps = []
            for i in range(ns):
                cid, tabs = payload[seg + 1 + 2 * i : seg + 3 + 2 * i]
                for c in comps:
                    if c["id"] == cid:
                        c["td"], c["ta"] = tabs >> 4, tabs & 0x0F
                        scan_comps.append(c)
            p = seg + 1 + 2 * ns
            ss, se, ahal = payload[p], payload[p + 1], payload[p + 2]
            ah, al = ahal >> 4, ahal & 0x0F
            segs, used = _destuff(payload[seg_end:])
            if progressive:
                _scan_progressive(
                    segs, scan_comps, comps, state, ss, se, ah, al
                )
            else:
                _scan_baseline(segs, scan_comps, comps, state)
            saw_scan = True
            off = seg_end + used
            continue
        off = seg_end
    if comps is None or not saw_scan:
        raise ValueError("JPEG stream has no SOS segment")
    return _reconstruct(comps, w, h, state)


def _alloc_coef(comps: list[dict], w: int, h: int) -> None:
    """Per-component coefficient arrays: MCU-padded grid (interleaved
    scan order) plus the component's own non-interleaved grid dims."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks across (MCU-padded)
        c["bh"] = mcuy * c["v"]
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        c["nbw"] = (cw + 7) // 8  # non-interleaved (true) grid
        c["nbh"] = (ch + 7) // 8
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
    comps[0]["_mcux"], comps[0]["_mcuy"] = mcux, mcuy


def _scan_units(scan_comps, comps):
    """(unit block refs) in scan order: interleaved scans walk MCUs,
    single-component scans walk the component's true grid in raster
    order. Yields (comp, block_index) per data unit group boundary —
    for interleaved, one MCU is several units."""
    mcux, mcuy = comps[0]["_mcux"], comps[0]["_mcuy"]
    if len(scan_comps) > 1:
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            group = []
            for c in scan_comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        group.append(
                            (c, (my * c["v"] + by) * c["bw"]
                             + mx * c["h"] + bx)
                        )
            yield group
    else:
        c = scan_comps[0]
        for by in range(c["nbh"]):
            for bx in range(c["nbw"]):
                yield [(c, by * c["bw"] + bx)]


def _scan_baseline(segs, scan_comps, comps, state) -> None:
    units = list(_scan_units(scan_comps, comps))
    dri = state["dri"]
    pos = 0
    for seg in segs:
        rd = _BitReader(seg)
        pred = {c["id"]: 0 for c in scan_comps}
        stop = min(len(units), pos + dri) if dri else len(units)
        while pos < stop:
            for c, bi in units[pos]:
                dc_tab = state["huff"].get((0, c["td"]))
                ac_tab = state["huff"].get((1, c["ta"]))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("JPEG scan references missing DHT")
                blk = c["coef"][bi]
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
            pos += 1
    if pos < len(units):
        raise ValueError("JPEG stream truncated before last MCU")


def _scan_progressive(
    segs, scan_comps, comps, state, ss, se, ah, al
) -> None:
    """One progressive scan (T.81 G.2): DC first/refine (interleaved
    allowed), AC first/refine (single component, with EOB runs)."""
    units = list(_scan_units(scan_comps, comps))
    dri = state["dri"]
    pos = 0
    if ss == 0:  # DC scan (se must be 0)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        for seg in segs:
            rd = _BitReader(seg)
            pred = {c["id"]: 0 for c in scan_comps}
            stop = min(len(units), pos + dri) if dri else len(units)
            while pos < stop:
                for c, bi in units[pos]:
                    blk = c["coef"][bi]
                    if ah == 0:  # first DC scan
                        dc_tab = state["huff"].get((0, c["td"]))
                        if dc_tab is None:
                            raise ValueError("missing DHT in DC scan")
                        t = rd.huff(dc_tab)
                        pred[c["id"]] += _extend(rd.bits(t), t)
                        blk[0] = pred[c["id"]] << al
                    else:  # DC refinement: one raw bit
                        if rd.bits(1):
                            blk[0] |= 1 << al
                pos += 1
        return
    # AC scans: single component only, per spec
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan with several components")
    c = scan_comps[0]
    ac_tab = state["huff"].get((1, c["ta"]))
    if ac_tab is None:
        raise ValueError("missing DHT in AC scan")
    for seg in segs:
        rd = _BitReader(seg)
        eobrun = 0
        stop = min(len(units), pos + dri) if dri else len(units)
        while pos < stop:
            (_, bi) = units[pos][0]
            blk = c["coef"][bi]
            if ah == 0:
                eobrun = _ac_first(rd, ac_tab, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(rd, ac_tab, blk, ss, se, al, eobrun)
            pos += 1
    if pos < len(units):
        raise ValueError("JPEG stream truncated before last block")


def _ac_first(rd, ac_tab, blk, ss, se, al, eobrun) -> int:
    """First AC scan for one block (T.81 G.2.2): magnitudes shifted
    left by the successive-approximation low bit. Coefficients are
    stored zigzag-ordered, matching the baseline path."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.huff(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            return (1 << r) + rd.bits(r) - 1
        k += r
        if k > se:
            raise ValueError("JPEG AC run overflow")
        blk[k] = _extend(rd.bits(s), s) << al
        k += 1
    return 0


def _ac_refine(rd, ac_tab, blk, ss, se, al, eobrun) -> int:
    """AC refinement scan for one block (T.81 G.2.3 / libjpeg
    decode_mcu_AC_refine): correction bits for already-significant
    coefficients, run/1 symbols for newly-significant ones."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.huff(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + rd.bits(r)
                    break
                # r == 15: pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad size in AC refinement scan")
                val = p1 if rd.bits(1) else m1
            while k <= se:
                if blk[k] != 0:
                    if rd.bits(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        if val:
                            blk[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0 and rd.bits(1) and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(comps, w, h, state) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    prec = state.get("prec", 8)
    mid, top = float(1 << (prec - 1)), float((1 << prec) - 1)
    planes = []
    for c in comps:
        q = state["quant"].get(c["tq"])
        if q is None:
            raise ValueError("JPEG scan references missing DQT")
        deq = np.zeros((len(c["coef"]), 64), dtype=np.float64)
        deq[:, _ZIGZAG] = c["coef"] * q[np.newaxis, :].astype(np.float64)
        blocks = deq.reshape(-1, 8, 8)
        # 2-D IDCT over every block at once: M^T B M
        pix = np.einsum("kn,bkl,lm->bnm", _DCT, blocks, _DCT) + mid
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
        y, cb, cr = planes[0], planes[1] - mid, planes[2] - mid
        out = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
    return np.clip(np.round(out), 0, top).astype(
        np.uint8 if prec == 8 else np.uint16
    )


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


def _quality_tables(
    quality: int, prec: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (x16 for 12-bit
    samples, libjpeg's convention)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    mul, top = (16, 65535) if prec == 12 else (1, 255)
    ql = np.clip((_Q_LUMA * s + 50) // 100 * mul, 1, top)
    qc = np.clip((_Q_CHROMA * s + 50) // 100 * mul, 1, top)
    return ql.astype(np.int32), qc.astype(np.int32)


def _encode_blocks(
    plane: np.ndarray, q: np.ndarray, mid: float = 128.0
) -> np.ndarray:
    """FDCT + quantize + zigzag every 8x8 block of an MCU-padded
    plane -> (n_blocks, 64) int32 in raster block order."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ).astype(np.float64) - mid
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
    progressive: bool = False,
) -> bytes:
    """Encode ``uint8 (H, W)``, ``(H, W, 1)`` or ``(H, W, 3)`` as a
    baseline JFIF JPEG (grayscale, or YCbCr 4:4:4 / 4:2:0 when
    ``subsample``). ``restart_interval`` > 0 emits a DRI segment and
    RSTn markers every that many MCUs (what GDAL writes for large
    strips, and the decoder's resync path). ``progressive`` emits an
    SOF2 multi-scan stream (spectral selection + two-level successive
    approximation); both forms quantize identically, so baseline and
    progressive encodes of the same input DECODE bit-identically —
    the test oracle for the progressive paths."""
    if arr.ndim == 2:
        arr = arr[:, :, np.newaxis]
    if arr.dtype == np.uint8:
        prec = 8
    elif arr.dtype == np.uint16:
        prec = 12  # the GDAL/medical 12-bit-in-JPEG case
        if arr.max() > 4095:
            raise ValueError("12-bit JPEG samples must be < 4096")
        if progressive:
            raise NotImplementedError("progressive 12-bit JPEG encode")
    else:
        raise NotImplementedError(
            "JPEG encode: uint8 (8-bit) or uint16 (12-bit) with 1 or 3 "
            "channels only"
        )
    if arr.shape[2] not in (1, 3):
        raise NotImplementedError(
            "JPEG encode: uint8 (8-bit) or uint16 (12-bit) with 1 or 3 "
            "channels only"
        )
    h, w, nc = arr.shape
    mid, top = float(1 << (prec - 1)), float((1 << prec) - 1)
    ql, qc = _quality_tables(quality, prec)
    if nc == 3:
        a = arr.astype(np.float64)
        y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        cb = (-0.168736 * a[..., 0] - 0.331264 * a[..., 1]
              + 0.5 * a[..., 2] + mid)
        cr = (0.5 * a[..., 0] - 0.418688 * a[..., 1]
              - 0.081312 * a[..., 2] + mid)
        planes = [y, np.clip(cb, 0, top), np.clip(cr, 0, top)]
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
        _encode_blocks(p, qtabs[min(i, 1)], mid)
        for i, p in enumerate(comp_planes)
    ]

    # 12-bit magnitudes exceed the Annex K 8-bit tables' categories —
    # use the flat extended tables (any valid DHT is legal; we emit it)
    dc_tab = _HUFF_DC_12 if prec == 12 else _HUFF_DC_LUMA
    ac_tab = _HUFF_AC_12 if prec == 12 else _HUFF_AC_LUMA
    dc_enc = [_build_huff_encoder(*dc_tab)]
    ac_enc = [_build_huff_encoder(*ac_tab)]
    if nc == 3:
        dc_enc.append(
            _build_huff_encoder(
                *(_HUFF_DC_12 if prec == 12 else _HUFF_DC_CHROMA)
            )
        )
        ac_enc.append(
            _build_huff_encoder(
                *(_HUFF_AC_12 if prec == 12 else _HUFF_AC_CHROMA)
            )
        )

    samp = [(hs, hs)] + [(1, 1)] * (nc - 1)
    bws = [p.shape[1] // 8 for p in comp_planes]
    mcux = pw // mcu_px
    mcuy = ph // mcu_px

    def sos_header(comp_tabs: list[tuple[int, int, int]], ss, se, ahal):
        """comp_tabs: (component index, td, ta) per scan component."""
        hdr = b"\xff\xda" + struct.pack(
            ">HB", 6 + 2 * len(comp_tabs), len(comp_tabs)
        )
        for ci, td, ta in comp_tabs:
            hdr += bytes([ci + 1, (td << 4) | ta])
        return hdr + bytes([ss, se, ahal])

    scans: list[bytes] = []
    if not progressive:
        bw_ = _BitWriter()
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
        scans.append(
            sos_header([(ci, min(ci, 1), min(ci, 1)) for ci in range(nc)],
                       0, 63, 0)
            + bytes(bw_.out)
        )
    else:
        if restart_interval:
            raise NotImplementedError(
                "restart markers with progressive encode"
            )
        scans += _progressive_scans(
            coef_sets, samp, bws, mcux, mcuy, w, h, hs,
            dc_enc, ac_enc, sos_header,
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\0" + bytes(
        [1, 1, 0, 0, 1, 0, 1, 0, 0]
    )
    for tq, q in enumerate(qtabs[:2] if nc == 3 else qtabs[:1]):
        if prec == 12 and int(q.max()) > 255:
            out += b"\xff\xdb" + struct.pack(">HB", 131, (1 << 4) | tq)
            out += b"".join(
                struct.pack(">H", int(x)) for x in q[_ZIGZAG]
            )
        else:
            out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
            out += bytes(int(x) for x in q[_ZIGZAG])
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">HBHHB", 8 + 3 * nc, prec, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, min(ci, 1)])
    if prec == 12:
        huffs = [(0, 0, _HUFF_DC_12), (1, 0, _HUFF_AC_12)]
        if nc == 3:
            huffs += [(0, 1, _HUFF_DC_12), (1, 1, _HUFF_AC_12)]
    else:
        huffs = [(0, 0, _HUFF_DC_LUMA), (1, 0, _HUFF_AC_LUMA)]
        if nc == 3:
            huffs += [(0, 1, _HUFF_DC_CHROMA), (1, 1, _HUFF_AC_CHROMA)]
    if progressive:
        huffs.append((1, 2, _HUFF_AC_PROG))
    for tc, th, (bits, vals) in huffs:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(vals), (tc << 4) | th
        )
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for s in scans:
        out += s
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _progressive_scans(
    coef_sets, samp, bws, mcux, mcuy, w, h, hmax,
    dc_enc, ac_enc, sos_header,
) -> list[bytes]:
    """Spectral-selection + two-level successive-approximation scan
    script (T.81 Annex G encoding procedures, the shape libjpeg's
    default progressive script uses): interleaved DC first (Al=1) and
    DC refinement, then per component AC first (band 1..63 at Al=1)
    and AC refinement (Al=0)."""
    nc = len(coef_sets)
    al = 1
    scans = []

    # --- DC first scan (interleaved, point transform Al) ---
    bw_ = _BitWriter()
    pred = [0] * nc
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            t_i = min(ci, 1)
            for by in range(sv):
                for bx in range(sh):
                    blk = coef_sets[ci][
                        (my * sv + by) * bws[ci] + mx * sh + bx
                    ]
                    v = int(blk[0]) >> al  # DC: arithmetic shift
                    diff = v - pred[ci]
                    pred[ci] = v
                    t, mag = _magnitude(diff)
                    code, ln = dc_enc[t_i][t]
                    bw_.write(code, ln)
                    if t:
                        bw_.write(mag, t)
    bw_.flush()
    scans.append(
        sos_header([(ci, min(ci, 1), 0) for ci in range(nc)], 0, 0, al)
        + bytes(bw_.out)
    )

    # --- DC refinement scan (raw bits) ---
    bw_ = _BitWriter()
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    blk = coef_sets[ci][
                        (my * sv + by) * bws[ci] + mx * sh + bx
                    ]
                    bw_.write(int(blk[0]) & 1, 1)
    bw_.flush()
    scans.append(
        sos_header([(ci, min(ci, 1), 0) for ci in range(nc)],
                   0, 0, (1 << 4) | 0)
        + bytes(bw_.out)
    )

    # --- per-component AC scans over the TRUE (non-interleaved) grid ---
    for ci in range(nc):
        sh, sv = samp[ci]
        cw = (w * sh + hmax - 1) // hmax
        ch = (h * sv + hmax - 1) // hmax
        nbw, nbh = (cw + 7) // 8, (ch + 7) // 8
        blocks = [
            coef_sets[ci][by * bws[ci] + bx]
            for by in range(nbh)
            for bx in range(nbw)
        ]
        prog_tab = _build_huff_encoder(*_HUFF_AC_PROG)
        scans.append(
            sos_header([(ci, 0, 2)], 1, 63, al)
            + _ac_first_scan(blocks, prog_tab, 1, 63, al)
        )
        scans.append(
            sos_header([(ci, 0, 2)], 1, 63, (al << 4) | 0)
            + _ac_refine_scan(blocks, prog_tab, 1, 63, 0)
        )
    return scans


def _ac_first_scan(blocks, ac_tab, ss, se, al) -> bytes:
    """Entropy data for one first-pass AC band scan (T.81 G.1.2.2):
    point-transformed magnitudes with EOB-run accumulation."""
    bw_ = _BitWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun == 0:
            return
        n = eobrun.bit_length() - 1
        code, ln = ac_tab[n << 4]
        bw_.write(code, ln)
        if n:
            bw_.write(eobrun - (1 << n), n)
        eobrun = 0

    for blk in blocks:
        # AC point transform: divide toward zero by 2^Al
        band = [
            (int(v) >> al) if v >= 0 else -((-int(v)) >> al)
            for v in blk[ss : se + 1]
        ]
        nz = [i for i, v in enumerate(band) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for i in range(nz[-1] + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]
                bw_.write(code, ln)
                run -= 16
            t, mag = _magnitude(v)
            code, ln = ac_tab[(run << 4) | t]
            bw_.write(code, ln)
            bw_.write(mag, t)
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1
    flush_eob()
    bw_.flush()
    return bytes(bw_.out)


def _ac_refine_scan(blocks, ac_tab, ss, se, al) -> bytes:
    """Entropy data for one AC refinement scan (T.81 G.1.2.3, the
    libjpeg encode_mcu_AC_refine control flow): run/1 symbols for
    newly-significant coefficients, buffered correction bits for
    already-significant ones. Two bit buffers, as in libjpeg: ``be``
    bits travel with the pending EOB run (emitted right after its
    EOBn symbol), ``br`` bits belong to the current block (emitted
    right after the next ZRL / run-1 symbol); a block that ends in an
    EOB rolls its br bits into be."""
    bw_ = _BitWriter()
    eobrun = 0
    be: list[int] = []  # correction bits attached to the EOB run
    br: list[int] = []  # correction bits since last symbol, this block

    def emit_eobrun():
        nonlocal eobrun
        if eobrun > 0:
            n = eobrun.bit_length() - 1
            code, ln = ac_tab[n << 4]
            bw_.write(code, ln)
            if n:
                bw_.write(eobrun - (1 << n), n)
            eobrun = 0
            for b in be:
                bw_.write(b, 1)
            be.clear()

    def emit_br():
        for b in br:
            bw_.write(b, 1)
        br.clear()

    for blk in blocks:
        absv = [abs(int(v)) >> al for v in blk[ss : se + 1]]
        eob = 0  # index past the LAST newly-significant coefficient
        for i, t in enumerate(absv):
            if t == 1:
                eob = i + 1
        r = 0
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i < eob:
                emit_eobrun()
                code, ln = ac_tab[0xF0]
                bw_.write(code, ln)
                r -= 16
                emit_br()
            if t > 1:
                br.append(t & 1)
                continue
            emit_eobrun()
            code, ln = ac_tab[(r << 4) | 1]
            bw_.write(code, ln)
            bw_.write(0 if blk[ss + i] < 0 else 1, 1)
            emit_br()
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            br.clear()
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()
    bw_.flush()
    return bytes(bw_.out)
