"""Pure-Python Zstandard (RFC 8878) frame DECODER + store-mode encoder.

Modern GDAL writes COGs with ``COMPRESS=ZSTD`` by default, and the
reference opens any GDAL-supported scene file (reference
flytemosaic/datasets/utils.py:123-126) — so a user pointing this
engine at current-generation COGs hits zstd before any other codec
gap. This module closes it in the repo's proven stdlib+numpy codec
style (same honesty contract as ``sources/flac.py`` /
``sources/jpeg.py``): a complete single-threaded RFC 8878 decoder —
frame headers, raw/RLE/compressed blocks, FSE table descriptions,
Huffman-coded literals (direct and FSE-compressed weights, 1- and
4-stream), all four sequence-table modes (predefined / RLE /
FSE-compressed / repeat), repeat-offset history, treeless-literals
table reuse, multi-frame and skippable-frame input, and xxhash64
content-checksum verification.

``encode_zstd`` prefers the real libzstd bundled with pyarrow (so
tests exercise the decoder against genuinely compressed streams —
Huffman + FSE paths included); when pyarrow is absent it falls back
to :func:`compress_zstd`, this module's own REAL encoder — LZ
matches + predefined-FSE sequence coding with raw literals, whose
frames libzstd itself decodes in tests — with
:func:`encode_zstd_store` (raw-block framing) as the zero-CPU
floor.

Out of scope (raise ``NotImplementedError`` naming the feature):
dictionary-compressed frames (``Dictionary_ID`` != 0) — the TIFF tile
path never uses them.
"""

import struct

_MAGIC = 0xFD2FB528
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F

# --------------------------------------------------------------------------
# bitstreams
# --------------------------------------------------------------------------


class _BackBits:
    """zstd backward bitstream: bits are written little-endian and read
    from the END of the buffer toward the start, below a 1-bit sentinel
    in the last byte. Reads past the start pad ZEROS into the low bits
    and set ``over`` (the FSE interleave termination signal)."""

    __slots__ = ("buf", "pos", "over")

    def __init__(self, buf: bytes):
        if not buf or buf[-1] == 0:
            raise ValueError("corrupt bitstream: missing sentinel bit")
        self.buf = buf
        # usable bits = everything below the highest set bit of the
        # final byte
        self.pos = (len(buf) - 1) * 8 + buf[-1].bit_length() - 1
        self.over = False

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos - n
        if p >= 0:
            self.pos = p
            lo = p >> 3
            return (
                int.from_bytes(self.buf[lo : (p + n + 7) >> 3], "little")
                >> (p & 7)
            ) & ((1 << n) - 1)
        # overdraw: take what's left, zero-pad the low side
        self.over = True
        avail = self.pos
        self.pos = 0
        if avail <= 0:
            return 0
        v = int.from_bytes(self.buf[0 : (avail + 7) >> 3], "little") & (
            (1 << avail) - 1
        )
        return v << (n - avail)

    def peek(self, n: int) -> int:
        p = self.pos - n
        if p >= 0:
            lo = p >> 3
            return (
                int.from_bytes(self.buf[lo : (p + n + 7) >> 3], "little")
                >> (p & 7)
            ) & ((1 << n) - 1)
        avail = self.pos
        if avail <= 0:
            return 0
        v = int.from_bytes(self.buf[0 : (avail + 7) >> 3], "little") & (
            (1 << avail) - 1
        )
        return v << (n - avail)

    def skip(self, n: int) -> None:
        self.pos -= n
        if self.pos < 0:
            self.pos = 0
            self.over = True


class _FwdBits:
    """Forward little-endian bitstream (FSE table descriptions)."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        if n == 0:
            return 0
        lo = p >> 3
        return (
            int.from_bytes(self.buf[lo : (p + n + 7) >> 3], "little")
            >> (p & 7)
        ) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        p = self.pos
        if n == 0:
            return 0
        lo = p >> 3
        return (
            int.from_bytes(self.buf[lo : (p + n + 7) >> 3], "little")
            >> (p & 7)
        ) & ((1 << n) - 1)


# --------------------------------------------------------------------------
# FSE
# --------------------------------------------------------------------------


def _fse_read_ncount(buf: bytes, off: int, max_symbol: int):
    """Parse an FSE table description (RFC 8878 §4.1.1) starting at
    byte ``off``. Returns (accuracy_log, probs, bytes_consumed)."""
    bits = _FwdBits(buf, off * 8)
    accuracy_log = bits.read(4) + 5
    if accuracy_log > 9:
        raise ValueError(f"FSE accuracy log {accuracy_log} > 9")
    remaining = (1 << accuracy_log) + 1
    threshold = 1 << accuracy_log
    nb = accuracy_log + 1
    probs: list[int] = []
    while remaining > 1:
        if len(probs) > max_symbol:
            raise ValueError("FSE table: too many symbols")
        # small-value encoding: values whose low (nb-1) bits fall below
        # ``max`` use one bit fewer
        max_small = 2 * threshold - 1 - remaining
        val = bits.peek(nb)
        if (val & (threshold - 1)) < max_small:
            count = val & (threshold - 1)
            bits.pos += nb - 1
        else:
            count = val & (2 * threshold - 1)
            if count >= threshold:
                count -= max_small
            bits.pos += nb
        prob = count - 1  # -1 encodes the "less than 1" probability
        remaining -= -prob if prob < 0 else prob
        probs.append(prob)
        if prob == 0:
            # run-length coding of zero-probability symbols
            while True:
                rep = bits.read(2)
                probs.extend([0] * rep)
                if rep < 3:
                    break
        while remaining < threshold:
            nb -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("corrupt FSE table description")
    return accuracy_log, probs, (bits.pos + 7) // 8 - off


def _fse_build_dtable(probs: list[int], accuracy_log: int):
    """RFC 8878 §4.1.1 decode-table build. Returns (symbols, new_base,
    nb_bits): decode = emit symbols[s]; s' = new_base[s] + read(nb[s])."""
    size = 1 << accuracy_log
    symbols = [0] * size
    # "less than 1" symbols take one cell each at the table's high end
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("corrupt FSE distribution")
    next_state = [p if p > 0 else 1 for p in probs]
    new_base = [0] * size
    nb_bits = [0] * size
    for u in range(size):
        s = symbols[u]
        x = next_state[s]
        next_state[s] = x + 1
        n = accuracy_log - (x.bit_length() - 1)
        nb_bits[u] = n
        new_base[u] = (x << n) - size
    return symbols, new_base, nb_bits


def _fse_rle_table(symbol: int):
    """A 1-cell, 0-bit table: the RLE sequence-table mode."""
    return [symbol], [0], [0], 0  # symbols, new_base, nb_bits, accuracy


# predefined sequence distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
     2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
     -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
     -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1],
    5,
)

# literal-length / match-length code -> (baseline, extra_bits)
_LL_CODE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10),
    (2048, 11), (4096, 12), (8192, 13), (16384, 14), (32768, 15),
    (65536, 16),
]
_ML_CODE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]


# --------------------------------------------------------------------------
# Huffman literals
# --------------------------------------------------------------------------


def _huf_read_table(buf: bytes, off: int):
    """Huffman tree description (RFC 8878 §4.2.1). Returns
    ((syms, nbs, table_log), bytes_consumed)."""
    header = buf[off]
    weights: list[int] = []
    if header >= 128:
        n = header - 127  # direct 4-bit weights
        for i in range(n):
            b = buf[off + 1 + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 15))
        consumed = 1 + ((n + 1) >> 1)
    else:
        # FSE-compressed weights: table description + 2-state
        # interleaved backward bitstream, accuracy <= 6
        seg = buf[off + 1 : off + 1 + header]
        al, probs, used = _fse_read_ncount(seg, 0, 255)
        if al > 6:
            raise ValueError("Huffman-weight FSE accuracy > 6")
        syms, base, nbits = _fse_build_dtable(probs, al)
        bits = _BackBits(seg[used:])
        s1 = bits.read(al)
        s2 = bits.read(al)
        while True:
            weights.append(syms[s1])
            s1 = base[s1] + bits.read(nbits[s1])
            if bits.over:
                weights.append(syms[s2])
                break
            weights.append(syms[s2])
            s2 = base[s2] + bits.read(nbits[s2])
            if bits.over:
                weights.append(syms[s1])
                break
            if len(weights) > 254:
                raise ValueError("corrupt Huffman weight stream")
        consumed = 1 + header
    # the final symbol's weight is implied: it completes the sum of
    # 2^(w-1) to a power of two
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("corrupt Huffman weights")
    table_log = total.bit_length()
    rest = (1 << table_log) - total
    if rest & (rest - 1):
        raise ValueError("corrupt Huffman weights (non-power-of-2 rest)")
    weights.append(rest.bit_length())
    if table_log > 11:
        raise ValueError(f"Huffman table log {table_log} > 11")
    # canonical fill: ascending weight, natural symbol order, each
    # weight-w symbol spans 2^(w-1) cells
    size = 1 << table_log
    syms_t = bytearray(size)
    nbs_t = bytearray(size)
    pos = 0
    for w in range(1, table_log + 1):
        span = 1 << (w - 1)
        nb = table_log + 1 - w
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            for k in range(pos, pos + span):
                syms_t[k] = sym
                nbs_t[k] = nb
            pos += span
    if pos != size:
        raise ValueError("corrupt Huffman table (cells unfilled)")
    return (bytes(syms_t), bytes(nbs_t), table_log), consumed


def _huf_decode_stream(seg: bytes, table, n_out: int) -> bytearray:
    """Decode one Huffman-coded literal stream (backward, MSB-first
    peek of ``table_log`` bits per symbol)."""
    syms, nbs, tl = table
    bits = _BackBits(seg)
    out = bytearray(n_out)
    pos = bits.pos
    buf = bits.buf
    mask = (1 << tl) - 1
    # cached window: ``val`` holds bits [val_lo, hi) of the stream, so
    # the hot loop is small-int shifts with one byte-load per ~8 syms
    val = 0
    val_lo = pos
    for i in range(n_out):
        p = pos - tl
        if p >= val_lo:
            idx = (val >> (p - val_lo)) & mask
        elif p >= 0:
            lo_byte = (p >> 3) - 24
            if lo_byte < 0:
                lo_byte = 0
            val_lo = lo_byte << 3
            val = int.from_bytes(
                buf[lo_byte : (pos + 7) >> 3], "little"
            )
            idx = (val >> (p - val_lo)) & mask
        elif pos > 0:
            idx = (
                int.from_bytes(buf[0 : (pos + 7) >> 3], "little")
                & ((1 << pos) - 1)
            ) << (tl - pos)
        else:
            idx = 0
        out[i] = syms[idx]
        pos -= nbs[idx]
    if pos > 0:
        raise ValueError(f"Huffman stream not fully consumed ({pos} bits)")
    return out


# --------------------------------------------------------------------------
# literals + sequences sections
# --------------------------------------------------------------------------


def _decode_literals(block: bytes, ctx: dict):
    """RFC 8878 §3.1.1.3.1. Returns (literals, bytes_consumed).
    ``ctx['huf']`` carries the Huffman table across blocks (treeless)."""
    h0 = block[0]
    ltype = h0 & 3
    size_fmt = (h0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if size_fmt & 1 == 0:
            regen, used = h0 >> 3, 1
        elif size_fmt == 1:
            regen, used = (h0 >> 4) | (block[1] << 4), 2
        else:
            regen = (h0 >> 4) | (block[1] << 4) | (block[2] << 12)
            used = 3
        if ltype == 0:
            return bytes(block[used : used + regen]), used + regen
        return bytes([block[used]]) * regen, used + 1
    # Compressed (2) / Treeless (3)
    if size_fmt == 0:
        n_streams = 1
        v = int.from_bytes(block[:3], "little")
        regen, csize, used = (v >> 4) & 0x3FF, (v >> 14) & 0x3FF, 3
    elif size_fmt == 1:
        n_streams = 4
        v = int.from_bytes(block[:3], "little")
        regen, csize, used = (v >> 4) & 0x3FF, (v >> 14) & 0x3FF, 3
    elif size_fmt == 2:
        n_streams = 4
        v = int.from_bytes(block[:4], "little")
        regen, csize, used = (v >> 4) & 0x3FFF, (v >> 18) & 0x3FFF, 4
    else:
        n_streams = 4
        v = int.from_bytes(block[:5], "little")
        regen, csize, used = (v >> 4) & 0x3FFFF, (v >> 22) & 0x3FFFF, 5
    body = block[used : used + csize]
    p = 0
    if ltype == 2:
        ctx["huf"], p = _huf_read_table(body, 0)
    elif ctx.get("huf") is None:
        raise ValueError("treeless literals with no previous Huffman table")
    table = ctx["huf"]
    if n_streams == 1:
        lits = _huf_decode_stream(body[p:], table, regen)
    else:
        s1, s2, s3 = struct.unpack_from("<HHH", body, p)
        p += 6
        sizes = [s1, s2, s3, len(body) - p - s1 - s2 - s3]
        if sizes[3] <= 0:
            raise ValueError("corrupt 4-stream literal jump table")
        per = (regen + 3) >> 2
        outs = [per, per, per, regen - 3 * per]
        if outs[3] < 0:
            raise ValueError("corrupt 4-stream regenerated size")
        lits = bytearray()
        for sz, n_out in zip(sizes, outs):
            lits += _huf_decode_stream(body[p : p + sz], table, n_out)
            p += sz
    if len(lits) != regen:
        raise ValueError("literal size mismatch")
    return bytes(lits), used + csize


def _seq_table(mode: int, block: bytes, pos: int, default, ctx: dict,
               key: str, max_symbol: int):
    """One sequence table per its 2-bit mode: predefined / RLE /
    FSE-compressed / repeat. Returns (table, new_pos)."""
    if mode == 0:
        probs, al = default
        if ctx.get(key + "_pre") is None:
            ctx[key + "_pre"] = _fse_build_dtable(probs, al) + (al,)
        table = ctx[key + "_pre"]
    elif mode == 1:
        sym = block[pos]
        if sym > max_symbol:
            raise ValueError(f"RLE sequence symbol {sym} out of range")
        pos += 1
        table = ([sym], [0], [0], 0)
    elif mode == 2:
        al, probs, used = _fse_read_ncount(block, pos, max_symbol)
        pos += used
        table = _fse_build_dtable(probs, al) + (al,)
    else:
        table = ctx.get(key)
        if table is None:
            raise ValueError("repeat sequence table with no previous table")
    ctx[key] = table
    return table, pos


def _decode_block(block: bytes, out: bytearray, ctx: dict) -> None:
    """One compressed block (RFC 8878 §3.1.1.3): literals section,
    sequences section, then sequence execution appending to ``out``."""
    literals, pos = _decode_literals(block, ctx)
    # Number_of_Sequences varint
    b0 = block[pos]
    if b0 < 128:
        n_seq, pos = b0, pos + 1
    elif b0 < 255:
        n_seq, pos = ((b0 - 128) << 8) | block[pos + 1], pos + 2
    else:
        # RFC 8878 §3.1.1.3.2.1: long form is ADDITIVE, not OR'd —
        # byte1 + (byte2<<8) + 0x7F00 (low bits of byte2 must survive).
        n_seq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
        pos += 3
    if n_seq == 0:
        out += literals
        return
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("reserved sequence-mode bits set")
    ll_t, pos = _seq_table((modes >> 6) & 3, block, pos, _LL_DEFAULT,
                           ctx, "ll", 35)
    of_t, pos = _seq_table((modes >> 4) & 3, block, pos, _OF_DEFAULT,
                           ctx, "of", 31)
    ml_t, pos = _seq_table((modes >> 2) & 3, block, pos, _ML_DEFAULT,
                           ctx, "ml", 52)

    bits = _BackBits(block[pos:])
    ll_syms, ll_base, ll_nb, ll_al = ll_t
    of_syms, of_base, of_nb, of_al = of_t
    ml_syms, ml_base, ml_nb, ml_al = ml_t
    ll_s = bits.read(ll_al)
    of_s = bits.read(of_al)
    ml_s = bits.read(ml_al)

    rep = ctx["rep"]
    lit_pos = 0
    # RFC 8878: a block decompresses to at most 128 KB — enforcing it
    # per sequence keeps corrupt/hostile inputs from allocating GBs
    # before the structural checks fire
    out_len = len(out)
    max_end = out_len + (1 << 17)
    # inlined windowed bit reads: ONE byte-load per sequence covers the
    # iteration's <= ~90 bits (offset + extras + 3 state updates) — the
    # per-call _BackBits.read overhead dominated this loop otherwise
    buf = bits.buf
    bpos = bits.pos
    last_i = n_seq - 1
    for i in range(n_seq):
        hi_b = (bpos + 7) >> 3
        lo_b = hi_b - 16
        if lo_b < 0:
            lo_b = 0
        win_lo = lo_b << 3
        win = int.from_bytes(buf[lo_b:hi_b], "little")

        of_code = of_syms[of_s]
        bpos -= of_code
        q = bpos - win_lo
        if q < 0:
            raise ValueError("sequence bitstream overread")
        off_val = (1 << of_code) + ((win >> q) & ((1 << of_code) - 1))
        ml, ml_extra = _ML_CODE[ml_syms[ml_s]]
        if ml_extra:
            bpos -= ml_extra
            q = bpos - win_lo
            if q < 0:
                raise ValueError("sequence bitstream overread")
            ml += (win >> q) & ((1 << ml_extra) - 1)
        ll, ll_extra = _LL_CODE[ll_syms[ll_s]]
        if ll_extra:
            bpos -= ll_extra
            q = bpos - win_lo
            if q < 0:
                raise ValueError("sequence bitstream overread")
            ll += (win >> q) & ((1 << ll_extra) - 1)
        # repeat-offset resolution (RFC 8878 §3.1.1.5)
        if off_val > 3:
            offset = off_val - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = off_val - 1 if ll != 0 else off_val
            if idx == 0:
                offset = rep[0]
            elif idx == 3:
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("corrupt repeat offset (rep1 - 1 = 0)")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:
                offset = rep[idx]
                if idx == 2:
                    rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        if out_len + ll + ml > max_end:
            raise ValueError("block decompresses past the 128 KB cap")
        if ll:
            out += literals[lit_pos : lit_pos + ll]
            lit_pos += ll
            out_len += ll
        if offset > out_len:
            raise ValueError("match offset beyond frame start "
                             "(dictionary frames unsupported)")
        if ml:
            start = out_len - offset
            if offset >= ml:
                out += out[start : start + ml]
            else:
                # overlapping match: the copied region repeats with
                # period ``offset``
                pat = bytes(out[start:])
                out += (pat * (ml // offset + 1))[:ml]
            out_len += ml
        if i != last_i:  # states are not updated after the last seq
            n = ll_nb[ll_s]
            bpos -= n
            q = bpos - win_lo
            if q < 0:
                raise ValueError("sequence bitstream overread")
            ll_s = ll_base[ll_s] + ((win >> q) & ((1 << n) - 1))
            n = ml_nb[ml_s]
            bpos -= n
            q = bpos - win_lo
            if q < 0:
                raise ValueError("sequence bitstream overread")
            ml_s = ml_base[ml_s] + ((win >> q) & ((1 << n) - 1))
            n = of_nb[of_s]
            bpos -= n
            q = bpos - win_lo
            if q < 0:
                raise ValueError("sequence bitstream overread")
            of_s = of_base[of_s] + ((win >> q) & ((1 << n) - 1))
    if bits.over or bpos != 0:
        raise ValueError("sequence bitstream not fully consumed")
    out += literals[lit_pos:]


# --------------------------------------------------------------------------
# xxHash64 (content checksum)
# --------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 — zstd's Content_Checksum is its low 32 bits."""
    n = len(data)
    p = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M64
        a2 = (seed + _P2) & _M64
        a3 = seed & _M64
        a4 = (seed - _P1) & _M64
        lanes = struct.unpack_from("<%dQ" % ((n // 32) * 4), data)
        for k in range(0, len(lanes), 4):
            a1 = (_rotl((a1 + lanes[k] * _P2) & _M64, 31) * _P1) & _M64
            a2 = (_rotl((a2 + lanes[k + 1] * _P2) & _M64, 31) * _P1) & _M64
            a3 = (_rotl((a3 + lanes[k + 2] * _P2) & _M64, 31) * _P1) & _M64
            a4 = (_rotl((a4 + lanes[k + 3] * _P2) & _M64, 31) * _P1) & _M64
        p = (n // 32) * 32
        acc = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M64
        for a in (a1, a2, a3, a4):
            acc ^= (_rotl((a * _P2) & _M64, 31) * _P1) & _M64
            acc = (acc * _P1 + _P4) & _M64
    else:
        acc = (seed + _P5) & _M64
    acc = (acc + n) & _M64
    while p + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, p)
        acc ^= (_rotl((lane * _P2) & _M64, 31) * _P1) & _M64
        acc = (_rotl(acc, 27) * _P1 + _P4) & _M64
        p += 8
    if p + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, p)
        acc ^= (lane * _P1) & _M64
        acc = (_rotl(acc, 23) * _P2 + _P3) & _M64
        p += 4
    while p < n:
        acc ^= (data[p] * _P5) & _M64
        acc = (_rotl(acc, 11) * _P1) & _M64
        p += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P3) & _M64
    acc ^= acc >> 32
    return acc


# --------------------------------------------------------------------------
# frame layer
# --------------------------------------------------------------------------


def decode_zstd(payload: bytes, verify_checksum: bool = True) -> bytes:
    """Decode one or more concatenated zstd frames (skippable frames
    are skipped) and return the regenerated content."""
    out_frames = []
    pos = 0
    n = len(payload)
    while pos < n:
        (magic,) = struct.unpack_from("<I", payload, pos)
        if _SKIP_LO <= magic <= _SKIP_HI:
            (sz,) = struct.unpack_from("<I", payload, pos + 4)
            pos += 8 + sz
            continue
        if magic != _MAGIC:
            raise ValueError(f"bad zstd magic 0x{magic:08x} at byte {pos}")
        pos += 4
        desc = payload[pos]
        pos += 1
        fcs_flag = desc >> 6
        single_segment = bool(desc & 0x20)
        if desc & 0x08:
            raise ValueError("reserved frame-descriptor bit set")
        checksum = bool(desc & 0x04)
        did_size = (0, 1, 2, 4)[desc & 3]
        if not single_segment:
            pos += 1  # window descriptor (full buffering: unused)
        if did_size:
            did = int.from_bytes(payload[pos : pos + did_size], "little")
            pos += did_size
            if did != 0:
                raise NotImplementedError(
                    f"dictionary-compressed zstd frame (dict id {did})"
                )
        if fcs_flag == 0:
            fcs = payload[pos] if single_segment else None
            pos += 1 if single_segment else 0
        elif fcs_flag == 1:
            fcs = int.from_bytes(payload[pos : pos + 2], "little") + 256
            pos += 2
        elif fcs_flag == 2:
            fcs = int.from_bytes(payload[pos : pos + 4], "little")
            pos += 4
        else:
            fcs = int.from_bytes(payload[pos : pos + 8], "little")
            pos += 8

        out = bytearray()
        ctx = {"rep": [1, 4, 8], "huf": None}
        while True:
            hdr = int.from_bytes(payload[pos : pos + 3], "little")
            pos += 3
            last, btype, bsize = hdr & 1, (hdr >> 1) & 3, hdr >> 3
            if btype == 0:
                out += payload[pos : pos + bsize]
                pos += bsize
            elif btype == 1:
                out += payload[pos : pos + 1] * bsize
                pos += 1
            elif btype == 2:
                _decode_block(payload[pos : pos + bsize], out, ctx)
                pos += bsize
            else:
                raise ValueError("reserved block type 3")
            if last:
                break
        if checksum:
            (want,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            if verify_checksum and (xxh64(bytes(out)) & 0xFFFFFFFF) != want:
                raise ValueError("zstd content checksum mismatch")
        if fcs is not None and len(out) != fcs:
            raise ValueError(
                f"frame content size mismatch: header says {fcs}, "
                f"decoded {len(out)}"
            )
        out_frames.append(bytes(out))
    return b"".join(out_frames)


def encode_zstd_store(data: bytes, checksum: bool = True) -> bytes:
    """Pure-stdlib zstd framing with RAW blocks (no compression) —
    a valid frame any RFC 8878 decoder accepts. The dependency-free
    fallback encoder for ``compress='zstd'`` sinks."""
    n = len(data)
    parts = [struct.pack("<I", _MAGIC)]
    chk = 0x04 if checksum else 0
    if n < 256:
        parts.append(bytes([0x20 | chk, n]))  # single segment, 1-byte FCS
    elif n < 65536 + 256:
        parts.append(bytes([0x60 | chk]) + struct.pack("<H", n - 256))
    else:
        parts.append(bytes([0xA0 | chk]) + struct.pack("<I", n))
    step = 1 << 16  # raw blocks well under the 128 KB block cap
    if n == 0:
        parts.append(struct.pack("<I", 1)[:3])  # empty last raw block
    for off in range(0, n, step):
        chunk = data[off : off + step]
        last = 1 if off + step >= n else 0
        parts.append(
            int.to_bytes((len(chunk) << 3) | last, 3, "little") + chunk
        )
    if checksum:
        parts.append(struct.pack("<I", xxh64(data) & 0xFFFFFFFF))
    return b"".join(parts)


def encode_zstd(data: bytes, level: int = 3) -> bytes:
    """Real zstd compression via the libzstd bundled with pyarrow when
    available (exercises the decoder's Huffman/FSE paths), else this
    module's own real encoder (:func:`compress_zstd`)."""
    try:
        import pyarrow as pa

        codec = pa.Codec("zstd", compression_level=level)
        return codec.compress(data, asbytes=True)
    except Exception:
        return compress_zstd(data)


# --------------------------------------------------------------------------
# COMPRESSED-block encoder (dependency-free real compression)
# --------------------------------------------------------------------------
#
# Real zstd compression without libzstd: LZ matches (greedy 4-byte
# hash, the lz4-style matcher) + RAW literals + sequence codes
# FSE-coded with the PREDEFINED distributions. The encode-side state
# chains are derived from the DECODER's own tables: for each symbol
# the states emitting it partition [0, tableSize) by their
# (new_base, nb_bits) read-ranges, so back-solving from the next
# decode state picks exactly one predecessor and the bits the decoder
# will read. Huffman literals are deliberately not emitted (raw
# literals keep the encoder small); matches alone give lz4-class
# ratios, and the output is a standard frame any decoder accepts —
# round-tripped against libzstd in tests.


def _enc_maps(probs, accuracy_log):
    """symbol -> (decode-state array indexed by next_state) built from
    the decode table: entry = (state, nb_bits, new_base)."""
    syms, base, nbits = _fse_build_dtable(probs, accuracy_log)
    size = 1 << accuracy_log
    per_symbol: dict[int, list] = {}
    for s in range(size):
        per_symbol.setdefault(syms[s], []).append(s)
    # for each symbol: map next_state -> (state, nb, base)
    lookup: dict[int, list] = {}
    for sym, states in per_symbol.items():
        arr = [None] * size
        for s in states:
            for nxt in range(base[s], base[s] + (1 << nbits[s])):
                arr[nxt] = (s, nbits[s], base[s])
        lookup[sym] = arr
    first_state = {sym: states[0] for sym, states in per_symbol.items()}
    return lookup, first_state


_LL_ENC = _enc_maps(*_LL_DEFAULT)
_ML_ENC = _enc_maps(*_ML_DEFAULT)
_OF_ENC = _enc_maps(*_OF_DEFAULT)
_LL_AL, _ML_AL, _OF_AL = _LL_DEFAULT[1], _ML_DEFAULT[1], _OF_DEFAULT[1]


def _code_of(value: int, table) -> tuple[int, int, int]:
    """(code, extra_bits, extra_value) for a literal/match length via
    the shared baseline tables."""
    # binary search over baselines
    lo, hi = 0, len(table) - 1
    while lo < hi:
        mid = (lo + hi + 1) >> 1
        if table[mid][0] <= value:
            lo = mid
        else:
            hi = mid - 1
    baseline, nbits = table[lo]
    return lo, nbits, value - baseline


def _find_sequences(data: bytes):
    """Greedy matcher: [(n_literals, match_len, offset)...], trailing
    literal count. Min match 4, offsets within the block."""
    n = len(data)
    seqs = []
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    limit = n - 4
    while i < limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and data[cand : cand + 4] == key:
            ml = 4
            max_ml = n - i
            while ml < max_ml and data[cand + ml] == data[i + ml]:
                ml += 1
            seqs.append((i - anchor, ml, i - cand))
            i += ml
            anchor = i
        else:
            i += 1
    return seqs, n - anchor


def _encode_block_compressed(data: bytes) -> bytes | None:
    """One compressed block (<= 128 KB input), or None when
    compression does not pay."""
    seqs, trailing = _find_sequences(data)
    if not seqs:
        # no matches: a 0-sequence block with Huffman literals can
        # still pay (skewed text alphabets)
        lit_sec = _huf_literals_section(data)
        if lit_sec is None:
            return None
        block = lit_sec + b"\x00"  # Number_of_Sequences = 0
        return block if len(block) < len(data) else None
    # literals = the concatenation the decoder replays
    lits = bytearray()
    pos = 0
    rows = []
    for ll, ml, offset in seqs:
        lits += data[pos : pos + ll]
        pos += ll + ml
        ll_c, ll_nb, ll_x = _code_of(ll, _LL_CODE)
        ml_c, ml_nb, ml_x = _code_of(ml, _ML_CODE)
        off_val = offset + 3  # never a repeat-offset index
        of_c = off_val.bit_length() - 1
        of_x = off_val - (1 << of_c)
        rows.append((ll_c, ll_nb, ll_x, ml_c, ml_nb, ml_x, of_c, of_x))
    lits += data[pos:]
    assert len(lits) - trailing == sum(s[0] for s in seqs)

    # back-solve the three state chains (last sequence's states free)
    n_seq = len(rows)
    ll_states = [0] * n_seq
    ml_states = [0] * n_seq
    of_states = [0] * n_seq
    upd = [None] * n_seq  # (ll_bits, ll_nb, ml_bits, ml_nb, of_bits, of_nb)
    ll_states[-1] = _LL_ENC[1][rows[-1][0]]
    ml_states[-1] = _ML_ENC[1][rows[-1][3]]
    of_states[-1] = _OF_ENC[1][rows[-1][6]]
    for i in range(n_seq - 2, -1, -1):
        nxt = ll_states[i + 1]
        s, nb, base = _LL_ENC[0][rows[i][0]][nxt]
        ll_states[i] = s
        ll_bits = (nxt - base, nb)
        nxt = ml_states[i + 1]
        s, nb, base = _ML_ENC[0][rows[i][3]][nxt]
        ml_states[i] = s
        ml_bits = (nxt - base, nb)
        nxt = of_states[i + 1]
        s, nb, base = _OF_ENC[0][rows[i][6]][nxt]
        of_states[i] = s
        of_bits = (nxt - base, nb)
        upd[i] = (ll_bits, ml_bits, of_bits)

    # pack the backward bitstream in DECODE order from the top
    acc = 0
    total = 0

    def put(value: int, nbits: int) -> None:
        nonlocal acc, total
        if nbits:
            acc = (acc << nbits) | value
            total += nbits

    put(ll_states[0], _LL_AL)
    put(of_states[0], _OF_AL)
    put(ml_states[0], _ML_AL)
    for i, (ll_c, ll_nb, ll_x, ml_c, ml_nb, ml_x, of_c, of_x) in enumerate(
        rows
    ):
        put(of_x, of_c)
        put(ml_x, ml_nb)
        put(ll_x, ll_nb)
        if i + 1 < n_seq:
            (lb, ln), (mb, mn), (ob, on) = upd[i]
            put(lb, ln)
            put(mb, mn)
            put(ob, on)
    acc |= 1 << total  # sentinel
    stream = acc.to_bytes((total + 8) // 8, "little")

    # literals section: Huffman-compressed when it pays, else raw
    n_lit = len(lits)
    lit_sec = _huf_literals_section(bytes(lits))
    if lit_sec is None:
        if n_lit < 32:
            lit_hdr = bytes([n_lit << 3])
        elif n_lit < 4096:
            lit_hdr = bytes([0x04 | ((n_lit & 0xF) << 4), n_lit >> 4])
        else:
            lit_hdr = bytes(
                [0x0C | ((n_lit & 0xF) << 4), (n_lit >> 4) & 0xFF,
                 n_lit >> 12]
            )
        lit_sec = lit_hdr + bytes(lits)
    if n_seq < 128:
        seq_hdr = bytes([n_seq])
    elif n_seq < 0x7F00:
        seq_hdr = bytes([(n_seq >> 8) + 128, n_seq & 0xFF])
    else:
        seq_hdr = bytes([255, n_seq & 0xFF, (n_seq - 0x7F00) >> 8])
    block = lit_sec + seq_hdr + b"\x00" + stream
    return block if len(block) < len(data) else None


def compress_zstd(data: bytes, checksum: bool = True) -> bytes:
    """Dependency-free REAL zstd compression: LZ matches + predefined
    FSE sequence coding, raw-block fallback per 128 KB piece when
    matching does not pay. Output is a standard single-segment frame
    (content size declared, xxh64 checksum) accepted by any RFC 8878
    decoder — round-tripped against libzstd in tests."""
    n = len(data)
    parts = [struct.pack("<I", _MAGIC)]
    chk = 0x04 if checksum else 0
    if n < 256:
        parts.append(bytes([0x20 | chk, n]))
    elif n < 65536 + 256:
        parts.append(bytes([0x60 | chk]) + struct.pack("<H", n - 256))
    else:
        parts.append(bytes([0xA0 | chk]) + struct.pack("<I", n))
    step = 1 << 17  # the 128 KB decompressed-block cap
    if n == 0:
        parts.append(struct.pack("<I", 1)[:3])
    for off in range(0, n, step):
        chunk = data[off : off + step]
        last = 1 if off + step >= n else 0
        comp = _encode_block_compressed(chunk)
        if comp is not None:
            hdr = (len(comp) << 3) | (2 << 1) | last
        else:
            comp = chunk
            hdr = (len(chunk) << 3) | last
        parts.append(int.to_bytes(hdr, 3, "little") + comp)
    if checksum:
        parts.append(struct.pack("<I", xxh64(data) & 0xFFFFFFFF))
    return b"".join(parts)


def _huf_assign(hist: dict[int, int]):
    """Depth-limited (<= 11) Huffman code lengths for the present
    symbols; returns {sym: nbits} with exact Kraft equality."""
    import heapq

    syms = sorted(hist)
    if len(syms) < 2:
        return None
    heap = [(hist[s], i, (s,)) for i, s in enumerate(syms)]
    heapq.heapify(heap)
    tick = len(syms)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        fa, _, ga = heapq.heappop(heap)
        fb, _, gb = heapq.heappop(heap)
        for s in ga + gb:
            depth[s] += 1
        tick += 1
        heapq.heappush(heap, (fa + fb, tick, ga + gb))
    # clamp to 11 bits, then restore Kraft equality sum(2^-len) == 1
    for s in depth:
        depth[s] = max(1, min(11, depth[s]))
    kraft = sum(1 << (11 - d) for d in depth.values())  # target 2^11
    order = sorted(depth, key=lambda s: (hist[s], s))  # rarest first
    while kraft > (1 << 11):  # over-budget: lengthen rare symbols
        for s in order:
            if depth[s] < 11:
                kraft -= 1 << (11 - depth[s] - 1)
                depth[s] += 1
                break
        else:
            return None
        continue
    i = 0
    while kraft < (1 << 11):  # slack: shorten frequent symbols
        for s in sorted(depth, key=lambda s: (-hist[s], s)):
            gain = 1 << (11 - depth[s])
            if depth[s] > 1 and kraft + gain <= (1 << 11):
                kraft += gain
                depth[s] -= 1
                break
        else:
            break
        i += 1
        if i > 4096:
            break
    if kraft != (1 << 11):
        return None
    return depth


def _huf_literals_section(lits: bytes):
    """Huffman-compressed literals section (type 2, direct weights),
    or None when not applicable/bigger. Direct weight emission caps
    the max present symbol at 128 — text corpora qualify; binary
    literals fall back to raw."""
    n_lit = len(lits)
    if n_lit < 64:
        return None
    hist: dict[int, int] = {}
    for b in lits:
        hist[b] = hist.get(b, 0) + 1
    max_sym = max(hist)
    if max_sym > 128 or len(hist) < 2:
        return None
    depth = _huf_assign(hist)
    if depth is None:
        return None
    max_bits = max(depth.values())
    # weights from lengths; build canonical codes the DECODER's way:
    # ascending weight, natural symbol order, span-aligned starts
    weights = {s: max_bits + 1 - d for s, d in depth.items()}
    pos = 0
    codes: dict[int, tuple[int, int]] = {}
    for w in range(1, max_bits + 1):
        span = 1 << (w - 1)
        nb = max_bits + 1 - w
        for s in sorted(ws for ws, wv in weights.items() if wv == w):
            codes[s] = (pos >> (w - 1), nb)
            pos += span
    if pos != (1 << max_bits):
        return None
    # tree description: weights for symbols 0..max_sym-1 (the last
    # present symbol's weight is implied)
    n_weights = max_sym  # symbols 0..max_sym-1
    if n_weights > 128:
        return None
    wlist = [weights.get(s, 0) for s in range(n_weights)]
    desc = bytearray([127 + n_weights])
    for i in range(0, n_weights, 2):
        hi = wlist[i] << 4
        lo = wlist[i + 1] if i + 1 < n_weights else 0
        desc.append(hi | lo)

    def enc_stream(chunk: bytes) -> bytes:
        acc = 0
        total = 0
        for b in chunk:
            code, nb = codes[b]
            acc = (acc << nb) | code
            total += nb
        acc |= 1 << total
        return acc.to_bytes((total + 8) // 8, "little")

    if n_lit <= 1023:
        body = bytes(desc) + enc_stream(lits)
        csize = len(body)
        if csize > 1023 or csize >= n_lit:
            return None
        v = 0x02 | (0 << 2) | (n_lit << 4) | (csize << 14)
        return int.to_bytes(v, 3, "little") + body
    # 4-stream, size_format 11 (18-bit fields, covers the 128 KB cap)
    per = (n_lit + 3) >> 2
    parts = [lits[0:per], lits[per : 2 * per],
             lits[2 * per : 3 * per], lits[3 * per :]]
    if not all(parts):
        return None
    streams = [enc_stream(p) for p in parts]
    jump = struct.pack("<HHH", len(streams[0]), len(streams[1]),
                       len(streams[2]))
    if max(len(s) for s in streams[:3]) > 0xFFFF:
        return None
    body = bytes(desc) + jump + b"".join(streams)
    csize = len(body)
    if csize >= n_lit or csize > 0x3FFFF:
        return None
    v = 0x02 | (3 << 2) | (n_lit << 4) | (csize << 22)
    return int.to_bytes(v, 5, "little") + body
