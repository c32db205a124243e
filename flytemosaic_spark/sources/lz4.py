"""LZ4 block-format codec — pure stdlib, both directions.

Zarr deployments overwhelmingly compress chunks with blosc-lz4 or
numcodecs ``lz4`` (the reference's store is Zarr — reference
flytemosaic/datasets/utils.py writes through zarr/xarray defaults);
parquet and arrow use the same block format as ``lz4_raw``. The
format is entirely formulaic — token nibbles, extension bytes, 2-byte
little-endian match offsets, no entropy tables — so unlike MP3/H.264
a from-memory implementation is fully verifiable: tests round-trip
against the REAL lz4 bundled with pyarrow (``pa.Codec("lz4_raw")``)
in both directions.

``compress_block`` is a greedy single-probe hash matcher (the classic
LZ4-fast shape): real compression on repetitive data, always a valid
stream, with the spec's end-of-block restrictions honored (last 5
bytes literal, no match starting within 12 bytes of the end).
``numcodecs`` framing (4-byte LE original-size prefix) is provided
for Zarr-compatible chunk payloads.
"""

from __future__ import annotations

import struct

_MIN_MATCH = 4
# spec end-of-block restrictions: the last match must not start
# within 12 bytes of the end; the last 5 bytes are always literals
_MFLIMIT = 12
_HASH_LOG = 16


def decompress_block(data: bytes, out_size: int) -> bytes:
    """Decode one LZ4 block into exactly ``out_size`` bytes."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        # literal run
        ll = token >> 4
        if ll == 15:
            while True:
                b = data[pos]
                pos += 1
                ll += b
                if b != 255:
                    break
        if ll:
            out += data[pos : pos + ll]
            pos += ll
        if pos >= n:
            break  # last sequence is literals-only
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("corrupt LZ4 block: bad match offset")
        ml = (token & 0x0F) + _MIN_MATCH
        if (token & 0x0F) == 15:
            while True:
                b = data[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        if len(out) + ml > out_size:
            raise ValueError("corrupt LZ4 block: output overrun")
        start = len(out) - offset
        if offset >= ml:
            out += out[start : start + ml]
        else:
            pat = bytes(out[start:])
            out += (pat * (ml // offset + 1))[:ml]
    if len(out) != out_size:
        raise ValueError(
            f"LZ4 block decoded {len(out)} bytes, expected {out_size}"
        )
    return bytes(out)


def _write_varlen(out: bytearray, v: int) -> None:
    while v >= 255:
        out.append(255)
        v -= 255
    out.append(v)


def compress_block(data: bytes) -> bytes:
    """Greedy hash-probe LZ4 block encoder (valid for any input;
    genuinely compresses repetitive data)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        return b"\x00"  # one empty-literal token
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    limit = n - _MFLIMIT
    while i < limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if (
            cand is not None
            and i - cand <= 0xFFFF
            and data[cand : cand + 4] == key
        ):
            # extend the match forward (stop 5 bytes before the end)
            ml = 4
            max_ml = n - 5 - i
            while ml < max_ml and data[cand + ml] == data[i + ml]:
                ml += 1
            ll = i - anchor
            token_ll = 15 if ll >= 15 else ll
            token_ml = 15 if ml - _MIN_MATCH >= 15 else ml - _MIN_MATCH
            out.append((token_ll << 4) | token_ml)
            if ll >= 15:
                _write_varlen(out, ll - 15)
            out += data[anchor:i]
            out += struct.pack("<H", i - cand)
            if ml - _MIN_MATCH >= 15:
                _write_varlen(out, ml - _MIN_MATCH - 15)
            i += ml
            anchor = i
        else:
            i += 1
    # final literals
    ll = n - anchor
    token_ll = 15 if ll >= 15 else ll
    out.append(token_ll << 4)
    if ll >= 15:
        _write_varlen(out, ll - 15)
    out += data[anchor:]
    return bytes(out)


def numcodecs_lz4_encode(data: bytes) -> bytes:
    """numcodecs ``lz4`` chunk layout: 4-byte LE original size + one
    LZ4 block — the Zarr v2 wire format."""
    return struct.pack("<I", len(data)) + compress_block(data)


def numcodecs_lz4_decode(payload: bytes) -> bytes:
    (size,) = struct.unpack_from("<I", payload, 0)
    return decompress_block(payload[4:], size)


# --------------------------------------------------------------------------
# LZ4 FRAME format (the `.lz4` file / `pa.Codec("lz4")` layout)
# --------------------------------------------------------------------------

_FRAME_MAGIC = 0x184D2204
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F


def decompress_frame(payload: bytes) -> bytes:
    """Decode one or more LZ4 frames (magic 0x184D2204): frame
    descriptor (flags incl. block-independence and content-size,
    block-maximum descriptor, header checksum byte), a sequence of
    data blocks whose high size bit marks UNCOMPRESSED blocks,
    optional per-block checksums, the 0 end mark, and the optional
    content checksum. Block-DEPENDENT frames (matches reaching into
    the previous block) are handled by decoding into one rolling
    output buffer. Skippable frames are skipped. Checksums are xxh32
    — verified when present."""
    out = bytearray()
    pos = 0
    n = len(payload)
    while pos + 4 <= n:
        (magic,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if _SKIP_LO <= magic <= _SKIP_HI:
            (sz,) = struct.unpack_from("<I", payload, pos)
            pos += 4 + sz
            continue
        if magic != _FRAME_MAGIC:
            raise ValueError(f"bad LZ4 frame magic 0x{magic:08x}")
        desc_start = pos
        flg = payload[pos]
        bd = payload[pos + 1]
        pos += 2
        if (flg >> 6) != 0b01:
            raise ValueError("unsupported LZ4 frame version")
        b_indep = bool(flg & 0x20)
        b_checksum = bool(flg & 0x10)
        has_csize = bool(flg & 0x08)
        c_checksum = bool(flg & 0x04)
        if flg & 0x01:
            raise NotImplementedError("LZ4 frame dictionary id")
        max_block = 1 << (8 + 2 * ((bd >> 4) & 7))  # 64KB..4MB
        content_size = None
        if has_csize:
            (content_size,) = struct.unpack_from("<Q", payload, pos)
            pos += 8
        # Header checksum: second byte of xxh32 over the descriptor
        # (FLG..content-size), per the LZ4 frame spec.
        want_hc = (xxh32(bytes(payload[desc_start:pos])) >> 8) & 0xFF
        if payload[pos] != want_hc:
            raise ValueError("LZ4 frame header checksum mismatch")
        pos += 1
        frame_start = len(out)
        while True:
            (bsize,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            if bsize == 0:
                break  # EndMark
            uncompressed = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            if bsize > max_block + 4:
                raise ValueError("LZ4 block exceeds declared maximum")
            block = payload[pos : pos + bsize]
            pos += bsize
            if b_checksum:
                (want,) = struct.unpack_from("<I", payload, pos)
                pos += 4
                if xxh32(block) != want:
                    raise ValueError("LZ4 block checksum mismatch")
            if uncompressed:
                out += block
            elif b_indep:
                out += decompress_block_bounded(block, max_block)
            else:
                # block-dependent: matches may reach back into prior
                # blocks — decode appending to the rolling buffer
                _decode_into(block, out, max_block)
        if c_checksum:
            (want,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            if xxh32(bytes(out[frame_start:])) != want:
                raise ValueError("LZ4 content checksum mismatch")
        if content_size is not None and len(out) - frame_start != content_size:
            raise ValueError("LZ4 frame content size mismatch")
    return bytes(out)


def decompress_block_bounded(data: bytes, max_out: int) -> bytes:
    """Block decode when the exact output size is unknown (frame
    blocks declare only a maximum)."""
    buf = bytearray()
    _decode_into(data, buf, max_out)
    return bytes(buf)


def _decode_into(data: bytes, out: bytearray, max_grow: int) -> None:
    """Core block decode appending to ``out`` (matches may reference
    bytes already in ``out`` — the frame format's block-dependent
    mode); grows ``out`` by at most ``max_grow``."""
    pos = 0
    n = len(data)
    limit = len(out) + max_grow
    while pos < n:
        token = data[pos]
        pos += 1
        ll = token >> 4
        if ll == 15:
            while True:
                b = data[pos]
                pos += 1
                ll += b
                if b != 255:
                    break
        if ll:
            if len(out) + ll > limit:
                raise ValueError("LZ4 block output overrun")
            out += data[pos : pos + ll]
            pos += ll
        if pos >= n:
            break
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("corrupt LZ4 block: bad match offset")
        ml = (token & 0x0F) + _MIN_MATCH
        if (token & 0x0F) == 15:
            while True:
                b = data[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        if len(out) + ml > limit:
            raise ValueError("LZ4 block output overrun")
        start = len(out) - offset
        if offset >= ml:
            out += out[start : start + ml]
        else:
            pat = bytes(out[start:])
            out += (pat * (ml // offset + 1))[:ml]


def compress_frame(data: bytes, block_size: int = 1 << 22) -> bytes:
    """A valid LZ4 frame: block-independent, content-size declared,
    content-checksummed — accepted by any frame decoder (tested
    against the real lz4 in pyarrow)."""
    parts = [struct.pack("<I", _FRAME_MAGIC)]
    flg = 0x40 | 0x20 | 0x08 | 0x04  # v1, indep blocks, csize, cchecksum
    bd = 0x70  # BD: 4 MB max block
    desc = bytes([flg, bd]) + struct.pack("<Q", len(data))
    # header checksum: (xxh32(descriptor) >> 8) & 0xFF
    parts.append(desc + bytes([(xxh32(desc) >> 8) & 0xFF]))
    for off in range(0, len(data), block_size):
        chunk = data[off : off + block_size]
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            parts.append(struct.pack("<I", len(comp)) + comp)
        else:  # store uncompressed (high bit set)
            parts.append(
                struct.pack("<I", 0x80000000 | len(chunk)) + chunk
            )
    parts.append(struct.pack("<I", 0))  # EndMark
    parts.append(struct.pack("<I", xxh32(data)))
    return b"".join(parts)


# xxHash32 — the LZ4 frame checksum
_P32_1 = 0x9E3779B1
_P32_2 = 0x85EBCA77
_P32_3 = 0xC2B2AE3D
_P32_4 = 0x27D4EB2F
_P32_5 = 0x165667B1
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    p = 0
    if n >= 16:
        a1 = (seed + _P32_1 + _P32_2) & _M32
        a2 = (seed + _P32_2) & _M32
        a3 = seed & _M32
        a4 = (seed - _P32_1) & _M32
        lanes = struct.unpack_from("<%dI" % ((n // 16) * 4), data)
        for k in range(0, len(lanes), 4):
            a1 = (_rotl32((a1 + lanes[k] * _P32_2) & _M32, 13) * _P32_1) & _M32
            a2 = (_rotl32((a2 + lanes[k + 1] * _P32_2) & _M32, 13) * _P32_1) & _M32
            a3 = (_rotl32((a3 + lanes[k + 2] * _P32_2) & _M32, 13) * _P32_1) & _M32
            a4 = (_rotl32((a4 + lanes[k + 3] * _P32_2) & _M32, 13) * _P32_1) & _M32
        p = (n // 16) * 16
        acc = (
            _rotl32(a1, 1) + _rotl32(a2, 7) + _rotl32(a3, 12) + _rotl32(a4, 18)
        ) & _M32
    else:
        acc = (seed + _P32_5) & _M32
    acc = (acc + n) & _M32
    while p + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, p)
        acc = (_rotl32((acc + lane * _P32_3) & _M32, 17) * _P32_4) & _M32
        p += 4
    while p < n:
        acc = (_rotl32((acc + data[p] * _P32_5) & _M32, 11) * _P32_1) & _M32
        p += 1
    acc ^= acc >> 15
    acc = (acc * _P32_2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P32_3) & _M32
    acc ^= acc >> 16
    return acc
