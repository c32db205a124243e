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
