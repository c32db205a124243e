"""Snappy raw-block codec — pure stdlib, both directions.

The classic parquet/Hadoop block codec. Like LZ4 the format is fully
formulaic (a varint length then literal/copy tags — no entropy
tables), so a from-scratch implementation is verifiable BOTH
directions against the real snappy bundled with pyarrow
(``pa.Codec("snappy")``). The encoder is a greedy 4-byte-hash
matcher emitting 2-byte-offset copies (16-bit window, <=64-byte
copies, the shapes real snappy emits)."""

from __future__ import annotations

import struct


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 35:
            raise ValueError("corrupt snappy varint")


def _write_varint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode one snappy block (raw format, not the framing format)."""
    out_size, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ll = tag >> 2
            if ll >= 60:  # 1-4 extra length bytes, little-endian
                nb = ll - 59
                ll = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            ll += 1
            out += data[pos : pos + ll]
            pos += ll
            continue
        if kind == 1:  # copy, 1-byte offset
            ml = ((tag >> 2) & 7) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ml = (tag >> 2) + 1
            (offset,) = struct.unpack_from("<H", data, pos)
            pos += 2
        else:  # copy, 4-byte offset
            ml = (tag >> 2) + 1
            (offset,) = struct.unpack_from("<I", data, pos)
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("corrupt snappy copy offset")
        if len(out) + ml > out_size:
            raise ValueError("snappy output overrun")
        start = len(out) - offset
        if offset >= ml:
            out += out[start : start + ml]
        else:
            pat = bytes(out[start:])
            out += (pat * (ml // offset + 1))[:ml]
    if len(out) != out_size:
        raise ValueError(
            f"snappy decoded {len(out)} bytes, expected {out_size}"
        )
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Greedy snappy encoder: 4-byte-hash candidates, 16-bit-offset
    copies capped at 64 bytes (long matches emit several copies)."""
    n = len(data)
    out = bytearray(_write_varint(n))

    def emit_literal(lo: int, hi: int) -> None:
        ll = hi - lo
        while ll > 0:
            take = min(ll, 1 << 16)
            if take <= 60:
                out.append((take - 1) << 2)
            else:
                nb = ((take - 1).bit_length() + 7) // 8
                out.append((59 + nb) << 2)
                out.extend(int.to_bytes(take - 1, nb, "little"))
            out.extend(data[lo : lo + take])
            lo += take
            ll -= take

    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    limit = n - 4
    while i < limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if (
            cand is not None
            and i - cand <= 0xFFFF
            and data[cand : cand + 4] == key
        ):
            ml = 4
            max_ml = n - i
            while ml < max_ml and data[cand + ml] == data[i + ml]:
                ml += 1
            emit_literal(anchor, i)
            offset = i - cand
            rem = ml
            while rem > 0:
                take = min(rem, 64)
                if take < 4:  # tag-10 copies need len >= 1; keep >= 4
                    # fold the tail into the next literal run instead
                    break
                out.append(((take - 1) << 2) | 2)
                out += struct.pack("<H", offset)
                rem -= take
            i += ml - rem
            anchor = i
        else:
            i += 1
    emit_literal(anchor, n)
    return bytes(out)
