"""Ogg container metadata (RFC 3533) with Opus mapping (RFC 7845).

The audio-metadata family's third member (MP3 frame walk, MP4 boxes,
and now Ogg pages): Opus-in-Ogg is the codec of choice for speech
datasets, and the curation fields — channels, pre-skip, input rate,
EXACT duration — live in the container: ``OpusHead`` on the BOS page
and the final page's granule position (total 48 kHz samples). This
module walks pages for real: capture pattern, lacing tables,
continued packets, and the Ogg CRC-32 (poly 0x04C11DB7, UNreflected —
not zlib's) verified per page. ``encode_ogg_opus_shell`` writes a
structurally valid stream with empty audio packets (the parser's
oracle; actual Opus SILK/CELT decode stays at the named ffmpeg/libopus
seam)."""

from __future__ import annotations

import struct


def _make_ogg_crc_table() -> list[int]:
    tbl = []
    for b in range(256):
        c = b << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if c & 0x80000000 \
                else (c << 1) & 0xFFFFFFFF
        tbl.append(c)
    return tbl


_CRC = _make_ogg_crc_table()


def _ogg_crc(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFFFFFF) ^ _CRC[((c >> 24) ^ b) & 0xFF]
    return c


def _pages(payload: bytes):
    """Yield (header_type, granule, serial, seq, packets_data, lacing)
    per page, CRC-verified."""
    pos = 0
    while pos + 27 <= len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"lost Ogg capture at byte {pos}")
        (ver, htype, granule, serial, seq, crc, nseg) = struct.unpack_from(
            "<BBqIIIB", payload, pos + 4
        )
        if ver != 0:
            raise ValueError(f"Ogg version {ver}")
        lacing = payload[pos + 27 : pos + 27 + nseg]
        body_start = pos + 27 + nseg
        body_len = sum(lacing)
        page_end = body_start + body_len
        if page_end > len(payload):
            raise ValueError("truncated Ogg page")
        page = bytearray(payload[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"  # CRC field zeroed for check
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page CRC mismatch at byte {pos}")
        yield htype, granule, serial, seq, payload[body_start:page_end], lacing
        pos = page_end


def parse_ogg_opus(payload: bytes) -> dict:
    """``{"channels", "preskip", "input_rate", "n_pages",
    "duration_ms"}`` — duration is exact: (last granule - preskip) /
    48 kHz, per RFC 7845 §4."""
    head = None
    last_granule = None
    n_pages = 0
    for htype, granule, _serial, _seq, body, lacing in _pages(payload):
        n_pages += 1
        if htype & 0x02:  # BOS page: must open with OpusHead
            if body[:8] != b"OpusHead":
                raise ValueError("BOS page is not an OpusHead packet")
            version, channels = body[8], body[9]
            if version >> 4 != 0:
                raise ValueError(f"OpusHead version {version}")
            (preskip,) = struct.unpack_from("<H", body, 10)
            (input_rate,) = struct.unpack_from("<I", body, 12)
            head = {
                "channels": channels,
                "preskip": preskip,
                "input_rate": input_rate,
            }
        if granule >= 0:
            last_granule = granule
    if head is None:
        raise ValueError("no OpusHead BOS page found")
    if last_granule is None:
        raise ValueError("no completed audio page (granule) found")
    pcm = max(0, last_granule - head["preskip"])
    head["n_pages"] = n_pages
    head["duration_ms"] = pcm * 1000 // 48000
    return head


def _page(
    htype: int, granule: int, serial: int, seq: int, packets: list[bytes]
) -> bytes:
    lacing = bytearray()
    for p in packets:
        n = len(p)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)  # terminal lacing value < 255
    body = b"".join(packets)
    hdr = b"OggS" + struct.pack(
        "<BBqIIIB", 0, htype, granule, serial, seq, 0, len(lacing)
    )
    page = bytearray(hdr + bytes(lacing) + body)
    crc = _ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def encode_ogg_opus_shell(
    n_audio_pages: int,
    samples_per_page: int = 960 * 50,
    channels: int = 1,
    preskip: int = 312,
    input_rate: int = 48000,
    serial: int = 1,
) -> bytes:
    """A structurally valid Ogg Opus stream: OpusHead BOS page,
    OpusTags page, then ``n_audio_pages`` data pages whose granule
    positions accumulate ``samples_per_page`` 48 kHz samples each
    (packets are empty shells — header walking never reads them)."""
    head = (
        b"OpusHead"
        + bytes([1, channels])
        + struct.pack("<HIhB", preskip, input_rate, 0, 0)
    )
    tags = (
        b"OpusTags"
        + struct.pack("<I", 17)
        + b"flytemosaic_spark"
        + struct.pack("<I", 0)
    )
    out = _page(0x02, 0, serial, 0, [head])
    out += _page(0x00, 0, serial, 1, [tags])  # RFC 7845: granule 0
    granule = preskip
    for i in range(n_audio_pages):
        granule += samples_per_page
        htype = 0x04 if i == n_audio_pages - 1 else 0x00  # EOS on last
        out += _page(htype, granule, serial, 2 + i, [b"\xf8"])
    return out
