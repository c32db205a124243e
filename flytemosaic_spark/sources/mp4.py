"""Minimal REAL ISO-BMFF (MP4) container codec — pure stdlib struct.

The multimodal video tier (SURVEY §2 extension: image/audio/video as
opaque binary columns) needs container METADATA long before it needs
pixels: a training-data curation pipeline filters by duration,
resolution, codec and track layout, and none of that requires a
decoder. This module implements the ISO/IEC 14496-12 box structure —
``parse_mp4`` walks ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/stbl/stsd
(versions 0 and 1, 32/64-bit sizes) and returns the metadata a
``ffprobe``-style scan would; ``encode_minimal_mp4`` writes a valid
minimal file (the test oracle for the parser, and the deterministic
fixture generator for the Spark probes).

Sample tables (stts/stsc/stsz/stco/co64) are parsed and expanded to
per-sample (offset, size) byte ranges, and ``encode_mp4_with_samples``
writes real multi-chunk sample tables around caller-provided sample
payloads — so MJPEG tracks (sample entry ``jpeg``, each sample a
complete JPEG image) decode end-to-end through the pure-numpy T.81
codec in ``sources/jpeg.py``: REAL video frame sampling with no
external demuxer. Inter-frame codecs (H.264/AV1/...) still raise at
the documented ffmpeg seam in ``operators/multimodal.py``.

H.264 baseline I-frame decode (considered for r8, declined with the
mp3.py rationale): the algorithmic parts — exp-Golomb headers, 4x4
intra prediction, the integer transform — are reproducible from the
public spec, but CAVLC residual entropy coding hinges on ~1,000
entries of normative VLC tables (ITU-T H.264 Table 9-5 coeff_token
across four nC contexts, Tables 9-7/9-8 total_zeros for 4x4 and
chroma-DC, Table 9-10 run_before). Those cannot be reproduced from
public memory with bit-exact confidence, and this container ships no
H.264 encoder or decoder to validate against — one wrong VLC entry
yields a decoder that parses real streams into plausible garbage
with no failing check. A from-memory implementation would be
H.264-shaped, not H.264; the seam stays named until a reference
(ffmpeg/openh264 or conformance bitstreams with known hashes) is
available to pin the tables. The MJPEG tier above provides the real
frame-sampling shape in the meantime.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in a range."""
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, off)
        fourcc = buf[off + 4 : off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", buf, off + 8)
            body = off + 16
        elif size == 0:  # box extends to end of file
            size = end - off
        if size < 8 or off + size > end:
            raise ValueError("malformed MP4 box size")
        yield fourcc, body, off + size
        off += size


def _full_box(buf: bytes, off: int) -> tuple[int, int]:
    """(version, first-field offset) of a FullBox body."""
    return buf[off], off + 4


def parse_mp4(payload: bytes) -> dict:
    """Parse MP4 container metadata: ``{"brand", "timescale",
    "duration_ms", "tracks": [{"kind" ('vide'/'soun'/...), "codec",
    "width", "height", "duration_ms"}]}``. Raises ValueError on
    non-MP4 payloads (callers route by the ftyp magic)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload (no ftyp box)")
    out: dict = {"brand": payload[8:12].decode("latin-1"), "tracks": []}
    for cc, b, e in _walk(payload, 0, len(payload)):
        if cc == b"moov":
            _parse_moov(payload, b, e, out)
    if "timescale" not in out:
        raise ValueError("MP4 payload has no moov/mvhd")
    return out


def _parse_moov(buf: bytes, start: int, end: int, out: dict) -> None:
    for cc, b, e in _walk(buf, start, end):
        if cc == b"mvhd":
            ver, p = _full_box(buf, b)
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", buf, p + 16)
            else:
                ts, dur = struct.unpack_from(">II", buf, p + 8)
            out["timescale"] = ts
            out["duration_ms"] = int(dur * 1000 // ts) if ts else 0
        elif cc == b"trak":
            out["tracks"].append(_parse_trak(buf, b, e))


def _parse_trak(buf: bytes, start: int, end: int) -> dict:
    tr: dict = {"kind": None, "codec": None, "width": 0, "height": 0,
                "duration_ms": 0, "sample_count": 0, "samples": []}
    for cc, b, e in _walk(buf, start, end):
        if cc == b"tkhd":
            ver, p = _full_box(buf, b)
            # width/height are the LAST 8 bytes of tkhd, 16.16 fixed
            w, h = struct.unpack_from(">II", buf, e - 8)
            tr["width"] = w >> 16
            tr["height"] = h >> 16
        elif cc == b"mdia":
            _parse_mdia(buf, b, e, tr)
    return tr


def _parse_mdia(buf: bytes, start: int, end: int, tr: dict) -> None:
    for cc, b, e in _walk(buf, start, end):
        if cc == b"mdhd":
            ver, p = _full_box(buf, b)
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", buf, p + 16)
            else:
                ts, dur = struct.unpack_from(">II", buf, p + 8)
            tr["duration_ms"] = int(dur * 1000 // ts) if ts else 0
        elif cc == b"hdlr":
            tr["kind"] = buf[b + 8 : b + 12].decode("latin-1")
        elif cc == b"minf":
            for cc2, b2, e2 in _walk(buf, b, e):
                if cc2 == b"stbl":
                    _parse_stbl(buf, b2, e2, tr)


def _parse_stbl(buf: bytes, start: int, end: int, tr: dict) -> None:
    """Sample tables: stsd (codec), and the stts/stsc/stsz/stco(co64)
    quartet expanded to per-sample (offset, size) byte ranges — what a
    frame-sampling pass needs to slice codec bitstreams out of mdat
    without any demuxer library."""
    stsc: list[tuple[int, int]] = []
    stco: list[int] = []
    sizes: list[int] = []
    n_samples = 0
    for cc, b, e in _walk(buf, start, end):
        if cc == b"stsd":
            (n,) = struct.unpack_from(">I", buf, b + 4)
            if n >= 1:
                tr["codec"] = buf[b + 12 : b + 16].decode("latin-1")
        elif cc == b"stts":
            (cnt,) = struct.unpack_from(">I", buf, b + 4)
            p = b + 8
            for _ in range(cnt):
                sc, _delta = struct.unpack_from(">II", buf, p)
                n_samples += sc
                p += 8
        elif cc == b"stsc":
            (cnt,) = struct.unpack_from(">I", buf, b + 4)
            p = b + 8
            for _ in range(cnt):
                first, per, _sdi = struct.unpack_from(">III", buf, p)
                stsc.append((first, per))
                p += 12
        elif cc == b"stsz":
            uniform, cnt = struct.unpack_from(">II", buf, b + 4)
            if uniform:
                sizes = [uniform] * cnt
            else:
                sizes = list(
                    struct.unpack_from(f">{cnt}I", buf, b + 12)
                    if cnt
                    else ()
                )
        elif cc == b"stco":
            (cnt,) = struct.unpack_from(">I", buf, b + 4)
            stco = list(
                struct.unpack_from(f">{cnt}I", buf, b + 8) if cnt else ()
            )
        elif cc == b"co64":
            (cnt,) = struct.unpack_from(">I", buf, b + 4)
            stco = list(
                struct.unpack_from(f">{cnt}Q", buf, b + 8) if cnt else ()
            )
    tr["sample_count"] = n_samples
    tr["samples"] = _expand_samples(stsc, stco, sizes)


def _expand_samples(
    stsc: list[tuple[int, int]], stco: list[int], sizes: list[int]
) -> list[tuple[int, int]]:
    """(chunk run-length map, chunk offsets, sample sizes) -> absolute
    (offset, size) per sample; samples are contiguous within a chunk."""
    if not stsc or not stco or not sizes:
        return []
    per_chunk: list[int] = []
    for idx, (first, per) in enumerate(stsc):
        last = stsc[idx + 1][0] - 1 if idx + 1 < len(stsc) else len(stco)
        per_chunk.extend([per] * (last - first + 1))
    out: list[tuple[int, int]] = []
    si = 0
    for c, off in enumerate(stco):
        pos = off
        for _ in range(per_chunk[c] if c < len(per_chunk) else 0):
            if si >= len(sizes):
                return out
            out.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    return out


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]) + body)


def encode_minimal_mp4(
    duration_ms: int,
    width: int = 0,
    height: int = 0,
    video_codec: str = "avc1",
    audio: bool = False,
    timescale: int = 1000,
    mdat: bytes = b"",
) -> bytes:
    """A valid minimal MP4: ftyp + moov (mvhd + one video trak, plus
    an audio trak when ``audio``) + mdat. The sample tables are empty
    (no real media) — the structure is what the parser consumes, and
    the bytes are deterministic for a given argument tuple."""
    dur = duration_ms * timescale // 1000

    def visual_entry(codec: str) -> bytes:
        body = b"\0" * 6 + struct.pack(">H", 1)  # data_reference_index
        body += b"\0" * 16  # pre_defined/reserved
        body += struct.pack(">HH", width, height)
        body += struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        body += b"\0" * 4 + struct.pack(">H", 1)  # frame_count
        body += b"\0" * 32  # compressorname
        body += struct.pack(">Hh", 24, -1)  # depth, pre_defined
        return _box(codec.encode("latin-1"), body)

    def audio_entry() -> bytes:
        body = b"\0" * 6 + struct.pack(">H", 1)
        body += b"\0" * 8
        body += struct.pack(">HHI", 2, 16, 0)  # channels, bits, reserved
        body += struct.pack(">I", 44100 << 16)
        return _box(b"mp4a", body)

    def trak(kind: bytes, entry: bytes, tid: int) -> bytes:
        tkhd = _full(
            b"tkhd",
            struct.pack(">II", 0, 0)  # creation/modification
            + struct.pack(">I", tid)
            + b"\0" * 4
            + struct.pack(">I", dur)
            + b"\0" * 8  # reserved
            + struct.pack(">hhh", 0, 0, 0)  # layer/group/volume
            + b"\0" * 2
            + b"\0" * 36  # identity matrix omitted (zeros parse fine)
            + struct.pack(
                ">II",
                (width if kind == b"vide" else 0) << 16,
                (height if kind == b"vide" else 0) << 16,
            ),
        )
        mdhd = _full(
            b"mdhd",
            struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _full(
            b"hdlr", b"\0" * 4 + kind + b"\0" * 12 + b"\0"
        )
        stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
        stbl = _box(
            b"stbl",
            stsd
            + _full(b"stts", struct.pack(">I", 0))
            + _full(b"stsc", struct.pack(">I", 0))
            + _full(b"stsz", struct.pack(">II", 0, 0))
            + _full(b"stco", struct.pack(">I", 0)),
        )
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + b"\0" * 2  # volume... (trailing fields zeroed)
        + b"\0" * 10
        + b"\0" * 36  # matrix
        + b"\0" * 24  # pre_defined
        + struct.pack(">I", 3),  # next_track_ID
    )
    traks = trak(b"vide", visual_entry(video_codec), 1)
    if audio:
        traks += trak(b"soun", audio_entry(), 2)
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov + _box(b"mdat", mdat)


def encode_mp4_with_samples(
    samples: list[bytes],
    codec: str = "jpeg",
    width: int = 0,
    height: int = 0,
    fps: int = 10,
    timescale: int = 1000,
    samples_per_chunk: int = 4,
) -> bytes:
    """A valid MP4 whose video track carries REAL samples: full
    stts/stsc/stsz/stco tables, samples grouped ``samples_per_chunk``
    per chunk inside mdat (a short final chunk gets its own stsc run,
    per spec). With ``codec="jpeg"`` and each sample a complete JPEG
    image this is an MJPEG file our own T.81 codec can play back.

    The chunk offsets depend on moov's byte length, which depends only
    on the table SHAPE (u32 offsets), so the moov is built twice:
    once with zeroed offsets to measure, once with the real ones.
    """
    n = len(samples)
    if n == 0:
        raise ValueError("need at least one sample")
    delta = max(1, timescale // fps)
    dur = n * delta
    sizes = [len(s) for s in samples]
    n_chunks = (n + samples_per_chunk - 1) // samples_per_chunk
    last = n - (n_chunks - 1) * samples_per_chunk
    stsc_entries = [(1, samples_per_chunk, 1)]
    if last != samples_per_chunk:
        if n_chunks == 1:
            stsc_entries = [(1, last, 1)]
        else:
            stsc_entries.append((n_chunks, last, 1))

    def build(chunk_offsets: list[int]) -> bytes:
        entry_body = b"\0" * 6 + struct.pack(">H", 1)
        entry_body += b"\0" * 16
        entry_body += struct.pack(">HH", width, height)
        entry_body += struct.pack(">II", 0x00480000, 0x00480000)
        entry_body += b"\0" * 4 + struct.pack(">H", 1)
        entry_body += b"\0" * 32
        entry_body += struct.pack(">Hh", 24, -1)
        stsd = _full(
            b"stsd",
            struct.pack(">I", 1) + _box(codec.encode("latin-1"), entry_body),
        )
        stts = _full(b"stts", struct.pack(">III", 1, n, delta))
        stsc = _full(
            b"stsc",
            struct.pack(">I", len(stsc_entries))
            + b"".join(struct.pack(">III", *e) for e in stsc_entries),
        )
        stsz = _full(
            b"stsz",
            struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
        stco = _full(
            b"stco",
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        tkhd = _full(
            b"tkhd",
            struct.pack(">II", 0, 0)
            + struct.pack(">I", 1)
            + b"\0" * 4
            + struct.pack(">I", dur)
            + b"\0" * 8
            + struct.pack(">hhh", 0, 0, 0)
            + b"\0" * 2
            + b"\0" * 36
            + struct.pack(">II", width << 16, height << 16),
        )
        mdhd = _full(
            b"mdhd",
            struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _full(b"hdlr", b"\0" * 4 + b"vide" + b"\0" * 12 + b"\0")
        mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _full(
            b"mvhd",
            struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">I", 0x00010000)
            + b"\0" * 2
            + b"\0" * 10
            + b"\0" * 36
            + b"\0" * 24
            + struct.pack(">I", 2),
        )
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    moov_len = len(build([0] * n_chunks))
    base = len(ftyp) + moov_len + 8  # mdat body start
    offsets, pos, i = [], base, 0
    for _ in range(n_chunks):
        offsets.append(pos)
        take = min(samples_per_chunk, n - i)
        pos += sum(sizes[i : i + take])
        i += take
    moov = build(offsets)
    if len(moov) != moov_len:
        raise AssertionError("moov size changed between passes")
    return ftyp + moov + _box(b"mdat", b"".join(samples))
