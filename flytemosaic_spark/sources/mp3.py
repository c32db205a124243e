"""MP3 (MPEG-1/2/2.5 Layer III) container METADATA — pure stdlib.

The same honesty split as MP4 (sources/mp4.py): a curation pipeline
filters audio by duration/bitrate/sample-rate long before it needs
samples, and ALL of that lives in the frame headers — so this module
walks them for real: optional ID3v2 prelude (syncsafe size), 4-byte
frame headers (sync, version incl. MPEG-2 and the 2.5 extension,
layer, bitrate index, sample-rate index, padding, channel mode), the
Layer III frame-length formula ``samples/8 * bitrate / sample_rate +
padding`` (1152 samples/frame for MPEG-1, 576 for MPEG-2/2.5, with
the low-rate bitrate table), frame counting, and the exact
sample-count-derived duration. VBR files fall out naturally
(per-frame bitrates are read, the mean is reported); validated
against a REAL in-container MPEG-2 file in tests. The Huffman/
IMDCT/polyphase BITSTREAM decode stays at the documented ffmpeg seam
in ``operators/multimodal.py`` — the ISO synthesis-window and Huffman
tables are not reproducible from public memory with bit-exact
confidence, no reference decoder exists in this container to validate
against, and a codec with wrong tables would be MP3-shaped, not MP3.
"""

from __future__ import annotations

# Layer III bitrate tables (kbps), index 1..14; 0 = free, 15 = bad
_BITRATES_V1 = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_BITRATES_V2 = (
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
# sample-rate tables, index 0..2, keyed by version bits
_RATES_BY_VER = {
    0b11: (44100, 48000, 32000),  # MPEG-1
    0b10: (22050, 24000, 16000),  # MPEG-2
    0b00: (11025, 12000, 8000),  # MPEG-2.5
}
_RATES = _RATES_BY_VER[0b11]  # pre-r7 name (MPEG-1 table)
_VERSION_NAMES = {0b11: "MPEG-1", 0b10: "MPEG-2", 0b00: "MPEG-2.5"}
_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")
_BITRATES = _BITRATES_V1  # pre-r7 name (MPEG-1 table)


def _id3v2_size(payload: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none): header is
    'ID3' + version(2) + flags(1) + syncsafe size(4 x 7 bits)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = (
        (payload[6] & 0x7F) << 21
        | (payload[7] & 0x7F) << 14
        | (payload[8] & 0x7F) << 7
        | (payload[9] & 0x7F)
    )
    footer = 10 if payload[5] & 0x10 else 0
    return 10 + size + footer


def parse_mp3(payload: bytes) -> dict:
    """Walk every frame header: ``{"version", "sample_rate", "mode",
    "n_frames", "duration_ms" (exact, sample-count derived),
    "mean_bitrate_kbps" (per-frame mean — CBR files report their
    constant rate), "id3_bytes"}``. Raises ValueError on non-Layer-III
    sync, free-format bitrate, or a truncated final frame."""
    pos = _id3v2_size(payload)
    id3 = pos
    n_frames = 0
    version = None
    rate = None
    mode = None
    bitrate_sum = 0
    while pos + 4 <= len(payload):
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 == 0 and n_frames:
            break  # trailing padding after the last frame
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 frame sync at byte {pos}")
        ver = (b1 >> 3) & 0x03
        layer = (b1 >> 1) & 0x03
        if ver == 0b01 or layer != 0b01:
            raise ValueError(
                "only Layer III frames supported "
                f"(version bits {ver:02b}, layer bits {layer:02b})"
            )
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        padding = (b2 >> 1) & 0x01
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free-format/invalid bitrate or sample rate")
        table = _BITRATES_V1 if ver == 0b11 else _BITRATES_V2
        bitrate = table[br_idx] * 1000
        this_rate = _RATES_BY_VER[ver][sr_idx]
        if version is None:
            version = ver
            rate = this_rate
            mode = _MODES[(b3 >> 6) & 0x03]
        elif ver != version or this_rate != rate:
            raise ValueError("version/sample rate changes mid-stream")
        # samples/frame: 1152 (MPEG-1) or 576 (MPEG-2/2.5) -> the
        # frame-length coefficient samples/8 = 144 or 72
        coeff = 144 if ver == 0b11 else 72
        size = coeff * bitrate // this_rate + padding
        if pos + size > len(payload):
            raise ValueError("truncated final MP3 frame")
        bitrate_sum += table[br_idx]
        n_frames += 1
        pos += size
    if n_frames == 0:
        raise ValueError("no MP3 frames found")
    spf = 1152 if version == 0b11 else 576
    return {
        "version": _VERSION_NAMES[version],
        "sample_rate": rate,
        "mode": mode,
        "n_frames": n_frames,
        "duration_ms": n_frames * spf * 1000 // rate,
        "mean_bitrate_kbps": bitrate_sum // n_frames,
        "id3_bytes": id3,
    }


def encode_mp3_shell(
    n_frames: int,
    bitrate_idx: int = 9,
    rate_idx: int = 0,
    mode: int = 3,
    id3_padding: int = 0,
    version: int = 0b11,
) -> bytes:
    """A structurally valid CBR Layer III stream whose frame PAYLOADS
    are zeros — the parser's test oracle and the probe fixture
    generator (header walking never looks at payload bits; a real
    encoder would fill them with Huffman data). ``version`` takes the
    header bits: 0b11 MPEG-1 (default), 0b10 MPEG-2, 0b00 MPEG-2.5."""
    if not 1 <= bitrate_idx <= 14 or not 0 <= rate_idx <= 2:
        raise ValueError("bad bitrate/sample-rate index")
    if version not in _RATES_BY_VER:
        raise ValueError(f"bad version bits {version:#04b}")
    out = bytearray()
    if id3_padding:
        size = id3_padding
        out += b"ID3\x04\x00\x00" + bytes(
            [
                (size >> 21) & 0x7F,
                (size >> 14) & 0x7F,
                (size >> 7) & 0x7F,
                size & 0x7F,
            ]
        )
        out += b"\x00" * size
    hdr = bytes(
        [
            0xFF,
            0xE0 | (version << 3) | 0b010 | 1,  # version + Layer III + no CRC
            (bitrate_idx << 4) | (rate_idx << 2),
            (mode << 6),
        ]
    )
    table = _BITRATES_V1 if version == 0b11 else _BITRATES_V2
    coeff = 144 if version == 0b11 else 72
    size = coeff * (table[bitrate_idx] * 1000) // _RATES_BY_VER[version][rate_idx]
    frame = hdr + b"\x00" * (size - 4)
    return bytes(out) + frame * n_frames
