"""FLAC codec (sources/flac.py): lossless round-trips are the oracle —
decode(encode(pcm)) must be bit-identical for EVERY input, plus
corruption detection, subset-feature coverage, and a hypothesis sweep
(the LZW lesson: property rounds find boundary bugs directed tests
miss; any firing case gets pinned below as a regression)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flytemosaic_spark.sources.flac import (
    _BitReader,
    _BitWriter,
    _utf8_code,
    _utf8_decode,
    decode_flac,
    encode_flac,
)


def _rt(pcm: np.ndarray, bps: int = 16, **kw) -> None:
    enc = encode_flac(pcm, 16000, bps=bps, **kw)
    rate, dec = decode_flac(enc)
    ref = pcm if pcm.ndim == 2 else pcm[:, None]
    assert rate == 16000
    assert dec.shape == ref.shape
    assert (dec == ref).all()


class TestRoundTrip:
    def test_mono_random(self):
        rng = np.random.default_rng(1)
        _rt(rng.integers(-30000, 30000, 5000).astype(np.int16))

    def test_multi_frame(self):
        rng = np.random.default_rng(2)
        _rt(rng.integers(-30000, 30000, 10000).astype(np.int16),
            block_size=4096)

    def test_non_multiple_final_frame(self):
        rng = np.random.default_rng(3)
        _rt(rng.integers(-100, 100, 1000).astype(np.int16), block_size=256)

    def test_stereo_auto(self):
        rng = np.random.default_rng(4)
        _rt(rng.integers(-5000, 5000, (5000, 2)).astype(np.int16))

    @pytest.mark.parametrize(
        "mode", ["independent", "left_side", "right_side", "mid_side"]
    )
    def test_stereo_modes(self, mode):
        rng = np.random.default_rng(5)
        base = np.cumsum(rng.integers(-40, 40, 3000))
        pcm = np.stack(
            [base, base + rng.integers(-5, 5, 3000)], axis=1
        ).clip(-32000, 32000).astype(np.int16)
        _rt(pcm, channel_mode=mode)

    def test_constant_subframe(self):
        _rt(np.full(2000, -123, np.int16))

    def test_ramp_fixed_predictor(self):
        _rt((np.arange(5000) % 10000 - 5000).astype(np.int16))

    def test_sine_lpc(self):
        _rt((8000 * np.sin(np.arange(8000) * 0.05)).astype(np.int16))

    def test_8bit(self):
        rng = np.random.default_rng(6)
        _rt(rng.integers(-128, 128, 777).astype(np.int8), bps=8)

    def test_wasted_bits(self):
        rng = np.random.default_rng(7)
        _rt((rng.integers(-100, 100, 1500) * 8).astype(np.int16))

    @pytest.mark.parametrize("p", [0, 1, 2, 3, 4])
    def test_partition_orders(self, p):
        rng = np.random.default_rng(8)
        _rt(rng.integers(-3000, 3000, 4096).astype(np.int16),
            partition_order=p)

    def test_single_sample(self):
        _rt(np.array([5], np.int16))

    def test_extreme_values(self):
        _rt(np.array([-32768, 32767, -32768, 32767, 0] * 100, np.int16))

    def test_alternating_full_scale(self):
        # worst-case residuals: forces escape (raw) partitions
        pcm = np.empty(1000, np.int16)
        pcm[::2], pcm[1::2] = -32768, 32767
        _rt(pcm)

    def test_four_channels_independent(self):
        rng = np.random.default_rng(9)
        _rt(rng.integers(-1000, 1000, (2000, 4)).astype(np.int16))

    def test_lpc_disabled(self):
        rng = np.random.default_rng(10)
        _rt(rng.integers(-100, 100, 2000).astype(np.int16), lpc_order=0)


class TestStreamStructure:
    def test_magic_and_streaminfo(self):
        enc = encode_flac(np.zeros(100, np.int16), 44100)
        assert enc[:4] == b"fLaC"
        assert enc[4] == 0x80  # last-metadata flag + type 0
        rate, dec = decode_flac(enc)
        assert rate == 44100

    def test_compression_on_predictable_signal(self):
        pcm = (1000 * np.sin(np.arange(20000) * 0.01)).astype(np.int16)
        enc = encode_flac(pcm, 16000)
        assert len(enc) < pcm.nbytes / 3  # LPC should crush a sine

    def test_frame_crc16_detects_corruption(self):
        rng = np.random.default_rng(11)
        enc = bytearray(
            encode_flac(rng.integers(-1000, 1000, 4000).astype(np.int16),
                        16000)
        )
        enc[len(enc) - 10] ^= 0x40  # flip a bit inside the last frame
        with pytest.raises(ValueError):
            decode_flac(bytes(enc))

    def test_md5_guard(self):
        # zeroed MD5 means "unknown" and must be accepted
        enc = bytearray(encode_flac(np.arange(50, dtype=np.int16), 16000))
        # STREAMINFO md5 lives at bytes 8+18 .. 8+34
        enc[8 + 18 : 8 + 34] = b"\x00" * 16
        rate, dec = decode_flac(bytes(enc))
        assert (dec[:, 0] == np.arange(50)).all()

    def test_not_flac_raises(self):
        with pytest.raises(ValueError):
            decode_flac(b"RIFFxxxxWAVE")

    def test_range_check(self):
        with pytest.raises(ValueError):
            encode_flac(np.array([300], np.int16), 16000, bps=8)


class TestPrimitives:
    @pytest.mark.parametrize(
        "n", [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF,
              0x3FFFFFF, 0x7FFFFFFF, (1 << 36) - 1]
    )
    def test_utf8_code_roundtrip(self, n):
        br = _BitReader(_utf8_code(n) + b"\x00")
        assert _utf8_decode(br) == n

    def test_bitio_roundtrip(self):
        rng = np.random.default_rng(12)
        vals = [(int(rng.integers(0, 1 << b)), b)
                for b in rng.integers(1, 30, 200)]
        bw = _BitWriter()
        for v, b in vals:
            bw.write(v, int(b))
        bw.align()
        br = _BitReader(bw.getvalue())
        for v, b in vals:
            assert br.read(int(b)) == v

    def test_unary_roundtrip(self):
        bw = _BitWriter()
        qs = [0, 1, 7, 8, 31, 32, 33, 100, 0]
        for q in qs:
            bw.write_unary(q)
        bw.align()
        br = _BitReader(bw.getvalue())
        for q in qs:
            assert br.read_unary() == q


@settings(max_examples=40, deadline=None)
@given(
    data=st.lists(st.integers(-32768, 32767), min_size=1, max_size=700),
    stereo=st.booleans(),
    block_size=st.sampled_from([192, 256, 576]),
    part_order=st.integers(0, 3),
)
def test_property_roundtrip(data, stereo, block_size, part_order):
    pcm = np.asarray(data, np.int16)
    if stereo:
        pcm = np.stack([pcm, pcm[::-1]], axis=1)
    enc = encode_flac(
        pcm, 8000, block_size=block_size, partition_order=part_order
    )
    _, dec = decode_flac(enc)
    ref = pcm if pcm.ndim == 2 else pcm[:, None]
    assert (dec == ref).all()


def test_audio_seam_downmix():
    """_decode_audio routes fLaC magic and downmixes like WAV
    (mean then truncate toward zero)."""
    from flytemosaic_spark.operators.multimodal import _decode_audio

    pcm = np.array([[100, 51], [-100, -51], [7, 8]], np.int16)
    enc = encode_flac(pcm, 22050)
    rate, mono = _decode_audio(enc)
    assert rate == 22050
    expect = pcm.astype(np.float64).mean(axis=1).astype(np.int16)
    assert (mono == expect).all()
