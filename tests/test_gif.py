"""GIF codec (sources/gif.py): exact-palette encode is the decode
oracle (lossless through LZW/palette/interlace), plus animation
compositing semantics and the honesty gates."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flytemosaic_spark.sources.gif import (
    _lzw_decode_gif,
    _lzw_encode_gif,
    decode_gif,
    encode_gif,
)


def _pal_frame(rng, n_colors, h, w):
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, (h, w))]


class TestRoundTrip:
    def test_single_frame(self):
        rng = np.random.default_rng(0)
        f = _pal_frame(rng, 7, 33, 47)
        frames, meta = decode_gif(encode_gif(f))
        assert frames.shape == (1, 33, 47, 4)
        assert (frames[0, :, :, :3] == f).all()
        assert (frames[0, :, :, 3] == 255).all()
        assert meta["width"] == 47 and meta["height"] == 33

    def test_interlaced(self):
        rng = np.random.default_rng(1)
        for h in (1, 4, 7, 8, 9, 33):
            f = _pal_frame(rng, 5, h, 13)
            frames, _ = decode_gif(encode_gif(f, interlace=True))
            assert (frames[0, :, :, :3] == f).all(), h

    def test_256_colors_code_growth(self):
        # a full 256-entry palette pushes LZW codes past 9 bits
        rng = np.random.default_rng(2)
        gray = rng.integers(0, 256, (64, 64, 1), dtype=np.uint8)
        f = gray.repeat(3, 2)
        frames, _ = decode_gif(encode_gif(f))
        assert (frames[0, :, :, :3] == f).all()

    def test_lzw_table_reset(self):
        # >4096 table entries force a mid-stream clear code
        rng = np.random.default_rng(3)
        f = _pal_frame(rng, 7, 200, 300)
        frames, _ = decode_gif(encode_gif(f))
        assert (frames[0, :, :, :3] == f).all()

    def test_two_color_minimum_palette(self):
        bw = np.zeros((10, 10, 3), np.uint8)
        bw[::2] = 255
        frames, _ = decode_gif(encode_gif(bw))
        assert (frames[0, :, :, :3] == bw).all()

    def test_animation_delays_and_loop(self):
        rng = np.random.default_rng(4)
        pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
        anim = [pal[rng.integers(0, 6, (20, 30))] for _ in range(5)]
        frames, meta = decode_gif(encode_gif(anim, delay_cs=8, loop=3))
        assert meta["n_frames"] == 5
        assert meta["loop"] == 3
        assert meta["delays_cs"] == [8] * 5
        for i in range(5):
            assert (frames[i, :, :, :3] == anim[i]).all()


class TestAnimationSemantics:
    def _gif_with_partial_frame(self, disposal: int) -> bytes:
        """Hand-build: full 8x8 red frame, then a 4x4 green patch at
        (2,2) with the given disposal, then a 1x1 transparent-only
        frame to snapshot the post-disposal screen."""
        import struct

        pal = b"\xff\x00\x00" + b"\x00\xff\x00" + b"\x00\x00\xff" + b"\x00\x00\x00"
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", 8, 8, 0x80 | 0x01, 0, 0)  # 4-color GCT
        out += pal

        def frame(left, top, w, h, color_idx, disposal, transparent=None):
            o = bytearray()
            flags = (disposal << 2) | (1 if transparent is not None else 0)
            o += b"\x21\xf9\x04" + bytes([flags]) + b"\x00\x00"
            o += bytes([transparent if transparent is not None else 0])
            o += b"\x00"
            o += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
            idx = bytes([color_idx]) * (w * h)
            from flytemosaic_spark.sources.gif import _lzw_encode_gif

            comp = _lzw_encode_gif(idx, 2)
            o.append(2)
            for i in range(0, len(comp), 255):
                c = comp[i : i + 255]
                o.append(len(c))
                o += c
            o.append(0)
            return o

        out += frame(0, 0, 8, 8, 0, 0)  # red screen
        out += frame(2, 2, 4, 4, 1, disposal)  # green patch
        out += frame(0, 0, 1, 1, 3, 0, transparent=3)  # no-op snapshot
        out += b"\x3b"
        return bytes(out)

    def test_disposal_none_leaves_patch(self):
        frames, _ = decode_gif(self._gif_with_partial_frame(1))
        assert (frames[1, 3, 3, :3] == [0, 255, 0]).all()
        assert (frames[2, 3, 3, :3] == [0, 255, 0]).all()

    def test_disposal_background_clears_patch(self):
        frames, _ = decode_gif(self._gif_with_partial_frame(2))
        assert (frames[1, 3, 3, :3] == [0, 255, 0]).all()
        assert frames[2, 3, 3, 3] == 0  # transparent after restore

    def test_disposal_previous_restores_red(self):
        frames, _ = decode_gif(self._gif_with_partial_frame(3))
        assert (frames[1, 3, 3, :3] == [0, 255, 0]).all()
        assert (frames[2, 3, 3, :3] == [255, 0, 0]).all()

    def test_transparent_pixels_show_through(self):
        frames, _ = decode_gif(self._gif_with_partial_frame(1))
        # frame 3 is a 1x1 transparent-only image: pixel (0,0) keeps red
        assert (frames[2, 0, 0, :3] == [255, 0, 0]).all()


class TestHonesty:
    def test_too_many_colors(self):
        rng = np.random.default_rng(5)
        with pytest.raises(NotImplementedError, match="256"):
            encode_gif(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))

    def test_not_a_gif(self):
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"PNG?" + b"\0" * 20)

    def test_seam_routes_gif(self):
        from flytemosaic_spark.operators.multimodal import _decode_payload

        rng = np.random.default_rng(6)
        f = _pal_frame(rng, 5, 12, 15)
        dec = _decode_payload(encode_gif(f))
        assert dec.shape == (12, 15, 4)
        assert (dec[:, :, :3] == f).all()


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(st.integers(0, 6), min_size=1, max_size=500),
    mcs=st.integers(3, 8),
)
def test_lzw_property_roundtrip(data, mcs):
    raw = bytes(data)
    assert bytes(_lzw_decode_gif(_lzw_encode_gif(raw, mcs), mcs)) == raw


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    n_colors=st.integers(1, 9),
    interlace=st.booleans(),
    seed=st.integers(0, 10_000),
)
def test_property_image_roundtrip(w, h, n_colors, interlace, seed):
    rng = np.random.default_rng(seed)
    f = _pal_frame(rng, n_colors, h, w)
    frames, _ = decode_gif(encode_gif(f, interlace=interlace))
    assert (frames[0, :, :, :3] == f).all()
