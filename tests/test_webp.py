"""WebP VP8L codec (sources/webp.py): lossless round-trips over every
encoder/decoder path combination, the spec-pinned 2-D distance map,
container handling, and the documented VP8-lossy seam."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flytemosaic_spark.sources.webp import (
    _DIST_MAP,
    _dist_to_plane,
    _plane_to_dist,
    _prefix_decode,
    _prefix_encode2,
    _BitReader,
    _BitWriter,
    decode_webp,
    encode_webp,
)


def _rng():
    return np.random.default_rng(7)


def _cases():
    rng = _rng()
    return {
        "random": rng.integers(0, 256, (13, 17, 4), dtype=np.uint8),
        "flat": np.full((8, 8, 4), 200, np.uint8),
        "repetitive": np.tile(
            rng.integers(0, 256, (1, 5, 4), dtype=np.uint8), (20, 8, 1)
        ),
        "gradient": np.stack(
            np.meshgrid(np.arange(32), np.arange(24), indexing="ij"), -1
        ).astype(np.uint8).repeat(2, -1),
        "1x1": rng.integers(0, 256, (1, 1, 4), dtype=np.uint8),
        "tall_rep": np.tile(
            rng.integers(0, 256, (3, 40, 4), dtype=np.uint8), (30, 1, 1)
        ),
    }


_OPTS = [
    dict(use_lz77=False),
    dict(use_lz77=True),
    dict(use_lz77=True, cache_bits=4),
    dict(use_lz77=True, cache_bits=8),
    dict(subtract_green=True),
    dict(predictor_mode=2),
    dict(predictor_mode=11),
    dict(predictor_mode=12),
    dict(predictor_mode=13),
    dict(subtract_green=True, predictor_mode=7, use_lz77=True,
         cache_bits=3),
]


class TestRoundTrip:
    @pytest.mark.parametrize("opt", range(len(_OPTS)))
    def test_all_shapes(self, opt):
        for name, arr in _cases().items():
            back = decode_webp(encode_webp(arr, **_OPTS[opt]))
            assert np.array_equal(back, arr), (name, opt)

    @pytest.mark.parametrize("ncolors", [2, 4, 16, 200])
    def test_palette(self, ncolors):
        rng = _rng()
        g = (
            rng.integers(0, ncolors, (11, 13))
            * (255 // max(ncolors - 1, 1))
        ).astype(np.uint8)
        arr = np.stack([g, g // 2, 255 - g, np.full_like(g, 255)], -1)
        back = decode_webp(encode_webp(arr, palette=True))
        assert np.array_equal(back, arr)

    def test_alpha_channel_preserved(self):
        rng = _rng()
        arr = rng.integers(0, 256, (9, 9, 4), dtype=np.uint8)
        arr[..., 3] = rng.integers(0, 255, (9, 9), dtype=np.uint8)
        assert np.array_equal(decode_webp(encode_webp(arr)), arr)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.integers(0, 2**32 - 1),
    st.sampled_from([0, 1, 2, 3]),
)
def test_property_round_trip(h, w, seed, mode):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    kw = [
        dict(use_lz77=False),
        dict(use_lz77=True, cache_bits=5),
        dict(subtract_green=True, use_lz77=True),
        dict(predictor_mode=7),
    ][mode]
    assert np.array_equal(decode_webp(encode_webp(arr, **kw)), arr)


class TestDistanceMap:
    def test_spec_prefix_pinned(self):
        # the first 40 entries of the spec's published table
        spec = [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
            (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
            (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
            (-3, 2), (0, 4), (4, 0), (1, 4), (-1, 4), (4, 1), (-4, 1),
            (3, 3), (-3, 3), (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5),
            (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
        ]
        assert _DIST_MAP[:40] == spec
        assert len(_DIST_MAP) == 120
        assert len(set(_DIST_MAP)) == 120

    def test_plane_round_trip(self):
        for xsize in (1, 7, 64, 500):
            for dist in list(range(1, 60)) + [xsize, 3 * xsize + 2, 999]:
                plane = _dist_to_plane(dist, xsize)
                assert _plane_to_dist(plane, xsize) == dist, (xsize, dist)


class TestPrefixCoding:
    def test_round_trip_all_values(self):
        for v in list(range(1, 300)) + [1024, 4095, 4096]:
            code, extra, ebits = _prefix_encode2(v)
            bw = _BitWriter()
            bw.write(extra, ebits)
            br = _BitReader(bw.finish() + b"\x00")
            assert _prefix_decode(code, br) == v, v
            assert 0 <= code < 40


class TestContainer:
    def test_not_riff(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_webp(b"JUNKJUNKJUNKJUNK")

    def test_vp8x_wrapped_vp8l_found(self):
        import struct

        arr = _rng().integers(0, 256, (4, 4, 4), dtype=np.uint8)
        f = encode_webp(arr)
        vp8l = f[12:]
        vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
        riff = b"RIFF" + struct.pack(
            "<I", 4 + len(vp8x) + len(vp8l)
        ) + b"WEBP" + vp8x + vp8l
        assert np.array_equal(decode_webp(riff), arr)

    def test_vp8_lossy_is_a_named_seam(self):
        import struct

        riff = (
            b"RIFF" + struct.pack("<I", 16) + b"WEBP"
            + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        )
        with pytest.raises(NotImplementedError, match="VP8 lossy"):
            decode_webp(riff)

    def test_corrupt_payload_fails_loudly(self):
        arr = _rng().integers(0, 256, (6, 6, 4), dtype=np.uint8)
        f = bytearray(encode_webp(arr))
        f[22] ^= 0xFF
        with pytest.raises((ValueError, IndexError)):
            out = decode_webp(bytes(f))
            # a silent wrong decode is the only unacceptable outcome
            assert not np.array_equal(out, arr)


class TestWebdatasetIntegration:
    def test_webp_member_decodes_in_shard(self, spark):
        import numpy as np

        from flytemosaic_spark.operators.multimodal import (
            webdataset_sample_stats,
        )
        from flytemosaic_spark.sources.webdataset import write_shard
        from flytemosaic_spark.sources.webp import encode_webp

        arr = np.full((8, 8, 4), 120, np.uint8)
        arr[..., 3] = 255
        shard = write_shard(
            [("000000", {"cls": b"3", "txt": b"hello", "webp":
                         encode_webp(arr)})]
        )
        df = spark.createDataFrame(
            [(1, shard)], "media_id long, payload binary"
        )
        rows = webdataset_sample_stats(df).collect()
        assert len(rows) == 1
        want = int(np.mean(arr.astype(np.float64)))
        assert rows[0]["mean_px"] == want
        assert rows[0]["cls"] == 3


class TestMutationFuzz:
    def test_never_hangs_or_overallocates(self):
        import random

        random.seed(5)
        rng = _rng()
        arr = rng.integers(0, 256, (12, 12, 4), dtype=np.uint8)
        base = encode_webp(arr, use_lz77=True, cache_bits=4)
        for _ in range(300):
            f = bytearray(base)
            for _ in range(random.randint(1, 4)):
                f[random.randrange(12, len(f))] ^= 1 << random.randrange(8)
            try:
                out = decode_webp(bytes(f))
                assert out.shape[2] == 4  # decoded something sane
            except (ValueError, IndexError, NotImplementedError):
                pass  # loud structured failure is fine; hanging is not


class TestMetaHuffmanAndColorTransform:
    """Decoder paths the basic matrix can't reach: per-group meta
    prefix codes and the color transform, round-tripped through the
    bitstream."""

    @pytest.mark.parametrize("kw", [
        dict(meta_groups=2),
        dict(color_transform=(10, -5, 3)),
        dict(color_transform=(127, -128, 64), subtract_green=True),
        dict(color_transform=(10, 20, 30), meta_groups=2),
    ])
    def test_round_trip(self, kw):
        rng = _rng()
        for shape in ((13, 17, 4), (1, 1, 4), (3, 5, 4), (32, 24, 4)):
            arr = rng.integers(0, 256, shape, dtype=np.uint8)
            assert np.array_equal(
                decode_webp(encode_webp(arr, **kw)), arr
            ), (shape, kw)

    def test_color_transform_changes_bytes(self):
        # the transform must actually be in the stream, not a no-op
        rng = _rng()
        arr = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
        assert encode_webp(arr) != encode_webp(
            arr, color_transform=(33, -7, 12)
        )
