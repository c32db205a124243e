"""Baseline JPEG codec (sources/jpeg.py): round-trip error bounds,
exactness on DC-only images, restart markers, abbreviated
(JPEGTables-style) streams, subsampling, and the honesty contract for
unsupported variants. JPEG is lossy, so unlike the deflate/LZW tiers
the tests assert reconstruction bounds, not bit equality."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flytemosaic_spark.sources.jpeg import decode_jpeg, encode_jpeg


def _smooth(h=70, w=100):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return (128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0)).astype(
        np.uint8
    )


def _rgb(h=70, w=100):
    g = _smooth(h, w)
    return np.stack([g, 255 - g, g[::-1]], axis=-1).astype(np.uint8)


class TestRoundTrip:
    def test_flat_gray_is_exact(self):
        # a constant image is DC-only: quantization cannot lose it
        flat = np.full((24, 33), 77, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(flat, quality=95))
        assert out.shape == (24, 33, 1)
        assert np.array_equal(out[:, :, 0], flat)

    def test_smooth_gray_error_bound(self):
        img = _smooth()
        out = decode_jpeg(encode_jpeg(img, quality=92))
        err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
        assert err.mean() < 1.0 and err.max() <= 8

    def test_rgb_444_error_bound(self):
        rgb = _rgb()
        out = decode_jpeg(encode_jpeg(rgb, quality=92))
        err = np.abs(out.astype(int) - rgb.astype(int))
        assert err.mean() < 2.0 and err.max() <= 16

    def test_rgb_420_subsampled(self):
        rgb = _rgb()
        out = decode_jpeg(encode_jpeg(rgb, quality=92, subsample=True))
        err = np.abs(out.astype(int) - rgb.astype(int))
        assert out.shape == rgb.shape
        assert err.mean() < 5.0  # chroma halved: looser bound

    def test_non_multiple_of_8_dims(self):
        img = _smooth(17, 19)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == (17, 19, 1)

    def test_quality_monotone(self):
        img = _smooth()
        errs = []
        for q in (30, 60, 90):
            out = decode_jpeg(encode_jpeg(img, quality=q))
            errs.append(
                np.abs(out[:, :, 0].astype(int) - img.astype(int)).mean()
            )
        assert errs[0] >= errs[1] >= errs[2]


class TestStreamFeatures:
    def test_restart_markers_decode_identically(self):
        rgb = _rgb()
        with_rst = encode_jpeg(rgb, quality=92, restart_interval=3)
        assert b"\xff\xdd" in with_rst  # DRI segment present
        assert any(
            bytes([0xFF, 0xD0 + k]) in with_rst for k in range(8)
        )
        assert np.array_equal(
            decode_jpeg(with_rst), decode_jpeg(encode_jpeg(rgb, quality=92))
        )

    def test_abbreviated_tables_stream(self):
        # TIFF JPEGTables: DQT/DHT live in a separate tables-only
        # stream; the per-tile stream has only SOF/SOS
        full = encode_jpeg(_smooth(), quality=90)
        tables, body = bytearray(b"\xff\xd8"), bytearray(b"\xff\xd8")
        off = 2
        while off < len(full):
            m = full[off + 1]
            if m == 0xD9:
                break
            (ln,) = struct.unpack_from(">H", full, off + 2)
            seg = full[off : off + 2 + ln]
            if m in (0xDB, 0xC4):
                tables += seg
            else:
                body += seg
                if m == 0xDA:
                    body += full[off + 2 + ln :]
                    break
            off += 2 + ln
        tables += b"\xff\xd9"
        assert np.array_equal(
            decode_jpeg(bytes(body), tables=bytes(tables)),
            decode_jpeg(full),
        )

    def test_missing_tables_raise(self):
        full = encode_jpeg(_smooth(), quality=90)
        body = bytearray(b"\xff\xd8")
        off = 2
        while off < len(full):
            m = full[off + 1]
            (ln,) = struct.unpack_from(">H", full, off + 2)
            if m not in (0xDB, 0xC4):
                body += full[off : off + 2 + ln]
                if m == 0xDA:
                    body += full[off + 2 + ln :]
                    break
            off += 2 + ln
        with pytest.raises(ValueError, match="missing"):
            decode_jpeg(bytes(body))


class TestProgressive:
    def test_bit_identical_to_baseline(self):
        # baseline and progressive quantize identically, so decodes
        # must match BIT FOR BIT — one oracle covering every scan
        # type: DC first/refine, AC first/refine, EOB runs (flat
        # image), ZRL in refinement (noise at low quality)
        rng = np.random.default_rng(7)
        g = _smooth()
        rgb = _rgb()
        cases = [
            (g, {}),
            (np.full((24, 33), 77, np.uint8), {}),  # all-EOB runs
            (rng.integers(0, 256, (40, 56)).astype(np.uint8), {}),
            (rgb, {}),
            (rgb, {"subsample": True}),
            (rng.integers(0, 256, (17, 19)).astype(np.uint8), {}),
            (
                np.ascontiguousarray(rgb[:47, :63]),
                {"subsample": True},  # odd dims + non-interleaved grid
            ),
        ]
        for img, kw in cases:
            for q in (35, 88, 97):
                base = decode_jpeg(encode_jpeg(img, quality=q, **kw))
                prog = decode_jpeg(
                    encode_jpeg(img, quality=q, progressive=True, **kw)
                )
                assert np.array_equal(base, prog)

    def test_progressive_stream_is_sof2_multiscan(self):
        p = encode_jpeg(_smooth(), quality=90, progressive=True)
        assert b"\xff\xc2" in p and b"\xff\xc0" not in p
        assert p.count(b"\xff\xda") >= 4  # DC x2 + AC x2 scans

    def test_progressive_restart_not_encodable(self):
        with pytest.raises(NotImplementedError, match="restart"):
            encode_jpeg(
                _smooth(), progressive=True, restart_interval=2
            )


class TestHonesty:
    def test_unsupported_sof_rejected(self):
        p = bytearray(encode_jpeg(_smooth(), quality=90))
        i = p.find(b"\xff\xc0")
        p[i + 1] = 0xC9  # claim arithmetic-coded SOF9
        with pytest.raises(NotImplementedError, match="SOF9"):
            decode_jpeg(bytes(p))

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="not a JPEG"):
            decode_jpeg(b"\x89PNG\r\n\x1a\n" + b"\0" * 16)

    def test_encode_rejects_other_dtypes(self):
        # uint16 is now the 12-bit path; float/int32 still reject
        with pytest.raises(NotImplementedError, match="uint8"):
            encode_jpeg(np.zeros((8, 8), dtype=np.float32))
        with pytest.raises(NotImplementedError, match="uint8"):
            encode_jpeg(np.zeros((8, 8), dtype=np.int32))
        with pytest.raises(NotImplementedError, match="channels"):
            encode_jpeg(np.zeros((8, 8, 4), dtype=np.uint8))


class Test12Bit:
    """12-bit sample streams (SOF precision 12, 16-bit DQT, uint16
    in/out) — the GDAL 12-bit-in-JPEG TIFF convention."""

    def test_constant_blocks_exact_at_q100(self):
        for v in (0, 100, 2048, 4095):
            a = np.full((24, 32, 1), v, np.uint16)
            dec = decode_jpeg(encode_jpeg(a, quality=100))
            assert dec.dtype == np.uint16
            assert (dec == v).all()

    def test_noise_bounded_at_q100(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 4096, (40, 56, 1)).astype(np.uint16)
        dec = decode_jpeg(encode_jpeg(a, quality=100))
        assert np.abs(dec.astype(int) - a.astype(int)).max() <= 2

    def test_full_scale_checkerboard_max_ac_magnitudes(self):
        # worst-case AC coefficients exercise the extended (size>10)
        # Huffman symbols the 8-bit Annex K tables cannot express
        a = np.zeros((16, 16, 1), np.uint16)
        a[::2, 1::2] = 4095
        a[1::2, ::2] = 4095
        dec = decode_jpeg(encode_jpeg(a, quality=100))
        assert (dec == a).all()

    def test_rgb_and_restart_markers(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 4096, (24, 24, 3)).astype(np.uint16)
        dec = decode_jpeg(encode_jpeg(a, quality=100))
        assert dec.shape == a.shape and dec.dtype == np.uint16
        assert np.abs(dec.astype(int) - a.astype(int)).max() <= 3
        g = rng.integers(0, 4096, (32, 88, 1)).astype(np.uint16)
        dec = decode_jpeg(encode_jpeg(g, quality=100, restart_interval=3))
        assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2

    def test_range_and_progressive_rejected(self):
        with pytest.raises(ValueError):
            encode_jpeg(np.full((8, 8, 1), 4096, np.uint16))
        with pytest.raises(NotImplementedError):
            encode_jpeg(
                np.zeros((8, 8, 1), np.uint16), progressive=True
            )

    def test_12bit_jpeg_in_tiff(self):
        from flytemosaic_spark.sources.geotiff import (
            decode_geotiff,
            encode_geotiff,
        )

        rng = np.random.default_rng(2)
        a = (rng.integers(0, 256, (70, 90, 1)) * 16).astype(np.uint16)
        enc = encode_geotiff(a, tile=32, compress="jpeg", jpeg_quality=100)
        dec, _ = decode_geotiff(enc)
        assert dec.dtype == np.uint16
        assert np.abs(dec.astype(int) - a.astype(int)).max() <= 1
        win, _ = decode_geotiff(enc, window=(10, 20, 30, 40))
        assert (win == dec[10:40, 20:60]).all()
