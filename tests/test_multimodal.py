"""Multimodal binary-column plumbing: decode/resize/frame-sample/embed
via Arrow-batched mapInPandas over the deterministic FAKE container,
and the clearly-marked codec seam (NotImplementedError for real
formats)."""

from __future__ import annotations

import numpy as np
import pytest

from flytemosaic_spark.operators.multimodal import (
    _decode_payload,
    _fake_payload,
    decode_stats,
    embed_media,
    frame_sample,
    resize,
    synthesize_media,
)


def test_codec_seam_raises_for_real_formats():
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG\r\n...")


def test_decode_stats_matches_numpy(spark):
    media = synthesize_media(spark, n=16)
    got = {r.media_id: r for r in decode_stats(media).collect()}
    assert len(got) == 16
    for mid in (0, 7, 15):
        arr = _decode_payload(_fake_payload(mid, got[mid].width, got[mid].height, got[mid].channels))
        assert got[mid].mean_px == pytest.approx(float(arr.mean()))
        assert got[mid].std_px == pytest.approx(float(arr.std()))


def test_resize_shapes(spark):
    media = synthesize_media(spark, n=8)
    out = resize(media, 16, 12).collect()
    for r in out:
        arr = _decode_payload(bytes(r.payload))
        assert arr.shape[:2] == (12, 16)
        assert r.width == 16 and r.height == 12


def test_frame_sample_halves_rows(spark):
    media = synthesize_media(spark, n=8)
    before = {r.media_id: r.height for r in media.collect()}
    for r in frame_sample(media, every=2).collect():
        assert r.height == -(-before[r.media_id] // 2)


def test_embed_deterministic(spark):
    media = synthesize_media(spark, n=8)
    a = {r.media_id: list(r.embedding) for r in embed_media(media, dim=8).collect()}
    b = {r.media_id: list(r.embedding) for r in embed_media(media, dim=8).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    assert np.std([v[0] for v in a.values()]) > 0  # not all identical


def test_extract_patches_matches_numpy(spark):
    """Patch pooling over the binary payload path equals direct numpy
    reshape pooling on the decoded arrays."""
    import numpy as np

    from flytemosaic_spark.operators.multimodal import (
        _decode_payload,
        extract_patches,
        synthesize_media,
    )

    media = synthesize_media(spark, n=8).cache()
    got = {
        (r.media_id, r.py, r.px): (r.mean_px, r.max_px)
        for r in extract_patches(media, patch=4).collect()
    }
    for row in media.collect():
        arr = _decode_payload(bytes(row.payload))
        h, w, c = arr.shape
        gh, gw = h // 4, w // 4
        tiles = arr[: gh * 4, : gw * 4].reshape(gh, 4, gw, 4, c).astype(float)
        means = tiles.mean(axis=(1, 3, 4))
        maxes = tiles.max(axis=(1, 3, 4))
        for py in range(gh):
            for px in range(gw):
                m, mx = got[(row.media_id, py, px)]
                assert abs(m - means[py, px]) < 1e-12
                assert mx == int(maxes[py, px])
    media.unpersist()


def test_audio_vad_matches_numpy(spark):
    import numpy as np
    from flytemosaic_spark.operators.multimodal import (
        _decode_audio,
        _fake_audio_payload,
        frame_energy_vad,
        synthesize_audio,
    )

    out = {
        r["media_id"]: r
        for r in frame_energy_vad(synthesize_audio(spark, n=8)).collect()
    }
    for mid in range(8):
        rate, samples = _decode_audio(_fake_audio_payload(mid))
        n_frames = samples.size // 400
        fr = samples[: n_frames * 400].astype(np.float64).reshape(n_frames, 400)
        energy = (fr * fr).mean(axis=1)
        voiced = energy > 1.0e6
        longest = run = 0
        for v in voiced:
            run = run + 1 if v else 0
            longest = max(longest, run)
        r = out[mid]
        assert r["sample_rate"] == rate == 16000
        assert r["n_frames"] == n_frames
        assert r["n_voiced"] == int(voiced.sum())
        assert r["longest_voiced_run"] == longest
        # synthesized clips alternate loud/quiet: both classes present
        assert 0 < r["n_voiced"] < r["n_frames"]


def test_audio_vad_rejects_unknown_container(spark):
    import pytest
    from flytemosaic_spark.operators.multimodal import frame_energy_vad

    bad = spark.createDataFrame(
        [(1, bytearray(b"RIFFxxxx"))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|stubbed"):
        frame_energy_vad(bad).collect()


class TestRealPngCodec:
    def _roundtrip(self, arr):
        from flytemosaic_spark.operators.multimodal import (
            _decode_png,
            _encode_png,
        )

        return _decode_png(_encode_png(arr))

    def test_roundtrip_all_color_types(self):
        rng = np.random.default_rng(3)
        for ch in (1, 2, 3, 4):
            arr = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
            assert np.array_equal(self._roundtrip(arr), arr), ch

    def test_all_five_unfilters(self):
        # hand-build a PNG whose rows use filters 0..4 and check the
        # decoder against an independent reference (filters applied
        # forward here, decoder must invert them)
        import struct
        import zlib

        from flytemosaic_spark.operators.multimodal import (
            _decode_png,
            _paeth,
        )

        rng = np.random.default_rng(9)
        h, w, ch = 5, 7, 3
        img = rng.integers(0, 256, size=(h, w * ch), dtype=np.int64)
        body = bytearray()
        prev = np.zeros(w * ch, dtype=np.int64)
        for y in range(h):
            ft = y % 5
            body.append(ft)
            row = img[y]
            enc = np.zeros(w * ch, dtype=np.int64)
            for i in range(w * ch):
                left = row[i - ch] if i >= ch else 0
                upleft = prev[i - ch] if i >= ch else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = left
                elif ft == 2:
                    pred = prev[i]
                elif ft == 3:
                    pred = (left + prev[i]) // 2
                else:
                    pred = _paeth(int(left), int(prev[i]), int(upleft))
                enc[i] = (row[i] - pred) % 256
            body.extend(int(v) for v in enc)
            prev = row

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(body)))
            + chunk(b"IEND", b"")
        )
        got = _decode_png(png)
        assert np.array_equal(got, img.reshape(h, w, ch).astype(np.uint8))

    def test_decode_payload_routes_png(self):
        rng = np.random.default_rng(5)
        from flytemosaic_spark.operators.multimodal import _encode_png

        arr = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
        assert np.array_equal(_decode_payload(_encode_png(arr)), arr)

    def test_unsupported_png_depth_raises(self):
        import struct
        import zlib

        from flytemosaic_spark.operators.multimodal import _decode_png

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        # depth 16 is supported now; bit depth 1 (bilevel) is not
        png1 = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 1, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 4))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError, match="depth=1"):
            _decode_png(png1)

    def test_decode_stats_over_png_payloads(self, spark):
        # the decode/feature pipeline runs unchanged on REAL payloads
        import pandas as pd  # noqa: F401

        from flytemosaic_spark.operators.multimodal import _encode_png

        rng = np.random.default_rng(7)
        rows = []
        arrs = {}
        for i in range(6):
            arr = rng.integers(0, 256, size=(10 + i, 12, 3), dtype=np.uint8)
            arrs[i] = arr
            rows.append((i, "image", bytearray(_encode_png(arr)), 12, 10 + i, None, None))
        from flytemosaic_spark.schemas import MEDIA

        media = spark.createDataFrame(rows, MEDIA)
        got = {r.media_id: r for r in decode_stats(media).collect()}
        for i, arr in arrs.items():
            assert got[i].height == arr.shape[0]
            assert got[i].width == arr.shape[1]


class TestRealWavCodec:
    def _wav_bytes(self, samples, rate=16000, nch=1):
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(samples.astype(np.int16).tobytes())
        return buf.getvalue()

    def test_wav_roundtrip(self):
        from flytemosaic_spark.operators.multimodal import _decode_audio

        rng = np.random.default_rng(4)
        s = rng.integers(-30000, 30000, size=4000).astype(np.int16)
        rate, got = _decode_audio(self._wav_bytes(s))
        assert rate == 16000 and np.array_equal(got, s)

    def test_wav_stereo_downmix(self):
        from flytemosaic_spark.operators.multimodal import _decode_audio

        left = np.full(100, 1000, dtype=np.int16)
        right = np.full(100, 3000, dtype=np.int16)
        inter = np.empty(200, dtype=np.int16)
        inter[0::2], inter[1::2] = left, right
        rate, got = _decode_audio(self._wav_bytes(inter, nch=2))
        assert np.array_equal(got, np.full(100, 2000, dtype=np.int16))

    def test_vad_over_real_wav_matches_faks_twin(self, spark):
        # identical PCM through the FAKS container and a REAL WAV file
        # must give identical VAD rows
        from flytemosaic_spark.operators.multimodal import (
            _fake_audio_payload,
            frame_energy_vad,
        )

        fake = _fake_audio_payload(7)
        samples = np.frombuffer(fake[12:], dtype=np.int16)  # 4B magic + 2x int32
        df = spark.createDataFrame(
            [(0, bytearray(fake)), (1, bytearray(self._wav_bytes(samples)))],
            "media_id long, payload binary",
        )
        out = {r.media_id: r for r in frame_energy_vad(df).collect()}
        a, b = out[0], out[1]
        assert (a.n_frames, a.n_voiced, a.longest_voiced_run) == (
            b.n_frames,
            b.n_voiced,
            b.longest_voiced_run,
        )
        assert a.sample_rate == b.sample_rate == 16000


def test_decode_payload_routes_bigtiff():
    # ADVICE r5: BigTIFF magic (II+/MM+) must reach the geotiff codec
    import numpy as np

    from flytemosaic_spark.operators.multimodal import _decode_payload
    from flytemosaic_spark.sources.geotiff import encode_geotiff

    a = np.arange(16 * 16, dtype="u2").reshape(16, 16)
    got = _decode_payload(encode_geotiff(a, tile=16, big=True))
    assert np.array_equal(got[:, :, 0], a)


class TestMp4Container:
    def test_parse_roundtrip_matrix(self):
        from flytemosaic_spark.sources.mp4 import (
            encode_minimal_mp4,
            parse_mp4,
        )

        for dur, w, h, codec, audio in [
            (12345, 1920, 1080, "avc1", True),
            (500, 640, 360, "av01", False),
            (3600000, 3840, 2160, "hev1", True),
        ]:
            m = parse_mp4(
                encode_minimal_mp4(dur, w, h, codec, audio=audio)
            )
            assert m["duration_ms"] == dur and m["brand"] == "isom"
            vid = [t for t in m["tracks"] if t["kind"] == "vide"][0]
            assert (vid["width"], vid["height"], vid["codec"]) == (
                w, h, codec,
            )
            assert len(m["tracks"]) == (2 if audio else 1)
            if audio:
                aud = [t for t in m["tracks"] if t["kind"] == "soun"][0]
                assert aud["codec"] == "mp4a"

    def test_parse_rejects_non_mp4(self):
        import pytest as _pytest

        from flytemosaic_spark.sources.mp4 import parse_mp4

        with _pytest.raises(ValueError, match="ftyp"):
            parse_mp4(b"\x89PNG\r\n\x1a\n" + b"\0" * 32)
        with _pytest.raises(ValueError, match="box size"):
            # valid ftyp then a moov whose size overruns the file
            from flytemosaic_spark.sources.mp4 import encode_minimal_mp4

            p = bytearray(encode_minimal_mp4(100, 64, 64))
            i = p.index(b"moov") - 4
            p[i : i + 4] = (2**31).to_bytes(4, "big")
            parse_mp4(bytes(p))

    def test_video_metadata_operator(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            synthesize_videos,
            video_metadata,
        )

        keys = spark.createDataFrame(
            [(i,) for i in range(1, 9)], "s_suppkey long"
        )
        rows = {
            r.media_id: r
            for r in video_metadata(synthesize_videos(keys)).collect()
        }
        for k in range(1, 9):
            r = rows[k]
            assert r.width == 320 + (k * 37) % 1600
            assert r.height == 180 + (k * 53) % 900
            assert r.duration_ms == 1000 + (k * 97) % 600000
            assert r.codec == ["avc1", "hev1", "av01"][k % 3]
            assert r.n_tracks == 1 + k % 2


def test_png_16bit_roundtrip_and_filters():
    # 16-bit gray PNG is the depth-map/elevation-tile case: filters
    # operate on BYTES with the left neighbor one full pixel back
    import struct
    import zlib

    import numpy as np

    from flytemosaic_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
        _paeth,
    )

    rng = np.random.default_rng(5)
    for shape in [(20, 30, 1), (12, 9, 4), (7, 5, 3)]:
        a = rng.integers(0, 65535, shape).astype("u2")
        got = _decode_png(_encode_png(a))
        assert got.dtype == np.uint16 and np.array_equal(got, a)

    # hand-build a depth-16 stream cycling ALL five filter types
    def build(arr, fts):
        h, w, ch = arr.shape
        raw = bytearray()
        rows = arr.astype(">u2")
        bpp = ch * 2
        prev = np.zeros((w * ch * 2,), np.int32)
        for y in range(h):
            line = np.frombuffer(rows[y].tobytes(), np.uint8).astype(
                np.int32
            )
            ft = fts[y % len(fts)]
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            if ft == 0:
                enc = line
            elif ft == 1:
                enc = (line - left) % 256
            elif ft == 2:
                enc = (line - prev) % 256
            elif ft == 3:
                enc = (line - (left + prev) // 2) % 256
            else:
                enc = np.array(
                    [
                        (line[i] - _paeth(
                            int(left[i]), int(prev[i]), int(upleft[i])
                        )) % 256
                        for i in range(len(line))
                    ],
                    np.int32,
                )
            raw += bytes([ft]) + bytes(enc.astype(np.uint8))
            prev = line

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(
            ">IIBBBBB", w, h, 16, {1: 0, 3: 2}[ch], 0, 0, 0
        )
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    a16 = rng.integers(0, 65535, (16, 11, 1)).astype("u2")
    assert np.array_equal(_decode_png(build(a16, [0, 1, 2, 3, 4])), a16)
    rgb16 = rng.integers(0, 65535, (10, 7, 3)).astype("u2")
    assert np.array_equal(_decode_png(build(rgb16, [4, 3, 2, 1, 0])), rgb16)


class TestMjpegVideo:
    """Real MP4 sample tables + MJPEG frame decode (sources/mp4.py
    encode_mp4_with_samples / _parse_stbl + sources/jpeg.py)."""

    def _clip(self, k: int, n: int = 9):
        from flytemosaic_spark.sources.jpeg import encode_jpeg
        from flytemosaic_spark.sources.mp4 import encode_mp4_with_samples

        frames = [
            np.full((24, 32, 1), (k * 11 + j * 29) % 256, np.uint8)
            for j in range(n)
        ]
        jpegs = [encode_jpeg(f, quality=90) for f in frames]
        return frames, jpegs, encode_mp4_with_samples(
            jpegs, codec="jpeg", width=32, height=24, fps=10
        )

    def test_sample_table_roundtrip(self):
        from flytemosaic_spark.sources.mp4 import parse_mp4

        frames, jpegs, mp4 = self._clip(3, n=9)  # short final chunk
        vid = parse_mp4(mp4)["tracks"][0]
        assert vid["codec"] == "jpeg"
        assert vid["sample_count"] == 9
        assert len(vid["samples"]) == 9
        for j, (off, sz) in enumerate(vid["samples"]):
            assert mp4[off : off + sz] == jpegs[j]

    def test_frame_bytes_decode_exactly(self):
        from flytemosaic_spark.sources.jpeg import decode_jpeg
        from flytemosaic_spark.sources.mp4 import parse_mp4

        frames, _, mp4 = self._clip(7, n=5)
        vid = parse_mp4(mp4)["tracks"][0]
        for j, (off, sz) in enumerate(vid["samples"]):
            assert (decode_jpeg(mp4[off : off + sz]) == frames[j]).all()

    def test_single_chunk_and_uniform_chunking(self):
        from flytemosaic_spark.sources.mp4 import (
            encode_mp4_with_samples,
            parse_mp4,
        )

        samples = [b"a" * 10, b"bb" * 10, b"c" * 30, b"d" * 40]
        for spc in (1, 2, 4, 16):
            mp4 = encode_mp4_with_samples(samples, samples_per_chunk=spc)
            vid = parse_mp4(mp4)["tracks"][0]
            got = [mp4[o : o + s] for o, s in vid["samples"]]
            assert got == samples, f"samples_per_chunk={spc}"

    def test_video_frame_stats_operator(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            synthesize_mjpeg_videos,
            video_frame_stats,
        )

        keys = spark.createDataFrame(
            [(k,) for k in range(1, 8)], "s_suppkey long"
        )
        rows = {
            r["media_id"]: r
            for r in video_frame_stats(
                synthesize_mjpeg_videos(keys), every=2
            ).collect()
        }
        for k in range(1, 8):
            n = 4 + k % 13
            kept = list(range(0, n, 2))
            r = rows[k]
            assert r["n_samples"] == n
            assert r["n_kept"] == len(kept)
            assert r["width"] == 32 and r["height"] == 24
            assert r["duration_ms"] == n * 100
            assert r["sum_kept_px"] == sum(
                (k * 11 + j * 29) % 256 for j in kept
            )

    def test_non_mjpeg_codec_raises(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            synthesize_videos,
            video_frame_stats,
        )

        keys = spark.createDataFrame([(3,)], "s_suppkey long")
        with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
            video_frame_stats(synthesize_videos(keys)).collect()


class TestFlacAudioTier:
    def test_flac_stats_match_arithmetic(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            audio_pcm_stats,
            synthesize_flac_audio,
        )

        keys = spark.createDataFrame(
            [(k,) for k in range(1, 6)], "s_suppkey long"
        )
        rows = {
            r["media_id"]: r
            for r in audio_pcm_stats(synthesize_flac_audio(keys)).collect()
        }
        for k in range(1, 6):
            n = 512 + (k * 13) % 1024
            i = np.arange(n, dtype=np.int64)
            s = (k * 7919 + i * 104729) % 4001 - 2000
            if k % 2:
                t = (k * 31 + i * 7) % 1999 - 999
                amp = (
                    np.stack([s, t], 1).astype(np.float64)
                    .mean(axis=1)
                    .astype(np.int16)
                    .astype(np.int64)
                )
            else:
                amp = s
            r = rows[k]
            assert r["sample_rate"] == 16000
            assert r["n_samples"] == n
            assert r["sum_amp"] == int(amp.sum())
            assert r["min_amp"] == int(amp.min())
            assert r["max_amp"] == int(amp.max())

    def test_vad_over_flac(self, spark):
        """frame_energy_vad consumes FLAC through the same seam."""
        from flytemosaic_spark.operators.multimodal import frame_energy_vad
        from flytemosaic_spark.sources.flac import encode_flac

        rng = np.random.default_rng(0)
        loud = (rng.normal(0, 8000, 1200)).clip(-32000, 32000)
        quiet = rng.normal(0, 100, 1200)
        pcm = np.concatenate([loud, quiet, loud]).astype(np.int16)
        df = spark.createDataFrame(
            [(1, bytearray(encode_flac(pcm, 16000)))],
            "media_id long, payload binary",
        )
        row = frame_energy_vad(df, frame=400).collect()[0]
        assert row["n_frames"] == 9
        assert row["n_voiced"] == 6
        assert row["longest_voiced_run"] == 3


class TestPngPaletteAndInterlace:
    """r6 late PNG decoder upgrades: indexed color (PLTE/tRNS, depths
    1/2/4/8) and Adam7 interlace."""

    @staticmethod
    def _palette_png(idx, plte, depth, trns=None):
        import struct
        import zlib

        h, w = idx.shape

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(
                    ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
                )
            )

        ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
        rows = []
        for y in range(h):
            bits = np.unpackbits(
                idx[y].astype(np.uint8)[:, None], axis=1
            )[:, 8 - depth :]
            flat = bits.reshape(-1)
            flat = np.concatenate(
                [flat, np.zeros((-len(flat)) % 8, np.uint8)]
            )
            rows.append(b"\x00" + np.packbits(flat).tobytes())
        out = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", plte.tobytes())
        )
        if trns is not None:
            out += chunk(b"tRNS", bytes(trns))
        return out + chunk(
            b"IDAT", zlib.compress(b"".join(rows))
        ) + chunk(b"IEND", b"")

    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_palette_depths(self, depth):
        from flytemosaic_spark.operators.multimodal import _decode_png

        rng = np.random.default_rng(depth)
        n = 1 << depth
        plte = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (13, 11)).astype(np.uint8)
        dec = _decode_png(self._palette_png(idx, plte, depth))
        assert dec.shape == (13, 11, 3)
        assert (dec == plte[idx]).all()

    def test_trns_alpha(self):
        from flytemosaic_spark.operators.multimodal import _decode_png

        rng = np.random.default_rng(9)
        plte = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        idx = rng.integers(0, 4, (9, 9)).astype(np.uint8)
        dec = _decode_png(self._palette_png(idx, plte, 2, trns=[0, 255]))
        assert dec.shape == (9, 9, 4)
        assert (dec[:, :, 3] == np.where(idx == 0, 0, 255)).all()

    @pytest.mark.parametrize(
        "shape", [(21, 17, 3), (8, 8, 1), (1, 1, 4), (3, 2, 2), (9, 40, 3)]
    )
    def test_adam7_roundtrip(self, shape):
        from flytemosaic_spark.operators.multimodal import (
            _decode_png,
            _encode_png,
        )

        rng = np.random.default_rng(sum(shape))
        a = rng.integers(0, 256, shape).astype(np.uint8)
        assert (_decode_png(_encode_png(a, interlace=True)) == a).all()
        a16 = rng.integers(0, 65536, shape).astype(np.uint16)
        assert (_decode_png(_encode_png(a16, interlace=True)) == a16).all()


class TestGifTier:
    def test_gif_frame_stats_operator(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            gif_frame_stats,
            synthesize_gifs,
        )

        keys = spark.createDataFrame(
            [(k,) for k in range(1, 8)], "s_suppkey long"
        )
        rows = {
            r["media_id"]: r
            for r in gif_frame_stats(synthesize_gifs(keys)).collect()
        }
        for k in range(1, 8):
            n = 2 + k % 7
            expect = sum(
                (k * 3 + j * 11) % 256
                + (k * 5 + j * 13) % 256
                + (k * 7 + j * 17) % 256
                for j in range(n)
            )
            r = rows[k]
            assert r["n_frames"] == n
            assert r["width"] == 20 and r["height"] == 16
            assert r["sum_rgb"] == expect


class TestImageNearDup:
    def test_dhash_invariant_to_jpeg_recompression(self):
        """The property that makes dHash a NEAR-dup signature: the
        same designed image through lossy JPEG keeps the exact hash
        when quantization error stays under the 12-step margins (q100
        error is <= 2 on this codec; q90's high-frequency error
        exceeds 12 on a step-every-pixel pattern, so real pipelines
        pick margins per recompression budget)."""
        import numpy as np

        from flytemosaic_spark.operators.multimodal import _decode_payload
        from flytemosaic_spark.sources.jpeg import encode_jpeg

        def dhash(arr):
            gray = arr.astype(np.float64).mean(axis=2)
            h, w = gray.shape
            yi = (np.arange(8) * h // 8).astype(int)
            xi = (np.arange(9) * w // 9).astype(int)
            g = gray[np.ix_(yi, xi)]
            bits = (g[:, :-1] > g[:, 1:]).reshape(-1)
            return "".join("1" if b else "0" for b in bits)

        h = 0
        for b in range(4):
            h |= ((7 * 1000003 + b * 7919) % 65536) << (16 * b)
        img = np.zeros((8, 9), dtype=np.int32)
        img[:, 0] = 128
        for r in range(8):
            for c in range(8):
                bit = (h >> (r * 8 + c)) & 1
                img[r, c + 1] = img[r, c] + (-12 if bit else 12)
        png_hash = dhash(img.astype(np.uint8)[:, :, None])
        jpg = encode_jpeg(img.astype(np.uint8)[:, :, None], quality=100)
        jpg_hash = dhash(_decode_payload(jpg))
        assert png_hash == jpg_hash

    def test_neardup_pairs_exact(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            image_dhash,
            image_neardup_pairs,
            synthesize_dhash_images,
        )

        keys = spark.createDataFrame(
            [(k,) for k in range(1, 51)], "s_suppkey long"
        )
        got = {
            (r.id_a, r.id_b)
            for r in image_neardup_pairs(
                image_dhash(synthesize_dhash_images(keys))
            ).collect()
        }
        expect = {
            (a, b)
            for a in range(1, 51)
            for b in range(a + 1, 51)
            if a % 25 == b % 25
        }
        assert got == expect


class TestAudioResample:
    def test_identity_ratio_preserves_stream(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            audio_resample_stats,
            synthesize_flac_audio,
        )

        keys = spark.createDataFrame([(2,), (3,)], "s_suppkey long")
        rows = {
            r["media_id"]: r
            for r in audio_resample_stats(
                synthesize_flac_audio(keys), up=1, down=1
            ).collect()
        }
        for k in (2, 3):
            n = 512 + (k * 13) % 1024
            i = np.arange(n, dtype=np.int64)
            s = (k * 7919 + i * 104729) % 4001 - 2000
            if k % 2:
                t = (k * 31 + i * 7) % 1999 - 999
                s = (
                    np.stack([s, t], 1).astype(np.float64)
                    .mean(axis=1).astype(np.int16).astype(np.int64)
                )
            assert rows[k]["n_out"] == n
            assert rows[k]["sum_amp"] == int(s.sum())

    def test_matches_np_interp(self, spark):
        """Independent cross-check: the rational-position path agrees
        with np.interp to within the rounding boundary."""
        import wave as _wave
        import io

        from flytemosaic_spark.operators.multimodal import (
            audio_resample_stats,
        )

        rng = np.random.default_rng(0)
        pcm = rng.integers(-3000, 3000, 1001).astype(np.int16)
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        df = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()))],
            "media_id long, payload binary",
        )
        row = audio_resample_stats(df, up=3, down=4).collect()[0]
        n_out = (1001 * 3) // 4
        j = np.arange(n_out)
        ref = np.floor(
            np.interp(j * 4 / 3, np.arange(1001), pcm.astype(float))
            + 0.5
        ).astype(np.int64)
        assert row["n_out"] == n_out
        assert abs(row["sum_amp"] - int(ref.sum())) <= n_out  # ulp-safe
        # exact agreement on min/max within 1
        assert abs(row["min_amp"] - int(ref.min())) <= 1
        assert abs(row["max_amp"] - int(ref.max())) <= 1


class TestBmp:
    def test_24bit_roundtrip_and_padding(self):
        from flytemosaic_spark.operators.multimodal import (
            _decode_payload,
            _encode_bmp,
        )

        rng = np.random.default_rng(0)
        for shape in [(23, 31, 3), (5, 7, 3), (1, 1, 3)]:
            a = rng.integers(0, 256, shape).astype(np.uint8)
            assert (_decode_payload(_encode_bmp(a)) == a).all(), shape

    def test_8bit_palette_topdown_and_32bit(self):
        import struct

        from flytemosaic_spark.operators.multimodal import _decode_bmp

        rng = np.random.default_rng(1)
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        idx = rng.integers(0, 16, (6, 10)).astype(np.uint8)
        stride = (10 + 3) & ~3
        body = b"".join(
            idx[y].tobytes() + b"\0" * (stride - 10) for y in range(6)
        )
        pal_bgra = b"".join(
            bytes([c[2], c[1], c[0], 0]) for c in pal
        )
        hdr = b"BM" + struct.pack("<IHHI", 54 + 64 + len(body), 0, 0, 54 + 64)
        hdr += struct.pack(
            "<IiiHHIIiiII", 40, 10, -6, 1, 8, 0, len(body), 0, 0, 16, 0
        )
        assert (_decode_bmp(hdr + pal_bgra + body) == pal[idx]).all()
        a4 = rng.integers(0, 256, (4, 4, 4)).astype(np.uint8)
        body = b"".join(
            a4[y][:, [2, 1, 0, 3]].tobytes() for y in range(3, -1, -1)
        )
        hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        hdr += struct.pack(
            "<IiiHHIIiiII", 40, 4, 4, 1, 32, 0, len(body), 0, 0, 0, 0
        )
        assert (_decode_bmp(hdr + body) == a4).all()

    def test_rle_rejected(self):
        import struct

        from flytemosaic_spark.operators.multimodal import _decode_bmp

        hdr = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        hdr += struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 1, 0, 0, 0, 0, 0)
        with pytest.raises(NotImplementedError, match="compression=1"):
            _decode_bmp(hdr)


class TestSubtitles:
    def test_srt_parser_roundtrip(self):
        from flytemosaic_spark.operators.multimodal import (
            _format_srt_ts,
            _parse_srt,
        )

        srt = (
            "1\n00:00:01,000 --> 00:00:04,500\nHello world\n\n"
            "2\n00:01:00,250 --> 01:02:03,999\nSecond cue\nwith two lines\n"
        )
        cues = _parse_srt(srt)
        assert cues[0] == (1000, 4500, "Hello world")
        assert cues[1][0] == 60250
        assert cues[1][1] == 3723999
        assert cues[1][2] == "Second cue\nwith two lines"
        assert _format_srt_ts(3723999) == "01:02:03,999"
        # CRLF + trailing blank lines tolerated
        assert len(_parse_srt(srt.replace("\n", "\r\n") + "\r\n\r\n")) == 2

    def test_subtitle_stats_operator(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            subtitle_stats,
            synthesize_srt,
        )

        keys = spark.createDataFrame(
            [(k,) for k in range(1, 6)], "s_suppkey long"
        )
        rows = {
            r["media_id"]: r
            for r in subtitle_stats(synthesize_srt(keys)).collect()
        }
        for k in range(1, 6):
            n = 2 + k % 9
            assert rows[k]["n_cues"] == n
            assert rows[k]["total_ms"] == sum(
                500 + (k * 13 + j * 29) % 1500 for j in range(n)
            )
            assert rows[k]["total_chars"] == sum(
                5 + (k * 11 + j * 3) % 40 for j in range(n)
            )


class TestLogMel:
    def test_pure_tones_land_in_predicted_band(self, spark):
        """Physics oracle: a pure sine at f concentrates its energy in
        the mel band whose triangle contains f."""
        import io
        import wave as _wave

        from flytemosaic_spark.operators.multimodal import (
            _mel_filterbank,
            audio_logmel_stats,
        )

        rate, n_fft, n_mels = 16000, 256, 16
        fb = _mel_filterbank(n_mels, n_fft, rate)
        rows_in = []
        expected = {}
        for i, f in enumerate([300.0, 1000.0, 3000.0, 6000.0]):
            t = np.arange(16000) / rate
            pcm = (8000 * np.sin(2 * np.pi * f * t)).astype(np.int16)
            buf = io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(pcm.tobytes())
            rows_in.append((i, bytearray(buf.getvalue())))
            k = f * n_fft / rate  # fft bin of the tone
            weights = fb[:, int(round(k))]
            expected[i] = int(weights.argmax())
        df = spark.createDataFrame(
            rows_in, "media_id long, payload binary"
        )
        got = {
            r["media_id"]: r["dominant_mel"]
            for r in audio_logmel_stats(df).collect()
        }
        assert got == expected

    def test_filterbank_shape_and_partition(self):
        from flytemosaic_spark.operators.multimodal import _mel_filterbank

        fb = _mel_filterbank(16, 256, 16000)
        assert fb.shape == (16, 129)
        assert (fb >= 0).all() and fb.max() <= 1.0
        # every filter has support, centers are increasing
        assert (fb.sum(axis=1) > 0).all()
        centers = fb.argmax(axis=1)
        assert (np.diff(centers) > 0).all()

    def test_frame_count_arithmetic(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            audio_logmel_stats,
            synthesize_flac_audio,
        )

        keys = spark.createDataFrame([(2,), (5,)], "s_suppkey long")
        rows = {
            r["media_id"]: r
            for r in audio_logmel_stats(
                synthesize_flac_audio(keys)
            ).collect()
        }
        for k in (2, 5):
            n = 512 + (k * 13) % 1024
            assert rows[k]["n_frames"] == 1 + (n - 256) // 128


class TestMp3Metadata:
    def test_header_walk_matrix(self):
        from flytemosaic_spark.sources.mp3 import (
            _BITRATES,
            encode_mp3_shell,
            parse_mp3,
        )

        for bi in (1, 9, 14):
            for ri in range(3):
                m = parse_mp3(
                    encode_mp3_shell(
                        37, bitrate_idx=bi, rate_idx=ri, id3_padding=100
                    )
                )
                assert m["n_frames"] == 37
                assert m["mean_bitrate_kbps"] == _BITRATES[bi]
                assert m["id3_bytes"] == 110
                assert (
                    m["duration_ms"]
                    == 37 * 1152 * 1000 // m["sample_rate"]
                )

    def test_honesty_gates(self):
        from flytemosaic_spark.sources.mp3 import encode_mp3_shell, parse_mp3

        with pytest.raises(ValueError, match="sync"):
            parse_mp3(b"\x12\x34" * 100)
        # truncated final frame
        good = encode_mp3_shell(3)
        with pytest.raises(ValueError, match="truncated"):
            parse_mp3(good[:-10])
        # reserved version bits rejected honestly (MPEG-2/2.5 parse
        # for real since r7 — TestMp3Mpeg2)
        bad = bytearray(good)
        bad[1] = 0xEB  # version bits 01 (reserved)
        with pytest.raises(ValueError, match="Layer III"):
            parse_mp3(bytes(bad))

    def test_operator(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            mp3_metadata,
            synthesize_mp3,
        )
        from flytemosaic_spark.sources.mp3 import _BITRATES, _RATES

        keys = spark.createDataFrame(
            [(k,) for k in range(1, 7)], "s_suppkey long"
        )
        rows = {
            r["media_id"]: r
            for r in mp3_metadata(synthesize_mp3(keys)).collect()
        }
        for k in range(1, 7):
            n = 20 + k % 50
            assert rows[k]["n_frames"] == n
            assert rows[k]["sample_rate"] == _RATES[k % 3]
            assert rows[k]["mean_bitrate_kbps"] == _BITRATES[1 + k % 14]


class TestExif:
    def test_roundtrip_all_orientations(self):
        from flytemosaic_spark.sources.exif import (
            build_exif_app1,
            inject_app1,
            parse_exif,
        )
        from flytemosaic_spark.sources.jpeg import encode_jpeg

        base = encode_jpeg(np.full((16, 24, 1), 100, np.uint8))
        for o in range(1, 9):
            j = inject_app1(
                base,
                build_exif_app1(
                    make=f"Maker{o}", orientation=o,
                    exposure=(1, 250), iso=200 + o,
                    pixel_x=24, pixel_y=16,
                ),
            )
            m = parse_exif(j)
            assert m["make"] == f"Maker{o}"
            assert m["orientation"] == o
            assert abs(m["exposure_s"] - 1 / 250) < 1e-12
            assert m["iso"] == 200 + o
            assert (m["pixel_x"], m["pixel_y"]) == (24, 16)

    def test_orientation_transforms_move_the_marked_corner(self):
        from flytemosaic_spark.sources.exif import apply_orientation

        m = np.zeros((2, 3, 1), np.uint8)
        m[0, 0] = 9  # top-left marker
        # (orientation, expected marker position, expected shape)
        cases = {
            1: ((0, 0), (2, 3)), 2: ((0, 2), (2, 3)),
            3: ((1, 2), (2, 3)), 4: ((1, 0), (2, 3)),
            5: ((0, 0), (3, 2)), 6: ((0, 1), (3, 2)),
            7: ((2, 1), (3, 2)), 8: ((2, 0), (3, 2)),
        }
        for o, ((y, x), shape) in cases.items():
            r = apply_orientation(m, o)
            assert r.shape[:2] == shape, o
            assert r[y, x, 0] == 9, o

    def test_missing_app1_raises(self):
        from flytemosaic_spark.sources.exif import parse_exif
        from flytemosaic_spark.sources.jpeg import encode_jpeg

        with pytest.raises(ValueError, match="no Exif"):
            parse_exif(encode_jpeg(np.zeros((8, 8, 1), np.uint8)))

    def test_scan_operator(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            exif_scan,
            synthesize_exif_jpegs,
        )

        keys = spark.createDataFrame(
            [(k,) for k in range(1, 10)], "s_suppkey long"
        )
        rows = {
            r["media_id"]: r
            for r in exif_scan(synthesize_exif_jpegs(keys)).collect()
        }
        for k in range(1, 10):
            o = 1 + k % 8
            r = rows[k]
            assert r["orientation"] == o
            assert (r["upright_w"], r["upright_h"]) == (
                (16, 24) if o >= 5 else (24, 16)
            )


class TestWarc:
    def test_roundtrip_both_layouts(self):
        from flytemosaic_spark.sources.warc import (
            parse_warc,
            split_http_response,
            write_warc,
        )

        pages = [
            (f"https://example.org/p{i}", 200 if i % 3 else 404,
             b"x" * (10 + i * 7))
            for i in range(5)
        ]
        for gz in (True, False):
            recs = parse_warc(write_warc(pages, per_record_gzip=gz))
            assert recs[0]["type"] == "warcinfo"
            resp = [r for r in recs if r["type"] == "response"]
            assert len(resp) == 5
            for i, r in enumerate(resp):
                assert r["uri"] == f"https://example.org/p{i}"
                status, hdrs, body = split_http_response(r["content"])
                assert status == (200 if i % 3 else 404)
                assert body == b"x" * (10 + i * 7)
                assert hdrs["Content-Type"] == "text/html"

    def test_bad_version_line_raises(self):
        from flytemosaic_spark.sources.warc import parse_warc

        with pytest.raises(ValueError, match="version"):
            parse_warc(b"NOPE/1.0\r\nContent-Length: 0\r\n\r\n")

    def test_operator(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            synthesize_warc,
            warc_page_stats,
        )

        keys = spark.createDataFrame(
            [(k,) for k in range(1, 6)], "s_suppkey long"
        )
        rows = {
            r["media_id"]: r
            for r in warc_page_stats(synthesize_warc(keys)).collect()
        }
        for k in range(1, 6):
            n = 3 + k % 8
            assert rows[k]["n_responses"] == n
            assert rows[k]["n_ok"] == sum(
                1 for i in range(n) if (k + i) % 5
            )
            assert rows[k]["total_body_bytes"] == sum(
                20 + (k * 13 + i * 17) % 300 for i in range(n)
            )


class TestWebDataset:
    def test_shard_roundtrip_and_grouping(self):
        from flytemosaic_spark.sources.webdataset import (
            parse_shard,
            write_shard,
        )

        samples = [
            ("000000", {"cls": b"3", "txt": b"hello", "png": b"PNGBYTES"}),
            ("000001", {"cls": b"7", "txt": b"world!", "json": b"{}"}),
        ]
        got = parse_shard(write_shard(samples))
        assert [s["key"] for s in got] == ["000000", "000001"]
        assert got[0]["parts"]["txt"] == b"hello"
        assert got[1]["parts"]["json"] == b"{}"
        # multi-dot extensions keep everything after the first dot
        s2 = parse_shard(
            write_shard([("k", {"img.png": b"x", "meta.json": b"y"})])
        )
        assert set(s2[0]["parts"]) == {"img.png", "meta.json"}

    def test_deterministic_bytes(self):
        from flytemosaic_spark.sources.webdataset import write_shard

        s = [("000000", {"txt": b"a"})]
        assert write_shard(s) == write_shard(s)

    def test_operator_explodes_samples(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            synthesize_webdataset,
            webdataset_sample_stats,
        )

        keys = spark.createDataFrame(
            [(k,) for k in range(1, 5)], "s_suppkey long"
        )
        rows = webdataset_sample_stats(
            synthesize_webdataset(keys)
        ).collect()
        got = {(r["media_id"], r["sample_idx"]): r for r in rows}
        for k in range(1, 5):
            for i in range(2 + k % 5):
                r = got[(k, i)]
                assert r["cls"] == (k * 3 + i) % 10
                assert r["txt_len"] == 5 + (k + i * 7) % 50
                assert r["mean_px"] == (k * 5 + i * 11) % 256


class TestOggOpus:
    def test_known_crc_vector(self):
        from flytemosaic_spark.sources.ogg import _ogg_crc

        # the standard unreflected CRC-32/04C11DB7 check value
        assert _ogg_crc(b"123456789") == 0x89A1897F

    def test_shell_roundtrip_matrix(self):
        from flytemosaic_spark.sources.ogg import (
            encode_ogg_opus_shell,
            parse_ogg_opus,
        )

        for n in (1, 3, 10):
            for spp in (960, 48000):
                m = parse_ogg_opus(
                    encode_ogg_opus_shell(
                        n, samples_per_page=spp, channels=2, preskip=312
                    )
                )
                assert m["channels"] == 2
                assert m["n_pages"] == n + 2
                assert m["duration_ms"] == (n * spp) * 1000 // 48000

    def test_crc_detects_corruption(self):
        from flytemosaic_spark.sources.ogg import (
            encode_ogg_opus_shell,
            parse_ogg_opus,
        )

        s = bytearray(encode_ogg_opus_shell(3))
        s[60] ^= 0x01
        with pytest.raises(ValueError):
            parse_ogg_opus(bytes(s))

    def test_operator(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            ogg_opus_metadata,
            synthesize_ogg_opus,
        )

        keys = spark.createDataFrame(
            [(k,) for k in range(1, 6)], "s_suppkey long"
        )
        rows = {
            r["media_id"]: r
            for r in ogg_opus_metadata(synthesize_ogg_opus(keys)).collect()
        }
        for k in range(1, 6):
            assert rows[k]["channels"] == 1 + k % 2
            assert rows[k]["n_pages"] == (3 + k % 12) + 2
            assert (
                rows[k]["duration_ms"]
                == ((3 + k % 12) * 960 * (1 + k % 40)) * 1000 // 48000
            )


class TestMp3Mpeg2:
    """r7: MPEG-2/2.5 Layer III header support, validated against a
    REAL file that ships in this container (gsutil's test corpus)."""

    REAL = (
        "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
        "test_data/test.mp3"
    )

    def test_real_mpeg2_file(self):
        import os

        import pytest

        from flytemosaic_spark.sources.mp3 import parse_mp3

        if not os.path.exists(self.REAL):
            pytest.skip("container test file absent")
        m = parse_mp3(open(self.REAL, "rb").read())
        assert m["version"] == "MPEG-2"
        assert m["sample_rate"] == 22050
        assert m["mode"] == "mono"
        assert m["n_frames"] == 45
        # 45 frames x 576 samples @ 22050 Hz
        assert m["duration_ms"] == 45 * 576 * 1000 // 22050

    def test_mpeg2_and_25_shells(self):
        from flytemosaic_spark.sources.mp3 import (
            encode_mp3_shell,
            parse_mp3,
        )

        m2 = parse_mp3(encode_mp3_shell(7, version=0b10))
        assert (m2["version"], m2["sample_rate"]) == ("MPEG-2", 22050)
        assert m2["duration_ms"] == 7 * 576 * 1000 // 22050
        m25 = parse_mp3(encode_mp3_shell(4, version=0b00, rate_idx=2))
        assert (m25["version"], m25["sample_rate"]) == ("MPEG-2.5", 8000)

    def test_version_change_mid_stream_rejected(self):
        import pytest

        from flytemosaic_spark.sources.mp3 import (
            encode_mp3_shell,
            parse_mp3,
        )

        mixed = encode_mp3_shell(2) + encode_mp3_shell(2, version=0b10)
        with pytest.raises(ValueError, match="version/sample rate"):
            parse_mp3(mixed)
