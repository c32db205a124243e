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
