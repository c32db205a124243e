"""Multimodal columns: image/audio/video as opaque binary payloads
with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side plumbing is fully real — schema, partitioning, UDF
signatures, Arrow batch shapes — while the codec layer is stubbed
behind a deterministic fake format (the container has no image/audio
libraries; a real deployment swaps ``_decode_payload`` for
PIL/ffmpeg/torchaudio and nothing else changes).

Fake payload format (deterministic from media_id):
    b"FAKE" | width:int32 | height:int32 | channels:uint8 | pixels...
Anything not starting with b"FAKE" raises NotImplementedError from the
decode stub — the clearly-marked seam for real codecs.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flytemosaic_spark.schemas import MEDIA

_MAGIC = b"FAKE"


def _fake_payload(media_id: int, width: int, height: int, channels: int) -> bytes:
    rng = np.random.default_rng(media_id)
    pixels = rng.integers(0, 256, size=width * height * channels, dtype=np.uint8)
    return _MAGIC + struct.pack("<iiB", width, height, channels) + pixels.tobytes()


def _decode_payload(payload: bytes) -> np.ndarray:
    """THE CODEC SEAM. Real formats (JPEG/PNG/WAV/MP4) belong here via
    PIL / ffmpeg; this container has none, so only the deterministic
    FAKE container is supported."""
    if not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real media codecs are stubbed in this environment; "
            "payload must use the deterministic FAKE container"
        )
    width, height, channels = struct.unpack_from("<iiB", payload, 4)
    pixels = np.frombuffer(payload, dtype=np.uint8, offset=4 + 9)
    return pixels.reshape(height, width, channels)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table: n rows of fake images with varying
    dimensions."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        c = int(rng.choice([1, 3]))
        rows.append((i, "image", _fake_payload(i, w, h, c), w, h, None, None))
    return spark.createDataFrame(rows, MEDIA)


def decode_stats(media: DataFrame) -> DataFrame:
    """Decode each payload and emit per-media pixel statistics —
    the decode/feature-extract pattern over mapInPandas. One Arrow
    batch in, one out; payload bytes never round-trip through the JVM
    row format more than once."""
    schema = (
        "media_id long, width int, height int, channels int, "
        "mean_px double, std_px double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _decode_payload(bytes(payload))
                out.append(
                    (
                        int(mid),
                        arr.shape[1],
                        arr.shape[0],
                        arr.shape[2],
                        float(arr.mean()),
                        float(arr.std()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "channels", "mean_px", "std_px"],
            )

    return media.select("media_id", "payload").mapInPandas(run, schema)


def resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of every payload (pure numpy — no codec
    needed once decoded). Returns the same media schema with new
    payloads; at scale this is the standard normalize-before-training
    pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                arr = _decode_payload(bytes(payload))
                h, w, c = arr.shape
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                small = arr[np.ix_(yi, xi)]
                payloads.append(
                    _MAGIC + struct.pack("<iiB", out_w, out_h, c) + small.tobytes()
                )
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["width"] = out_w
            pdf["height"] = out_h
            yield pdf

    return media.mapInPandas(run, MEDIA)


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame/row sampling: keep every ``every``-th pixel row — the
    video-frame-sampling pattern applied to the fake container."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, heights = [], []
            for payload in pdf["payload"]:
                arr = _decode_payload(bytes(payload))[::every]
                h, w, c = arr.shape
                payloads.append(_MAGIC + struct.pack("<iiB", w, h, c) + arr.tobytes())
                heights.append(h)
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["height"] = heights
            yield pdf

    return media.mapInPandas(run, MEDIA)


def embed_media(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic feature extraction: a hash-seeded embedding per
    payload (stands in for a vision encoder; the Spark shape — binary
    in, array<float> out, Arrow-batched — is the real thing)."""
    schema = "media_id long, embedding array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                seed = int.from_bytes(digest[:8], "little")
                embs.append(
                    np.random.default_rng(seed).standard_normal(dim).astype("f4")
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": embs})

    return media.select("media_id", "payload").mapInPandas(run, schema)


def extract_patches(media: DataFrame, patch: int = 4) -> DataFrame:
    """ViT-style patch pooling: decode each payload, split the image
    into non-overlapping ``patch`` x ``patch`` tiles and emit one row
    per tile with its mean and max over all channels — the patch-
    embedding front end of a vision transformer, minus the learned
    projection (which is a matmul over these pooled tiles).

    Long-form output (media_id, py, px, mean_px, max_px) so downstream
    joins/apis stay columnar; images whose sides are not multiples of
    ``patch`` are cropped to the largest covered grid, matching the
    common ViT preprocessing contract.
    """
    schema = "media_id long, py int, px int, mean_px double, max_px int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _decode_payload(bytes(payload))
                h, w, c = arr.shape
                gh, gw = h // patch, w // patch
                tiles = (
                    arr[: gh * patch, : gw * patch]
                    .reshape(gh, patch, gw, patch, c)
                    .astype(np.float64)
                )
                means = tiles.mean(axis=(1, 3, 4))
                maxes = tiles.max(axis=(1, 3, 4)).astype(np.int64)
                py, px = np.meshgrid(range(gh), range(gw), indexing="ij")
                frames.append(
                    pd.DataFrame(
                        {
                            "media_id": int(mid),
                            "py": py.ravel().astype("int32"),
                            "px": px.ravel().astype("int32"),
                            "mean_px": means.ravel(),
                            "max_px": maxes.ravel(),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return media.select("media_id", "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Audio: fake PCM container + frame-energy VAD segmentation
# ---------------------------------------------------------------------------

_AUDIO_MAGIC = b"FAKS"


def _fake_audio_payload(media_id: int, n_frames: int = 50, frame: int = 400) -> bytes:
    """Deterministic int16 PCM: per 400-sample frame, loud (speech-like,
    amplitude ~8000) or quiet (noise-floor, ~200) chosen by a seeded
    rng — so VAD has real voiced runs to find."""
    rng = np.random.default_rng(media_id)
    loud = rng.random(n_frames) < 0.55
    samples = np.concatenate(
        [
            (
                rng.normal(0.0, 8000.0 if v else 200.0, frame)
                .clip(-32767, 32767)
                .astype(np.int16)
            )
            for v in loud
        ]
    )
    return (
        _AUDIO_MAGIC
        + struct.pack("<ii", 16000, samples.size)
        + samples.tobytes()
    )


def _decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """THE AUDIO CODEC SEAM (WAV/MP3/FLAC go here via soundfile or
    ffmpeg in a real deployment)."""
    if not payload.startswith(_AUDIO_MAGIC):
        raise NotImplementedError(
            "real audio codecs are stubbed in this environment; "
            "payload must use the deterministic FAKS container"
        )
    rate, n = struct.unpack_from("<ii", payload, 4)
    samples = np.frombuffer(payload, dtype=np.int16, offset=4 + 8, count=n)
    return rate, samples


def synthesize_audio(spark: SparkSession, n: int = 32) -> DataFrame:
    rows = [(i, _fake_audio_payload(i)) for i in range(n)]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def frame_energy_vad(
    audio: DataFrame, frame: int = 400, threshold: float = 1.0e6
) -> DataFrame:
    """Frame-energy voice-activity segmentation over Arrow-batched
    ``mapInPandas``: per clip, chop the PCM stream into ``frame``-sample
    frames, energy = mean(sample^2) per frame, voiced = energy above
    the threshold; returns per-clip frame counts and the longest voiced
    run — the pre-filter an audio-training pipeline runs to drop
    silence-only clips and to cut long recordings at pauses.

    Scale shape: one Arrow batch in, one small typed row out per clip;
    clips never leave their partition, output is metadata-scale. The
    decode is the clearly-marked FAKS seam (swap for soundfile/ffmpeg).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = _decode_audio(bytes(payload))
                n_frames = samples.size // frame
                fr = (
                    samples[: n_frames * frame]
                    .astype(np.float64)
                    .reshape(n_frames, frame)
                )
                energy = (fr * fr).mean(axis=1)
                voiced = energy > threshold
                longest = run_len = 0
                for v in voiced:
                    run_len = run_len + 1 if v else 0
                    longest = max(longest, run_len)
                out.append(
                    (
                        int(mid),
                        int(rate),
                        int(n_frames),
                        int(voiced.sum()),
                        int(longest),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_frames",
                    "n_voiced",
                    "longest_voiced_run",
                ],
            )

    schema = (
        "media_id long, sample_rate long, n_frames long, "
        "n_voiced long, longest_voiced_run long"
    )
    return audio.select("media_id", "payload").mapInPandas(run, schema)
