"""Round-12 probes: REAL compressed-media decode inside the oracle
gate — FLAC audio bitstreams and MJPEG-in-MP4 video frame sampling.

Both probes build real compressed payloads on executors whose decoded
content derives arithmetically from the key, decode them through the
pure-numpy codecs (``sources/flac.py``, ``sources/mp4.py`` +
``sources/jpeg.py``), and emit exact integer statistics the DuckDB
oracle recomputes from the same arithmetic — so the hash-compare
proves the full encode -> container -> demux -> entropy-decode path,
not just metadata plumbing. (Reference parity: the reference treats
media as opaque payloads decoded at the worker via GDAL/ffmpeg-class
libraries, e.g. flytemosaic/datasets/utils.py; these probes close the
audio/video part of that seam dependency-free.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flytemosaic_spark.probes.registry import T, probe


@probe(
    "x222_flac_audio",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id,
                   512 + (s_suppkey * 13) % 1024 AS n
            FROM supplier
        ),
        idx AS (
            SELECT media_id, n,
                   unnest(generate_series(0, n - 1)) AS i
            FROM keys
        ),
        samp AS (
            SELECT media_id,
                   CASE WHEN media_id % 2 = 1
                        THEN CAST(trunc((
                               ((media_id*7919 + i*104729) % 4001 - 2000)
                             + ((media_id*31 + i*7) % 1999 - 999)) / 2.0)
                             AS BIGINT)
                        ELSE (media_id*7919 + i*104729) % 4001 - 2000
                   END AS amp
            FROM idx
        )
        SELECT media_id,
               16000 AS sample_rate,
               count(*) AS n_samples,
               sum(amp) AS sum_amp,
               min(amp) AS min_amp,
               max(amp) AS max_amp
        FROM samp
        GROUP BY media_id
    """,
    note="REAL FLAC round-trip IN the gate: executors encode "
    "key-derived PCM (odd keys stereo) with sources/flac.py — fixed + "
    "LPC prediction, Rice residuals, auto stereo decorrelation, "
    "multi-frame streams — and audio_pcm_stats decodes the bitstreams "
    "back (CRC-16 and STREAMINFO-MD5 verified per frame/stream) and "
    "emits exact integer PCM stats; the oracle recomputes them from "
    "the generating arithmetic, so a single wrong sample anywhere in "
    "the codec fails the hash. Stereo clips are downmixed "
    "mean-then-truncate on both sides. Payloads never shuffle "
    "(mapInPandas end-to-end); output is metadata-scale.",
)
def x222_flac_audio(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        audio_pcm_stats,
        synthesize_flac_audio,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return audio_pcm_stats(synthesize_flac_audio(keys))


@probe(
    "x223_video_frames",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id,
                   4 + s_suppkey % 13 AS n
            FROM supplier
        ),
        kept AS (
            SELECT media_id, n,
                   unnest(generate_series(0, n - 1, 2)) AS j
            FROM keys
        )
        SELECT media_id,
               any_value(n) AS n_samples,
               count(*) AS n_kept,
               32 AS width,
               24 AS height,
               any_value(n) * 100 AS duration_ms,
               sum((media_id * 11 + j * 29) % 256) AS sum_kept_px
        FROM kept
        GROUP BY media_id
    """,
    note="REAL video frame sampling IN the gate: executors build "
    "MJPEG-in-MP4 clips (real stts/stsc/stsz/stco sample tables, "
    "4 samples/chunk with a short-final-chunk stsc run, each sample a "
    "complete JPEG) and video_frame_stats demuxes the sample table, "
    "slices every 2nd frame out of mdat, and entropy-decodes it "
    "through the pure-numpy T.81 codec; constant-gray 8x8-aligned "
    "frames survive JPEG quantization exactly, so the oracle "
    "recomputes the decoded pixel sums — the hash checks container "
    "demux AND Huffman+IDCT, not just box arithmetic. Inter-frame "
    "codecs stay at the documented ffmpeg seam.",
)
def x223_video_frames(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        synthesize_mjpeg_videos,
        video_frame_stats,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return video_frame_stats(synthesize_mjpeg_videos(keys), every=2)
