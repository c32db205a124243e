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


# -- Round-12 CRS presets: polar stereographic + MODIS sinusoidal ----------
# Same shared-expression oracle contract as f24-f27: ONE builder
# renders the formula to Spark Columns and DuckDB SQL, mm / nano-degree
# quantization absorbs last-ulp libm differences.

from pyspark.sql import functions as F  # noqa: E402

from flytemosaic_spark.functions.crs import (  # noqa: E402
    conic_forward_cols,
    conic_forward_sql,
    conic_inverse_cols,
    conic_inverse_sql,
)
from flytemosaic_spark.operators.text import portable_round  # noqa: E402

# Antarctic points from supplier keys: lon anywhere, lat -88..-60
_F28_PTS_SQL = """
    SELECT s_suppkey AS pt_id,
           CAST((s_suppkey * 37) % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon,
           CAST((s_suppkey * 53) % 280 AS DOUBLE) / 10.0 - 88.0 AS lat
    FROM supplier
"""
_F28_X, _F28_Y = conic_forward_sql("lon", "lat", "EPSG:3031")

# Arctic grid coords (EPSG:3413), +/- 3000 km around the pole
_F29_EN_SQL = """
    SELECT s_suppkey AS pt_id,
           CAST((s_suppkey * 41) % 6000000 AS DOUBLE) - 3000000.0 AS x,
           CAST((s_suppkey * 59) % 6000000 AS DOUBLE) - 3000000.0 AS y
    FROM supplier
"""
_F29_LON, _F29_LAT = conic_inverse_sql("x", "y", "EPSG:3413")

# global points for the MODIS grid (poles excluded: inverse lon is
# undefined at cos(phi)=0)
_F30_PTS_SQL = """
    SELECT s_suppkey AS pt_id,
           CAST((s_suppkey * 37) % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon,
           CAST((s_suppkey * 53) % 1700 AS DOUBLE) / 10.0 - 85.0 AS lat
    FROM supplier
"""
_F30_X, _F30_Y = conic_forward_sql("lon", "lat", "SR-ORG:6974")


@probe(
    "f28_polar_forward",
    sql=f"""
        WITH pts AS ({_F28_PTS_SQL})
        SELECT pt_id,
               floor(({_F28_X}) * 1000.0 + 0.5) / 1000.0 AS x,
               floor(({_F28_Y}) * 1000.0 + 0.5) / 1000.0 AS y
        FROM pts
    """,
    note="WGS84 lon/lat -> Antarctic Polar Stereographic (EPSG:3031, "
    "EPSG method 9829 variant B) as pure JVM column math "
    "(functions/crs.py:_stere_forward) — matches the EPSG guidance "
    "worked example to sub-mm (test_crs.py); the standard grid for "
    "ice-sheet rasters, i.e. the reference's to_crs for polar "
    "deployments; mm quantization",
)
def f28_polar_forward(spark: SparkSession, sf: str) -> DataFrame:
    k = F.col("s_suppkey")
    pts = T(spark, sf, "supplier").select(
        k.alias("pt_id"),
        (((k * 37) % 3600).cast("double") / F.lit(10.0) - F.lit(180.0))
        .alias("lon"),
        (((k * 53) % 280).cast("double") / F.lit(10.0) - F.lit(88.0))
        .alias("lat"),
    )
    x, y = conic_forward_cols(F.col("lon"), F.col("lat"), "EPSG:3031")
    return pts.select(
        "pt_id",
        portable_round(x, 3).alias("x"),
        portable_round(y, 3).alias("y"),
    )


@probe(
    "f29_polar_inverse",
    sql=f"""
        WITH pts AS ({_F29_EN_SQL})
        SELECT pt_id,
               floor(({_F29_LON}) * 1000000000.0 + 0.5) / 1000000000.0
                   AS lon,
               floor(({_F29_LAT}) * 1000000000.0 + 0.5) / 1000000000.0
                   AS lat
        FROM pts
    """,
    note="NSIDC Arctic Polar Stereographic (EPSG:3413) grid coords -> "
    "WGS84 lon/lat via the closed conformal (chi) series — the same "
    "expansion the Krüger and LCC inverses use, no iteration; "
    "nano-degree quantization, round-trip property-tested in "
    "test_crs.py",
)
def f29_polar_inverse(spark: SparkSession, sf: str) -> DataFrame:
    k = F.col("s_suppkey")
    pts = T(spark, sf, "supplier").select(
        k.alias("pt_id"),
        (((k * 41) % 6000000).cast("double") - F.lit(3000000.0)).alias("x"),
        (((k * 59) % 6000000).cast("double") - F.lit(3000000.0)).alias("y"),
    )
    lon, lat = conic_inverse_cols(F.col("x"), F.col("y"), "EPSG:3413")
    return pts.select(
        "pt_id",
        portable_round(lon, 9).alias("lon"),
        portable_round(lat, 9).alias("lat"),
    )


@probe(
    "f30_sinusoidal_forward",
    sql=f"""
        WITH pts AS ({_F30_PTS_SQL})
        SELECT pt_id,
               floor(({_F30_X}) * 1000.0 + 0.5) / 1000.0 AS x,
               floor(({_F30_Y}) * 1000.0 + 0.5) / 1000.0 AS y
        FROM pts
    """,
    note="WGS84 lon/lat -> MODIS sinusoidal grid (SR-ORG:6974, GCTP "
    "sphere R=6371007.181) — THE remote-sensing tiling grid (all "
    "MODIS land products address tiles h/v on it; the MODIS-tile "
    "derivation is unit-tested); equal-area spherical closed form, "
    "mm quantization",
)
def f30_sinusoidal_forward(spark: SparkSession, sf: str) -> DataFrame:
    k = F.col("s_suppkey")
    pts = T(spark, sf, "supplier").select(
        k.alias("pt_id"),
        (((k * 37) % 3600).cast("double") / F.lit(10.0) - F.lit(180.0))
        .alias("lon"),
        (((k * 53) % 1700).cast("double") / F.lit(10.0) - F.lit(85.0))
        .alias("lat"),
    )
    x, y = conic_forward_cols(F.col("lon"), F.col("lat"), "SR-ORG:6974")
    return pts.select(
        "pt_id",
        portable_round(x, 3).alias("x"),
        portable_round(y, 3).alias("y"),
    )


@probe(
    "x224_gif_frames",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id,
                   2 + s_suppkey % 7 AS n
            FROM supplier
        ),
        fr AS (
            SELECT media_id, n,
                   unnest(generate_series(0, n - 1)) AS j
            FROM keys
        )
        SELECT media_id,
               any_value(n) AS n_frames,
               20 AS width,
               16 AS height,
               sum(
                   (media_id * 3 + j * 11) % 256
                 + (media_id * 5 + j * 13) % 256
                 + (media_id * 7 + j * 17) % 256
               ) AS sum_rgb
        FROM fr
        GROUP BY media_id
    """,
    note="REAL animated-GIF decode IN the gate (sources/gif.py): "
    "executors write multi-frame GIF89a payloads (exact palettes, "
    "NETSCAPE loop block, odd keys INTERLACED with the 4-pass row "
    "order) and gif_frame_stats plays back every frame through the "
    "GIF flavor of LZW (LSB-first variable codes, table resets) with "
    "animation compositing; the oracle recomputes the decoded pixel "
    "sums from the generating arithmetic — one wrong index anywhere "
    "in palette/LZW/interlace fails the hash. GIF dominates "
    "web-scraped animated media; payloads never shuffle.",
)
def x224_gif_frames(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        gif_frame_stats,
        synthesize_gifs,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return gif_frame_stats(synthesize_gifs(keys))


@probe(
    "x225_image_neardup",
    sql="""
        SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b
        FROM supplier a
        JOIN supplier b
          ON a.s_suppkey < b.s_suppkey
         AND a.s_suppkey % 25 = b.s_suppkey % 25
    """,
    note="image near-duplicate detection over REAL decoded pixels: "
    "executors write PNG images whose 64-bit dHash realizes a designed "
    "per-group pattern (adjacent-pixel margins of 12 provably absorb "
    "the +-2 noise odd keys add — true near-dups, not byte-dups), "
    "image_dhash decodes + grayscales + 9x8-resizes + hashes, and "
    "image_neardup_pairs finds pairs via Hamming-band LSH (four 16-bit "
    "bands; pigeonhole guarantees hamming<=3 pairs share a band — four "
    "equi-joins, NO all-pairs) with an exact bit_count(xor) confirm. "
    "Cross-group hashes share no band and sit >=19 bits apart by "
    "design check, so the oracle is the pure same-group pair "
    "arithmetic. The image-curation twin of x2b/x2c text LSH; scales "
    "like them (bucket joins, 8-byte hashes shuffle, payloads don't).",
)
def x225_image_neardup(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        image_dhash,
        image_neardup_pairs,
        synthesize_dhash_images,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return image_neardup_pairs(
        image_dhash(synthesize_dhash_images(keys))
    )


@probe(
    "x226_audio_resample",
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
            SELECT media_id, n, i,
                   CASE WHEN media_id % 2 = 1
                        THEN CAST(trunc((
                               ((media_id*7919 + i*104729) % 4001 - 2000)
                             + ((media_id*31 + i*7) % 1999 - 999)) / 2.0)
                             AS BIGINT)
                        ELSE (media_id*7919 + i*104729) % 4001 - 2000
                   END AS amp
            FROM idx
        ),
        pos AS (
            SELECT media_id, n,
                   unnest(generate_series(0, (n * 3) // 4 - 1)) AS j
            FROM keys
        ),
        ip AS (
            SELECT media_id, n, j,
                   (j * 4) // 3 AS nidx,
                   ((j * 4) % 3) / 3.0 AS f
            FROM pos
        ),
        v AS (
            SELECT ip.media_id, ip.j,
                   floor(s0.amp + (s1.amp - s0.amp) * ip.f + 0.5) AS r
            FROM ip
            JOIN samp s0
              ON s0.media_id = ip.media_id AND s0.i = ip.nidx
            JOIN samp s1
              ON s1.media_id = ip.media_id
             AND s1.i = least(ip.nidx + 1, ip.n - 1)
        )
        SELECT media_id,
               count(*) AS n_out,
               CAST(sum(r) AS BIGINT) AS sum_amp,
               CAST(min(r) AS BIGINT) AS min_amp,
               CAST(max(r) AS BIGINT) AS max_amp
        FROM v
        GROUP BY media_id
    """,
    note="linear-interpolation audio resampling (16 kHz -> 12 kHz, the "
    "normalize-sample-rate pass every speech pipeline runs) over REAL "
    "FLAC payloads: output position held as an integer pair (quotient, "
    "remainder) so the interpolation weight is one division and the "
    "value one multiply-add — the CRS shared-IEEE-tree contract "
    "applied to DSP; the oracle replays decode arithmetic AND the "
    "resample, exact at the integer grain after floor(x+0.5). "
    "Payloads never shuffle; output is metadata-scale.",
)
def x226_audio_resample(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        audio_resample_stats,
        synthesize_flac_audio,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return audio_resample_stats(synthesize_flac_audio(keys), up=3, down=4)


@probe(
    "x227_subtitles",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id,
                   2 + s_suppkey % 9 AS n
            FROM supplier
        ),
        cues AS (
            SELECT media_id, n,
                   unnest(generate_series(0, n - 1)) AS j
            FROM keys
        )
        SELECT media_id,
               count(*) AS n_cues,
               sum(500 + (media_id * 13 + j * 29) % 1500) AS total_ms,
               sum(5 + (media_id * 11 + j * 3) % 40) AS total_chars
        FROM cues
        GROUP BY media_id
    """,
    note="SubRip (SRT) caption-track scan — the speech-density "
    "pre-filter of a video curation pipeline: executors write real "
    "SRT payloads with key-derived cue timings (HH:MM:SS,mmm "
    "formatting round-trips through the parser) and subtitle_stats "
    "recovers per-clip cue counts, spoken milliseconds and text "
    "volume; the oracle recomputes all three from the generating "
    "arithmetic. Payloads never shuffle; output is metadata-scale.",
)
def x227_subtitles(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        subtitle_stats,
        synthesize_srt,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return subtitle_stats(synthesize_srt(keys))


@probe(
    "x228_audio_logmel",
    sql=None,  # FFT is not SQL-expressible; physics tests verify
    note="log-mel feature extraction over REAL FLAC payloads — the "
    "front end of every speech model (Hann window, framed rfft, "
    "power spectrum, triangular HTK mel filterbank, log energies), "
    "vectorized numpy per clip. No DuckDB oracle (no FFT in SQL); "
    "the driver records the rows-only check and the PHYSICS tests "
    "carry correctness: pure tones land in the predicted mel band, "
    "the filterbank partitions increasing centers, frame counts are "
    "arithmetic (test_multimodal.py::TestLogMel). Per-clip parallel; "
    "payloads never shuffle; output is metadata-scale.",
)
def x228_audio_logmel(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        audio_logmel_stats,
        synthesize_flac_audio,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return audio_logmel_stats(synthesize_flac_audio(keys))


@probe(
    "x229_mp3_metadata",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id,
                   20 + s_suppkey % 50 AS n,
                   list_extract(
                       [32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                        192, 224, 256, 320],
                       1 + s_suppkey % 14
                   ) AS kbps,
                   list_extract(
                       [44100, 48000, 32000], 1 + s_suppkey % 3
                   ) AS rate
            FROM supplier
        )
        SELECT media_id,
               rate AS sample_rate,
               n AS n_frames,
               (n * 1152 * 1000) // rate AS duration_ms,
               kbps AS mean_bitrate_kbps
        FROM keys
    """,
    note="MP3 metadata scan — the ffprobe pass audio curation filters "
    "on before any decode: executors write structurally valid CBR "
    "MPEG-1 Layer III streams (real 4-byte frame headers, the Layer "
    "III 144*bitrate/rate+padding length law, ID3v2 syncsafe "
    "preludes) and mp3_metadata WALKS every frame header to recover "
    "sample rate, frame count, exact sample-derived duration and the "
    "per-frame bitrate mean; the oracle recomputes all of it. The "
    "Huffman/IMDCT bitstream decode stays at the named ffmpeg seam "
    "(sources/mp3.py explains why). Payloads never shuffle.",
)
def x229_mp3_metadata(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        mp3_metadata,
        synthesize_mp3,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return mp3_metadata(synthesize_mp3(keys))


@probe(
    "x230_exif_scan",
    sql="""
        SELECT s_suppkey AS media_id,
               'cam' || CAST(s_suppkey % 5 AS VARCHAR) AS make,
               1 + s_suppkey % 8 AS orientation,
               100 + (s_suppkey * 7) % 700 AS iso,
               '2024:01:'
                   || lpad(CAST(1 + s_suppkey % 28 AS VARCHAR), 2, '0')
                   || ' 00:00:00' AS capture_dt,
               CASE WHEN 1 + s_suppkey % 8 >= 5 THEN 16 ELSE 24 END
                   AS upright_w,
               CASE WHEN 1 + s_suppkey % 8 >= 5 THEN 24 ELSE 16 END
                   AS upright_h
        FROM supplier
    """,
    note="EXIF curation scan (sources/exif.py): executors inject real "
    "little-endian APP1 TIFF streams (IFD0 + Exif sub-IFD via the "
    "pointer tag) into real JPEGs; exif_scan walks JPEG markers, "
    "parses the IFDs with the SAME both-byte-order reader the GeoTIFF "
    "codec uses, decodes the pixels and APPLIES the 8 orientation "
    "transforms — upright dimensions prove the rotation actually ran "
    "(orientations 5-8 swap axes). Every field recomputed by the "
    "oracle. The pass every photo-corpus pipeline needs or it trains "
    "on sideways images; payloads never shuffle.",
)
def x230_exif_scan(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        exif_scan,
        synthesize_exif_jpegs,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return exif_scan(synthesize_exif_jpegs(keys))


@probe(
    "x231_warc_scan",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id, 3 + s_suppkey % 8 AS n
            FROM supplier
        ),
        pages AS (
            SELECT media_id, n,
                   unnest(generate_series(0, n - 1)) AS i
            FROM keys
        )
        SELECT media_id,
               count(*) AS n_responses,
               sum(CASE WHEN (media_id + i) % 5 <> 0 THEN 1 ELSE 0 END)
                   AS n_ok,
               sum(20 + (media_id * 13 + i * 17) % 300)
                   AS total_body_bytes
        FROM pages
        GROUP BY media_id
    """,
    note="WARC ingest scan (sources/warc.py) — THE Common Crawl "
    "container: executors write real WARC files (warcinfo + HTTP "
    "response records, odd keys in the per-record-gzip member layout, "
    "even keys plain) and warc_page_stats parses version lines, "
    "Content-Length-delimited records and HTTP status/headers/body "
    "splits; the oracle recomputes page counts, 200-rates and body "
    "volume from the generating arithmetic. One shard per task, "
    "records never shuffle — the first pass of a crawl curation "
    "pipeline.",
)
def x231_warc_scan(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        synthesize_warc,
        warc_page_stats,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return warc_page_stats(synthesize_warc(keys))


@probe(
    "x232_webdataset",
    sql="""
        WITH keys AS (
            SELECT s_suppkey AS media_id, 2 + s_suppkey % 5 AS n
            FROM supplier
        ),
        s AS (
            SELECT media_id, unnest(generate_series(0, n - 1)) AS i
            FROM keys
        )
        SELECT media_id,
               i AS sample_idx,
               (media_id * 3 + i) % 10 AS cls,
               5 + (media_id + i * 7) % 50 AS txt_len,
               (media_id * 5 + i * 11) % 256 AS mean_px
        FROM s
    """,
    note="WebDataset tar-shard explode (sources/webdataset.py) — the "
    "standard multimodal training layout (key-grouped {cls, txt, png} "
    "members per sample): executors write real tar shards with REAL "
    "PNG image parts, webdataset_sample_stats groups members by key "
    "prefix, decodes the image through the codec seam and emits ONE "
    "ROW PER SAMPLE; the oracle recomputes labels, text lengths and "
    "decoded pixel means. Shard bytes stay in their task — the "
    "indexing pass a shard-streamed training corpus needs.",
)
def x232_webdataset(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        synthesize_webdataset,
        webdataset_sample_stats,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return webdataset_sample_stats(synthesize_webdataset(keys))


@probe(
    "x233_opus_metadata",
    sql="""
        SELECT s_suppkey AS media_id,
               1 + s_suppkey % 2 AS channels,
               312 AS preskip,
               (3 + s_suppkey % 12) + 2 AS n_pages,
               ((3 + s_suppkey % 12) * 960 * (1 + s_suppkey % 40))
                   * 1000 // 48000 AS duration_ms
        FROM supplier
    """,
    note="Ogg Opus container scan (sources/ogg.py) — the third member "
    "of the audio-metadata family (MP3 frame walk, MP4 boxes, Ogg "
    "pages): executors write structurally valid Ogg streams (real "
    "lacing tables, BOS/EOS flags, per-page CRC-32 with Ogg's "
    "UNreflected polynomial — verified on read) and ogg_opus_metadata "
    "reads OpusHead plus the final granule position for the EXACT "
    "RFC 7845 duration; the oracle recomputes every field. Opus is "
    "the speech-dataset codec of choice; bitstream decode stays at "
    "the named libopus seam.",
)
def x233_opus_metadata(spark: SparkSession, sf: str) -> DataFrame:
    from flytemosaic_spark.operators.multimodal import (
        ogg_opus_metadata,
        synthesize_ogg_opus,
    )

    keys = T(spark, sf, "supplier").select("s_suppkey")
    return ogg_opus_metadata(synthesize_ogg_opus(keys))
