"""LZ4 block codec + the chunk-store codec registry.

LZ4 is fully formulaic (no entropy tables), so the from-scratch
implementation is verifiable BOTH directions against the real lz4
bundled with pyarrow (``lz4_raw`` = the same block format numcodecs
wraps for Zarr)."""

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flytemosaic_spark.sources.lz4 import (
    compress_block,
    decompress_block,
    numcodecs_lz4_decode,
    numcodecs_lz4_encode,
)


def _real():
    import pyarrow as pa

    if not pa.Codec.is_available("lz4_raw"):
        pytest.skip("pyarrow built without lz4")
    return pa.Codec("lz4_raw")


def _cases():
    random.seed(5)
    rng = np.random.default_rng(5)
    return {
        "empty": b"",
        "one": b"x",
        "short_rep": b"abcabcabcabc",
        "rep": b"hello world " * 500,
        "random": bytes(random.getrandbits(8) for _ in range(10000)),
        "chunk_f4": (rng.integers(0, 50, (64, 64, 4)) / 2.0)
        .astype("f4")
        .tobytes(),
        "zeros": b"\x00" * 100000,
        "tail_rep": b"q" * 30 + b"unique-tail",
    }


class TestLz4Interop:
    def test_our_blocks_decode_with_real_lz4(self):
        codec = _real()
        for name, d in _cases().items():
            assert (
                codec.decompress(compress_block(d), len(d), asbytes=True)
                == d
            ), name

    def test_real_blocks_decode_with_ours(self):
        codec = _real()
        for name, d in _cases().items():
            real = codec.compress(d, asbytes=True)
            assert decompress_block(real, len(d)) == d, name

    def test_compression_is_real(self):
        d = b"hello world " * 500
        assert len(compress_block(d)) < len(d) // 50

    def test_numcodecs_framing(self):
        for d in _cases().values():
            assert numcodecs_lz4_decode(numcodecs_lz4_encode(d)) == d

    def test_corrupt_raises(self):
        good = compress_block(b"abcd" * 100)
        with pytest.raises((ValueError, IndexError)):
            decompress_block(good[: len(good) // 2], 400)
        bad = bytearray(good)
        bad[1] ^= 0xFF
        try:
            out = decompress_block(bytes(bad), 400)
            assert len(out) == 400  # structurally valid mutation
        except (ValueError, IndexError):
            pass


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=3000))
def test_lz4_property_round_trip(data):
    assert decompress_block(compress_block(data), len(data)) == data


class TestChunkstoreCodecs:
    @pytest.mark.parametrize("compressor", ["lz4", "zstd", 1, None])
    def test_store_round_trip(self, spark, tmp_path, compressor):
        from flytemosaic_spark.sources.chunkstore import (
            read_array,
            read_template,
            write_region_chunks,
            write_template,
        )

        path = str(tmp_path / f"store_{compressor}")
        write_template(
            path, (1, 2, 8, 8), (1, 1, 4, 4), compressor=compressor
        )
        rng = np.random.default_rng(7)
        block = rng.normal(size=(2, 8, 8)).astype("f4")
        df = spark.createDataFrame(
            [(0, 0, 0, 0, [2, 8, 8], [float(v) for v in block.ravel()])],
            "t int, b0 int, y0 int, x0 int, shape array<int>, "
            "payload array<float>",
        )
        n = write_region_chunks(df, path)
        assert n == 8
        got = read_array(path)
        assert np.array_equal(got[0], block)
        meta = read_template(path)
        if compressor is None:
            assert meta["compressor"] is None
        elif compressor == 1:
            assert meta["compressor"] == {"id": "zlib", "level": 1}
        else:
            assert meta["compressor"]["id"] == compressor

    def test_read_store_df_with_lz4(self, spark, tmp_path):
        from flytemosaic_spark.sources.chunkstore import (
            read_store,
            write_region_chunks,
            write_template,
        )

        path = str(tmp_path / "lz4store")
        write_template(path, (1, 1, 4, 4), (1, 1, 4, 4),
                       compressor="lz4")
        vals = [float(i) for i in range(16)]
        df = spark.createDataFrame(
            [(0, 0, 0, 0, [1, 4, 4], vals)],
            "t int, b0 int, y0 int, x0 int, shape array<int>, "
            "payload array<float>",
        )
        write_region_chunks(df, path)
        rows = read_store(spark, path).collect()
        assert len(rows) == 1
        assert rows[0].payload == vals

    def test_v2_datasource_with_zstd(self, spark, tmp_path):
        from flytemosaic_spark.sources.chunkstore import (
            read_array,
            write_template,
        )

        path = str(tmp_path / "v2zstd")
        write_template(path, (1, 1, 4, 4), (1, 1, 4, 4),
                       compressor="zstd")
        vals = [float(i * 3) for i in range(16)]
        df = spark.createDataFrame(
            [(0, 0, 0, 0, [1, 4, 4], vals)],
            "t int, b0 int, y0 int, x0 int, shape array<int>, "
            "payload array<float>",
        )
        from flytemosaic_spark.sources.chunkstore_v2 import register

        register(spark)
        (
            df.write.format("chunkstore")
            .mode("append")
            .option("path", path)
            .save()
        )
        got = read_array(path)
        assert np.array_equal(got.ravel(), np.array(vals, dtype="f4"))


class TestLz4Frame:
    def test_xxh32_vectors(self):
        from flytemosaic_spark.sources.lz4 import xxh32

        assert xxh32(b"") == 0x02CC5D05
        assert (
            xxh32(b"Nobody inspects the spammish repetition")
            == 0xE2293B2F
        )

    def test_frame_interop_both_directions(self):
        import pyarrow as pa

        from flytemosaic_spark.sources.lz4 import (
            compress_frame,
            decompress_frame,
        )

        if not pa.Codec.is_available("lz4"):
            pytest.skip("pyarrow built without lz4 frame codec")
        codec = pa.Codec("lz4")
        rng = np.random.default_rng(1)
        random.seed(1)
        for d in (
            b"",
            b"x",
            b"hello frame " * 1000,
            bytes(random.getrandbits(8) for _ in range(300000)),
            (rng.integers(0, 50, (128, 128, 4)) / 2.0)
            .astype("f4")
            .tobytes(),
        ):
            real = codec.compress(d, asbytes=True)
            assert decompress_frame(real) == d
            mine = compress_frame(d)
            assert codec.decompress(mine, len(d), asbytes=True) == d
            assert decompress_frame(mine) == d

    def test_frame_checksum_and_corruption(self):
        from flytemosaic_spark.sources.lz4 import (
            compress_frame,
            decompress_frame,
        )

        frame = bytearray(compress_frame(b"payload " * 100))
        assert decompress_frame(bytes(frame)) == b"payload " * 100
        frame[-1] ^= 0xFF  # content checksum
        with pytest.raises(ValueError, match="checksum"):
            decompress_frame(bytes(frame))

    def test_multi_frame_and_skippable(self):
        import struct as _s

        from flytemosaic_spark.sources.lz4 import (
            compress_frame,
            decompress_frame,
        )

        payload = (
            compress_frame(b"one|")
            + _s.pack("<II", 0x184D2A50, 4)
            + b"meta"
            + compress_frame(b"two")
        )
        assert decompress_frame(payload) == b"one|two"


class TestSnappy:
    """Same verifiability contract as LZ4: snappy's raw block format
    has no entropy tables, so both directions check against the real
    snappy in pyarrow."""

    def test_interop_both_directions(self):
        import pyarrow as pa

        from flytemosaic_spark.sources.snappy import compress, decompress

        if not pa.Codec.is_available("snappy"):
            pytest.skip("pyarrow built without snappy")
        codec = pa.Codec("snappy")
        for name, d in _cases().items():
            assert (
                codec.decompress(compress(d), len(d), asbytes=True) == d
            ), name
            assert decompress(codec.compress(d, asbytes=True)) == d, name

    def test_compression_is_real(self):
        from flytemosaic_spark.sources.snappy import compress

        d = b"hello world " * 500
        assert len(compress(d)) < len(d) // 10

    def test_corrupt_raises(self):
        import struct as _s

        from flytemosaic_spark.sources.snappy import compress, decompress

        good = compress(b"abcd" * 200)
        with pytest.raises((ValueError, IndexError, _s.error)):
            decompress(good[: len(good) // 2])

    def test_chunkstore_snappy(self, spark, tmp_path):
        from flytemosaic_spark.sources.chunkstore import (
            read_array,
            write_region_chunks,
            write_template,
        )

        path = str(tmp_path / "snapstore")
        write_template(path, (1, 1, 4, 4), (1, 1, 4, 4),
                       compressor="snappy")
        vals = [float(i * 2) for i in range(16)]
        df = spark.createDataFrame(
            [(0, 0, 0, 0, [1, 4, 4], vals)],
            "t int, b0 int, y0 int, x0 int, shape array<int>, "
            "payload array<float>",
        )
        write_region_chunks(df, path)
        got = read_array(path)
        assert np.array_equal(got.ravel(), np.array(vals, dtype="f4"))


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=3000))
def test_snappy_property_round_trip(data):
    from flytemosaic_spark.sources.snappy import compress, decompress

    assert decompress(compress(data)) == data


class TestFrameHeaderChecksum:
    def test_corrupted_descriptor_detected(self):
        from flytemosaic_spark.sources.lz4 import (
            compress_frame,
            decompress_frame,
        )

        frame = bytearray(compress_frame(b"payload " * 50))
        assert decompress_frame(bytes(frame)) == b"payload " * 50
        # flip a bit in the FLG byte (byte 4, right after the magic):
        # the lone header-checksum byte must catch it
        frame[4] ^= 0x08
        with pytest.raises(ValueError, match="header checksum"):
            decompress_frame(bytes(frame))


class TestRealisticChunkSize:
    def test_1mb_chunks_all_codecs(self):
        # the x236 gate probe uses 4 KB chunks; real chunk stores
        # write ~1 MB — prove the registry codecs round-trip there too
        import numpy as np

        from flytemosaic_spark.sources.codecs import (
            compress_chunk,
            decompress_chunk,
        )

        rng = np.random.default_rng(9)
        smooth = np.cumsum(rng.integers(-4, 5, 1 << 20)).astype("u1")
        chunk = smooth.tobytes()
        for spec in (
            {"id": "zlib", "level": 1},
            {"id": "lz4"},
            {"id": "zstd", "level": 3},
            {"id": "snappy"},
        ):
            back = decompress_chunk(compress_chunk(chunk, spec), spec)
            assert back == chunk, spec
