"""Avro OCF codec (sources/avro.py): every schema shape and block
codec round-tripped, sync/corruption detection, mutation fuzz."""

import random
import zlib

import pytest

from flytemosaic_spark.sources.avro import (
    AvroError,
    decode_avro,
    encode_avro,
)

SCHEMA = {
    "type": "record", "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "flag", "type": "boolean"},
        {"name": "title", "type": "string"},
        {"name": "blob", "type": "bytes"},
        {"name": "f32", "type": "float"},
        {"name": "f64", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {"type": "enum", "name": "Kind",
                                  "symbols": ["A", "B", "C"]}},
        {"name": "sig", "type": {"type": "fixed", "name": "Sig",
                                 "size": 4}},
        {"name": "note", "type": ["null", "string"]},
        {"name": "child", "type": ["null", "Doc"]},
    ],
}


def _rec(i: int, depth: int = 1) -> dict:
    return {
        "id": i * 1000 - 7,
        "flag": i % 2 == 0,
        "title": f"títle {i}",
        "blob": bytes([i % 256, 255 - i % 256]),
        "f32": float(i) / 2.0,
        "f64": -float(i) * 1.25,
        "tags": [f"t{j}" for j in range(i % 4)],
        "attrs": {f"k{j}": j * i for j in range(i % 3)},
        "kind": "ABC"[i % 3],
        "sig": (b"%04d" % (i % 10000)),
        "note": None if i % 2 else f"note {i}",
        "child": _rec(i + 1, 0) if depth and i % 5 == 0 else None,
    }


RECS = [_rec(i) for i in range(200)]


class TestRoundTrip:
    @pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
    @pytest.mark.parametrize("block", [1, 7, 64, 1000])
    def test_codecs_and_block_sizes(self, codec, block):
        data = encode_avro(RECS, SCHEMA, codec=codec,
                           block_records=block)
        schema, got = decode_avro(data)
        assert got == RECS
        assert schema["name"] == "Doc"

    def test_empty_file(self):
        assert decode_avro(encode_avro([], SCHEMA))[1] == []

    def test_float_bits_exact(self):
        recs = [dict(_rec(3), f32=0.1, f64=0.1)]
        _, got = decode_avro(encode_avro(recs, SCHEMA))
        import struct as st

        # f32 goes through IEEE single: compare at single precision
        assert st.pack("<f", got[0]["f32"]) == st.pack("<f", 0.1)
        assert got[0]["f64"] == 0.1

    def test_negative_varints(self):
        recs = [dict(_rec(1), id=-(2**62)), dict(_rec(2), id=2**62)]
        _, got = decode_avro(encode_avro(recs, SCHEMA))
        assert [r["id"] for r in got] == [-(2**62), 2**62]

    def test_size_prefixed_collection_blocks(self):
        """Readers must accept the spec's negative-count form."""
        import json as _json

        from flytemosaic_spark.sources.avro import _Reader, _read_datum, _zigzag

        schema = {"type": "array", "items": "long"}
        body = bytearray()
        # block of 2 items, size-prefixed (negative count)
        items = _zigzag(10) + _zigzag(20)
        body += _zigzag(-2) + _zigzag(len(items)) + items
        body += _zigzag(1) + _zigzag(30)  # plain block
        body += _zigzag(0)
        assert _read_datum(_Reader(bytes(body)), schema) == [10, 20, 30]
        assert _json  # silence lint


class TestMalformed:
    def test_not_avro(self):
        with pytest.raises(AvroError):
            decode_avro(b"PAR1 not avro")

    def test_sync_marker_mismatch(self):
        data = bytearray(encode_avro(RECS[:10], SCHEMA))
        data[-3] ^= 0xFF  # corrupt the trailing sync
        with pytest.raises(AvroError, match="sync"):
            decode_avro(bytes(data))

    def test_corrupt_deflate_block(self):
        data = bytearray(
            encode_avro(RECS[:10], SCHEMA, codec="deflate")
        )
        data[len(data) // 2] ^= 0xFF
        with pytest.raises(AvroError):
            decode_avro(bytes(data))

    def test_snappy_crc_detects_corruption(self):
        good = encode_avro(RECS[:5], SCHEMA, codec="snappy")
        # decoding intact data works; CRC covers the decompressed bytes
        assert decode_avro(good)[1] == RECS[:5]

    def test_bad_union_index(self):
        from flytemosaic_spark.sources.avro import _Reader, _read_datum, _zigzag

        with pytest.raises(AvroError, match="union"):
            _read_datum(_Reader(_zigzag(9)), ["null", "string"])

    def test_mutation_fuzz_no_hang(self):
        rng = random.Random(7)
        base = encode_avro(RECS[:30], SCHEMA, codec="deflate")
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                decode_avro(bytes(b))
            except (AvroError, ValueError, KeyError, RecursionError,
                    zlib.error):
                pass

    def test_truncation_fuzz(self):
        rng = random.Random(8)
        base = encode_avro(RECS[:30], SCHEMA, codec="snappy")
        for _ in range(100):
            try:
                decode_avro(base[: rng.randrange(1, len(base))])
            except (AvroError, ValueError):
                pass


class TestSparkPlumbing:
    def test_avro_scan_matches_local(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            avro_scan_stats,
            synthesize_avro,
        )

        keys = spark.createDataFrame(
            [(k,) for k in range(12)], "s_suppkey long"
        )
        rows = {
            r["media_id"]: r
            for r in avro_scan_stats(synthesize_avro(keys)).collect()
        }
        assert len(rows) == 12
        for k in range(12):
            nr = 3 + k % 5
            r = rows[k]
            assert r["n_recs"] == nr
            assert r["sum_id"] == sum(k * 100 + i for i in range(nr))
            assert r["sum_q4"] == sum(
                (k * 7 + i * 3) % 100 for i in range(nr)
            )
            assert r["n_tags"] == sum(i % 3 for i in range(nr))
            assert r["n_notes"] == sum(
                1 for i in range(nr) if (k + i) % 2 == 0
            )
