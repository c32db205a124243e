"""PDF text extraction — dependency-free parser + fixture encoder.

The crawl stack previously stopped at HTML; real LLM corpora (Common
Crawl, papers, FineWeb-style pipelines) are full of PDFs. This module
reads them with nothing but the stdlib:

- cross-reference: classic ``xref`` tables, cross-reference STREAMS
  (/Type /XRef, /W field widths, /Index subsections, PNG predictors),
  /Prev chains (incremental updates, first-seen-wins), and hybrid
  /XRefStm pointers;
- objects: the full object syntax (dicts, arrays, names with #xx
  escapes, literal strings with octal/EOL escapes, hex strings,
  numbers, booleans, null, indirect references) plus compressed
  objects inside object streams (/Type /ObjStm);
- stream filters: FlateDecode (stdlib zlib) with PNG/TIFF predictors,
  LZWDecode (shared with the TIFF codec — PDF EarlyChange=1 IS the
  TIFF early-change variant), ASCIIHexDecode, ASCII85Decode,
  RunLengthDecode, and filter CHAINS with per-filter DecodeParms;
- text: page-tree walk with inherited /Resources, content-stream
  tokenizer covering BT/ET, Tf, Td/TD/T*/Tm line moves, Tj/'/"/TJ
  shows (TJ kern adjustments <= -180/1000 em become a space), and
  byte→unicode via /ToUnicode CMaps (bfchar + bfrange), /Encoding
  base tables (WinAnsi = stdlib cp1252, MacRoman = stdlib mac_roman,
  Standard's quote deviations) and /Differences glyph-name maps.

Verification follows the repo's own-encoder-as-oracle pattern (MP4 /
WARC / WebP): :func:`encode_pdf` writes real PDFs through every
decoder path (all five filters, chains, hex strings, both xref forms,
object streams, Differences and ToUnicode encodings, all four
line-advance operator shapes) and the probe's DuckDB oracle
reconstructs the exact extracted text from the generating arithmetic.

Malformed input: every structural violation raises ``PDFError``
(a ``ValueError``); decoded-size caps bound allocation BEFORE
trusting any length field (the zstd mutation-fuzz lesson).

Reference parity: the reference opens arbitrary scene media through
one seam (flytemosaic/datasets/utils.py:123-126); this is that seam
for the document modality.

Scale shape: one PDF never splits — files are the parallelism unit
(the binaryFile/WARC rule); extraction is pure per-row Python behind
mapInPandas with an EXPLICIT repartition count (the x222 AQE rule).
"""

from __future__ import annotations

import re
import zlib

_MAX_DECODED = 1 << 26  # per-stream decoded-size cap (64 MiB)
_MAX_OBJECTS = 1 << 17
_MAX_PAGES = 1 << 15

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PDFError(ValueError):
    """Structurally invalid PDF input."""


class Name(str):
    """A PDF name token (distinct from a string VALUE)."""

    __slots__ = ()


class Ref:
    """Indirect object reference ``num gen R``."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} R"


class Stream:
    """A stream object: its dict + raw (still-encoded) bytes."""

    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw


class _Kw:
    __slots__ = ("v",)

    def __init__(self, v: str):
        self.v = v


_KW_R = _Kw("R")
_KW_TRUE = _Kw("true")
_KW_FALSE = _Kw("false")
_KW_NULL = _Kw("null")
_FIXED_KW = {"R": _KW_R, "true": _KW_TRUE, "false": _KW_FALSE, "null": _KW_NULL}


# ---------------------------------------------------------------------------
# Lexer / object parser
# ---------------------------------------------------------------------------


class _Lexer:
    """Byte-level PDF tokenizer; ``ops=True`` (content streams) returns
    unknown bare keywords as operator tokens instead of failing."""

    def __init__(self, data: bytes, pos: int = 0, ops: bool = False):
        self.data = data
        self.pos = pos
        self.ops = ops

    def skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def at_end(self) -> bool:
        self.skip_ws()
        return self.pos >= len(self.data)

    def _err(self, msg: str) -> PDFError:
        return PDFError(f"{msg} at offset {self.pos}")

    def parse(self):
        """One VALUE with ``n g R`` reference folding."""
        v = self._one()
        if isinstance(v, int):
            save = self.pos
            try:
                v2 = self._one()
                if isinstance(v2, int):
                    v3 = self._one()
                    if v3 is _KW_R:
                        return Ref(v, v2)
            except PDFError:
                pass
            self.pos = save
        return v

    def _one(self):
        self.skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise self._err("unexpected end of data")
        c = d[self.pos]
        if c == 0x3C:  # <
            if d[self.pos : self.pos + 2] == b"<<":
                return self._dict()
            return self._hex_string()
        if c == 0x28:  # (
            return self._lit_string()
        if c == 0x5B:  # [
            return self._array()
        if c == 0x2F:  # /
            return self._name()
        if c in b"+-.0123456789":
            return self._number()
        if c in b")>]}":
            raise self._err(f"unexpected delimiter {chr(c)!r}")
        return self._keyword()

    def _dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self.skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            k = self._one()
            if not isinstance(k, Name):
                raise self._err("dict key is not a name")
            out[str(k)] = self.parse()

    def _array(self) -> list:
        self.pos += 1
        out: list = []
        while True:
            self.skip_ws()
            if self.pos >= len(self.data):
                raise self._err("unterminated array")
            if self.data[self.pos] == 0x5D:  # ]
                self.pos += 1
                return out
            out.append(self.parse())

    def _name(self) -> Name:
        self.pos += 1
        d, n = self.data, len(self.data)
        out = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < n:  # #xx
                try:
                    out.append(int(d[self.pos + 1 : self.pos + 3], 16))
                except ValueError as e:
                    raise self._err("bad #xx in name") from e
                self.pos += 3
            else:
                out.append(c)
                self.pos += 1
        return Name(out.decode("latin-1"))

    def _number(self):
        d, n = self.data, len(self.data)
        start = self.pos
        self.pos += 1
        while self.pos < n and d[self.pos] in b"0123456789.+-":
            self.pos += 1
        tok = d[start : self.pos]
        try:
            if b"." in tok:
                return float(tok)
            return int(tok)
        except ValueError as e:
            raise self._err(f"bad number {tok!r}") from e

    def _keyword(self):
        d, n = self.data, len(self.data)
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            raise self._err("empty token")
        word = d[start : self.pos].decode("latin-1")
        fixed = _FIXED_KW.get(word)
        if fixed is not None:
            return fixed
        if self.ops:
            return _Kw(word)
        raise self._err(f"unexpected keyword {word!r}")

    def _hex_string(self) -> bytes:
        self.pos += 1
        d, n = self.data, len(self.data)
        out = bytearray()
        nib: int | None = None
        while self.pos < n:
            c = d[self.pos]
            self.pos += 1
            if c == 0x3E:  # >
                if nib is not None:
                    out.append(nib << 4)
                return bytes(out)
            if c in _WS:
                continue
            try:
                v = int(chr(c), 16)
            except ValueError as e:
                raise self._err("bad hex digit in string") from e
            if nib is None:
                nib = v
            else:
                out.append((nib << 4) | v)
                nib = None
        raise self._err("unterminated hex string")

    def _lit_string(self) -> bytes:
        self.pos += 1
        d, n = self.data, len(self.data)
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= n:
                    break
                e = d[self.pos]
                self.pos += 1
                if e in b"nrtbf":
                    out.append(
                        {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e]
                    )
                elif e in b"()\\":
                    out.append(e)
                elif e in b"01234567":
                    oct_digits = chr(e)
                    while (
                        self.pos < n
                        and len(oct_digits) < 3
                        and d[self.pos] in b"01234567"
                    ):
                        oct_digits += chr(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e == 0x0D:  # \<EOL> line continuation
                    if self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                elif e == 0x0A:
                    pass
                else:  # unknown escape: the char itself (spec rule)
                    out.append(e)
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            elif c == 0x0D:  # EOL inside string normalizes to \n
                if self.pos < n and d[self.pos] == 0x0A:
                    self.pos += 1
                out.append(0x0A)
            else:
                out.append(c)
        raise self._err("unterminated literal string")


# ---------------------------------------------------------------------------
# Stream filters
# ---------------------------------------------------------------------------


def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    stride = (columns * colors * bpc + 7) // 8
    bpp = max(1, (colors * bpc + 7) // 8)
    if stride <= 0 or len(data) % (stride + 1):
        raise PDFError("predictor row size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for r in range(len(data) // (stride + 1)):
        ft = data[r * (stride + 1)]
        row = bytearray(data[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                row[i] = (row[i] + pr) & 0xFF
        elif ft != 0:
            raise PDFError(f"unknown PNG filter type {ft}")
        out += row
        prev = bytes(row)
    return bytes(out)


def _apply_predictor(data: bytes, parms: dict) -> bytes:
    pred = int(parms.get("Predictor", 1) or 1)
    if pred == 1:
        return data
    columns = int(parms.get("Columns", 1) or 1)
    colors = int(parms.get("Colors", 1) or 1)
    bpc = int(parms.get("BitsPerComponent", 8) or 8)
    if pred == 2:  # TIFF horizontal differencing (8-bit path)
        if bpc != 8:
            raise PDFError("TIFF predictor supported for 8-bit only")
        stride = columns * colors
        out = bytearray(data)
        for r in range(0, len(out) - stride + 1, stride):
            for i in range(colors, stride):
                out[r + i] = (out[r + i] + out[r + i - colors]) & 0xFF
        return bytes(out)
    if pred >= 10:
        return _png_unpredict(data, columns, colors, bpc)
    raise PDFError(f"unknown predictor {pred}")


def _f_flate(data: bytes, parms: dict) -> bytes:
    try:
        out = zlib.decompressobj().decompress(data, _MAX_DECODED + 1)
    except zlib.error as e:
        raise PDFError(f"bad Flate stream: {e}") from e
    if len(out) > _MAX_DECODED:
        raise PDFError("Flate stream exceeds decoded-size cap")
    return _apply_predictor(out, parms)


def _f_lzw(data: bytes, parms: dict) -> bytes:
    if int(parms.get("EarlyChange", 1) or 1) != 1:
        raise PDFError("LZW EarlyChange=0 not supported")
    from flytemosaic_spark.sources.geotiff import _lzw_decode

    try:
        out = _lzw_decode(data)
    except ValueError as e:
        raise PDFError(f"bad LZW stream: {e}") from e
    if len(out) > _MAX_DECODED:
        raise PDFError("LZW stream exceeds decoded-size cap")
    return _apply_predictor(out, parms)


def _f_ahx(data: bytes, parms: dict) -> bytes:
    end = data.find(b">")
    body = data[:end] if end >= 0 else data
    body = bytes(c for c in body if c not in _WS)
    if len(body) % 2:
        body += b"0"
    try:
        return bytes.fromhex(body.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as e:
        raise PDFError("bad ASCIIHex stream") from e


def _f_a85(data: bytes, parms: dict) -> bytes:
    end = data.find(b"~>")
    body = data[:end] if end >= 0 else data
    out = bytearray()
    group: list[int] = []
    for c in body:
        if c in _WS:
            continue
        if c == 0x7A:  # z -> four zero bytes (only legal between groups)
            if group:
                raise PDFError("a85 'z' inside group")
            out += b"\0\0\0\0"
            continue
        if not 0x21 <= c <= 0x75:
            raise PDFError(f"bad a85 byte {c}")
        group.append(c - 33)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise PDFError("a85 group overflow")
            out += v.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise PDFError("a85 trailing single char")
        k = len(group)
        group += [84] * (5 - k)
        v = 0
        for g in group:
            v = v * 85 + g
        if v > 0xFFFFFFFF:
            raise PDFError("a85 group overflow")
        out += v.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _f_rl(data: bytes, parms: dict) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:
            return bytes(out)
        if ln < 128:
            if i + ln + 1 > n:
                raise PDFError("truncated RunLength literal")
            out += data[i : i + ln + 1]
            i += ln + 1
        else:
            if i >= n:
                raise PDFError("truncated RunLength run")
            out += bytes([data[i]]) * (257 - ln)
            i += 1
        if len(out) > _MAX_DECODED:
            raise PDFError("RunLength stream exceeds decoded-size cap")
    raise PDFError("RunLength stream missing EOD")


_FILTERS = {
    "FlateDecode": _f_flate,
    "Fl": _f_flate,
    "LZWDecode": _f_lzw,
    "LZW": _f_lzw,
    "ASCIIHexDecode": _f_ahx,
    "AHx": _f_ahx,
    "ASCII85Decode": _f_a85,
    "A85": _f_a85,
    "RunLengthDecode": _f_rl,
    "RL": _f_rl,
}


# ---------------------------------------------------------------------------
# Document: xref, object fetch, page tree
# ---------------------------------------------------------------------------


class PDFDocument:
    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PDFError("missing %PDF- header")
        self.data = data
        self.xref: dict[int, tuple] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        sx = data.rfind(b"startxref")
        if sx < 0:
            raise PDFError("missing startxref")
        lx = _Lexer(data, sx + len(b"startxref"))
        off = lx._one()
        if not isinstance(off, int) or not 0 <= off < len(data):
            raise PDFError("bad startxref offset")
        self._load_xref(off, set())
        if "Root" not in self.trailer:
            raise PDFError("trailer has no /Root")

    # -- xref ---------------------------------------------------------------

    def _load_xref(self, off: int, seen: set) -> None:
        if off in seen:
            raise PDFError("xref /Prev loop")
        seen.add(off)
        lx = _Lexer(self.data, off)
        lx.skip_ws()
        if self.data[lx.pos : lx.pos + 4] == b"xref":
            trailer = self._load_xref_table(lx)
        else:
            trailer = self._load_xref_stream(off)
        for k, v in trailer.items():
            self.trailer.setdefault(k, v)
        xs = trailer.get("XRefStm")  # hybrid-reference files
        if isinstance(xs, int):
            t2 = self._load_xref_stream(xs)
            for k, v in t2.items():
                self.trailer.setdefault(k, v)
        prev = trailer.get("Prev")
        if isinstance(prev, int):
            self._load_xref(prev, seen)

    def _load_xref_table(self, lx: _Lexer) -> dict:
        lx.pos += 4
        while True:
            lx.skip_ws()
            if self.data[lx.pos : lx.pos + 7] == b"trailer":
                lx.pos += 7
                t = lx.parse()
                if not isinstance(t, dict):
                    raise PDFError("trailer is not a dict")
                return t
            start = lx._one()
            count = lx._one()
            if not isinstance(start, int) or not isinstance(count, int):
                raise PDFError("bad xref subsection header")
            if count > _MAX_OBJECTS:
                raise PDFError("xref subsection too large")
            lx.skip_ws()
            for i in range(count):
                ent = self.data[lx.pos : lx.pos + 20]
                if len(ent) < 18:
                    raise PDFError("truncated xref entry")
                try:
                    eoff = int(ent[0:10])
                    kind = chr(ent[17])
                except ValueError as e:
                    raise PDFError("bad xref entry") from e
                num = start + i
                if kind == "n" and num not in self.xref:
                    self.xref[num] = ("u", eoff)
                lx.pos += 20 if len(ent) >= 20 else len(ent)

    def _load_xref_stream(self, off: int) -> dict:
        num, stream = self._parse_indirect_at(off)
        if not isinstance(stream, Stream) or stream.dict.get("Type") != "XRef":
            raise PDFError("expected /Type /XRef stream")
        d = stream.dict
        w = d.get("W")
        if not (isinstance(w, list) and len(w) >= 3):
            raise PDFError("XRef stream missing /W")
        w1, w2, w3 = (int(x) for x in w[:3])
        size = int(d.get("Size", 0))
        index = d.get("Index") or [0, size]
        if len(index) % 2:
            raise PDFError("odd /Index")
        body = self._stream_data(stream)
        rw = w1 + w2 + w3
        if rw <= 0:
            raise PDFError("zero-width XRef rows")
        pos = 0
        for s in range(0, len(index), 2):
            start, count = int(index[s]), int(index[s + 1])
            if count > _MAX_OBJECTS:
                raise PDFError("XRef /Index too large")
            for i in range(count):
                row = body[pos : pos + rw]
                if len(row) < rw:
                    raise PDFError("truncated XRef stream")
                pos += rw
                f1 = int.from_bytes(row[:w1], "big") if w1 else 1
                f2 = int.from_bytes(row[w1 : w1 + w2], "big")
                f3 = int.from_bytes(row[w1 + w2 :], "big")
                numi = start + i
                if numi in self.xref:
                    continue
                if f1 == 1:
                    self.xref[numi] = ("u", f2)
                elif f1 == 2:
                    self.xref[numi] = ("c", f2, f3)
        return dict(d)

    # -- objects ------------------------------------------------------------

    def _parse_indirect_at(self, off: int) -> tuple[int, object]:
        lx = _Lexer(self.data, off)
        num = lx._one()
        gen = lx._one()
        if not isinstance(num, int) or not isinstance(gen, int):
            raise PDFError(f"no indirect object at {off}")
        lx.skip_ws()
        if self.data[lx.pos : lx.pos + 3] != b"obj":
            raise PDFError(f"missing 'obj' keyword at {lx.pos}")
        lx.pos += 3
        val = lx.parse()
        lx.skip_ws()
        if self.data[lx.pos : lx.pos + 6] == b"stream":
            if not isinstance(val, dict):
                raise PDFError("stream without a dict")
            lx.pos += 6
            if self.data[lx.pos : lx.pos + 2] == b"\r\n":
                lx.pos += 2
            elif self.data[lx.pos : lx.pos + 1] in (b"\n", b"\r"):
                lx.pos += 1
            length = self.resolve(val.get("Length"))
            if not isinstance(length, int) or length < 0:
                raise PDFError("bad stream /Length")
            raw = self.data[lx.pos : lx.pos + length]
            if len(raw) < length:
                raise PDFError("truncated stream body")
            tail = self.data[lx.pos + length : lx.pos + length + 20]
            if b"endstream" not in tail:
                # tolerate off-by-EOL Length: resync on the keyword
                end = self.data.find(b"endstream", lx.pos)
                if end < 0 or end - lx.pos > _MAX_DECODED:
                    raise PDFError("missing endstream")
                raw = self.data[lx.pos : end].rstrip(b"\r\n")
            val = Stream(val, raw)
        return num, val

    def obj(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if len(self._cache) > _MAX_OBJECTS:
            raise PDFError("object budget exceeded")
        ent = self.xref.get(num)
        if ent is None:
            self._cache[num] = None
            return None
        if ent[0] == "u":
            gotnum, val = self._parse_indirect_at(ent[1])
            if gotnum != num:
                raise PDFError(
                    f"xref points {num} at object {gotnum}"
                )
            self._cache[num] = val
            return val
        # compressed object: load the whole container once
        container, _idx = ent[1], ent[2]
        cobj = self.obj(container)
        if not isinstance(cobj, Stream) or cobj.dict.get("Type") != "ObjStm":
            raise PDFError(f"object {num}: container is not /ObjStm")
        body = self._stream_data(cobj)
        n = int(self.resolve(cobj.dict.get("N", 0)))
        first = int(self.resolve(cobj.dict.get("First", 0)))
        if n > _MAX_OBJECTS or first > len(body):
            raise PDFError("bad ObjStm header")
        hx = _Lexer(body[:first])
        pairs = []
        for _ in range(n):
            onum = hx._one()
            ooff = hx._one()
            if not isinstance(onum, int) or not isinstance(ooff, int):
                raise PDFError("bad ObjStm pair")
            pairs.append((onum, ooff))
        for onum, ooff in pairs:
            if onum in self._cache:
                continue
            ox = _Lexer(body, first + ooff)
            self._cache[onum] = ox.parse()
        if num not in self._cache:
            raise PDFError(f"object {num} not in its ObjStm")
        return self._cache[num]

    def resolve(self, v, _depth: int = 0):
        while isinstance(v, Ref):
            if _depth > 32:
                raise PDFError("reference chain too deep")
            v = self.obj(v.num)
            _depth += 1
        return v

    def _stream_data(self, s: Stream) -> bytes:
        filters = self.resolve(s.dict.get("Filter"))
        parms = self.resolve(s.dict.get("DecodeParms"))
        if filters is None:
            return s.raw
        if not isinstance(filters, list):
            filters = [filters]
            parms = [parms]
        elif not isinstance(parms, list):
            parms = [parms] + [None] * (len(filters) - 1)
        data = s.raw
        for i, f in enumerate(filters):
            fn = _FILTERS.get(str(self.resolve(f)))
            if fn is None:
                raise PDFError(f"unsupported filter {f!r}")
            p = self.resolve(parms[i]) if i < len(parms) else None
            data = fn(data, p if isinstance(p, dict) else {})
        return data

    # -- page tree ----------------------------------------------------------

    def pages(self) -> list[tuple[dict, dict]]:
        """Depth-first page list as (page_dict, inherited_resources)."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PDFError("/Root is not a dict")
        top = self.resolve(root.get("Pages"))
        out: list[tuple[dict, dict]] = []
        seen: set[int] = set()

        def walk(node, resources, depth):
            if depth > 64:
                raise PDFError("page tree too deep")
            if isinstance(node, Ref):
                if node.num in seen:
                    raise PDFError("page tree loop")
                seen.add(node.num)
                node = self.resolve(node)
            if not isinstance(node, dict):
                raise PDFError("page tree node is not a dict")
            res = self.resolve(node.get("Resources"))
            if isinstance(res, dict):
                resources = res
            t = node.get("Type")
            if t == "Pages" or (t is None and "Kids" in node):
                kids = self.resolve(node.get("Kids"))
                if not isinstance(kids, list):
                    raise PDFError("/Kids is not an array")
                for k in kids:
                    walk(k, resources, depth + 1)
            else:
                if len(out) >= _MAX_PAGES:
                    raise PDFError("page budget exceeded")
                out.append((node, resources or {}))

        walk(top, {}, 0)
        return out

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        if c is None:
            return b""
        parts = c if isinstance(c, list) else [c]
        chunks = []
        for p in parts:
            p = self.resolve(p)
            if not isinstance(p, Stream):
                raise PDFError("/Contents entry is not a stream")
            chunks.append(self._stream_data(p))
        return b"\n".join(chunks)


# ---------------------------------------------------------------------------
# Encodings: byte -> unicode
# ---------------------------------------------------------------------------

_GLYPHS = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteright": "’",
    "quoteleft": "‘", "quotedblleft": "“",
    "quotedblright": "”", "bullet": "•", "emdash": "—",
    "endash": "–", "fi": "ﬁ", "fl": "ﬂ",
    "germandbls": "ß", "eacute": "é", "egrave": "è",
    "agrave": "à", "ccedilla": "ç", "adieresis": "ä",
    "odieresis": "ö", "udieresis": "ü",
}


def _glyph_to_unicode(name: str) -> str:
    if name in _GLYPHS:
        return _GLYPHS[name]
    if len(name) == 1:
        return name
    if name.startswith("uni") and len(name) == 7:
        try:
            return chr(int(name[3:], 16))
        except ValueError:
            return "�"
    return "�"


def _base_table(name: str | None) -> list[str]:
    if name == "WinAnsiEncoding":
        out = []
        for i in range(256):
            try:
                out.append(bytes([i]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(i))  # cp1252's 5 undefined slots
        return out
    if name == "MacRomanEncoding":
        return [bytes([i]).decode("mac_roman") for i in range(256)]
    table = [chr(i) for i in range(256)]
    if name == "StandardEncoding":
        table[0x27] = "’"  # quoteright
        table[0x60] = "‘"  # quoteleft
    return table


_BF_CHAR = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BF_RANGE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX = re.compile(rb"<([0-9A-Fa-f]+)>")


def _utf16be(hexs: bytes) -> str:
    b = bytes.fromhex(hexs.decode("ascii"))
    return b.decode("utf-16-be", errors="replace")


def _parse_tounicode(data: bytes) -> dict[int, str]:
    """bfchar + bfrange of a simple-font (1-byte code) ToUnicode CMap."""
    cmap: dict[int, str] = {}
    for block in _BF_CHAR.findall(data):
        toks = _HEX.findall(block)
        for i in range(0, len(toks) - 1, 2):
            cmap[int(toks[i], 16)] = _utf16be(toks[i + 1])
    for block in _BF_RANGE.findall(data):
        lx = _Lexer(block, ops=True)
        while not lx.at_end():
            try:
                lo = lx._one()
                hi = lx._one()
                dst = lx._one()
            except PDFError:
                break
            if not isinstance(lo, bytes) or not isinstance(hi, bytes):
                continue
            lo_i = int.from_bytes(lo, "big")
            hi_i = int.from_bytes(hi, "big")
            if hi_i - lo_i > 0xFFFF:
                raise PDFError("bfrange too large")
            if isinstance(dst, list):
                for k, el in enumerate(dst):
                    if isinstance(el, bytes) and lo_i + k <= hi_i:
                        cmap[lo_i + k] = el.decode(
                            "utf-16-be", errors="replace"
                        )
            elif isinstance(dst, bytes):
                base = int.from_bytes(dst, "big")
                width = len(dst)
                for c in range(lo_i, hi_i + 1):
                    cmap[c] = (base + c - lo_i).to_bytes(width, "big").decode(
                        "utf-16-be", errors="replace"
                    )
    return cmap


def _font_decoder(doc: PDFDocument, font):
    """(bytes -> str) for one font. Simple fonts: ToUnicode wins,
    else /Encoding base table + /Differences, else latin-1
    passthrough. Composite fonts (/Subtype /Type0, the modern
    embedded-font shape — Identity-H CID ordering): 2-byte codes
    decoded through the ToUnicode CMap."""
    font = doc.resolve(font)
    if not isinstance(font, dict):
        return lambda bs: bs.decode("latin-1")
    tu = doc.resolve(font.get("ToUnicode"))
    if font.get("Subtype") == "Type0":
        cmap = (
            _parse_tounicode(doc._stream_data(tu))
            if isinstance(tu, Stream)
            else {}
        )

        def _cid(bs: bytes) -> str:
            return "".join(
                cmap.get(int.from_bytes(bs[i : i + 2], "big"), "�")
                for i in range(0, len(bs) - 1, 2)
            )

        return _cid
    if isinstance(tu, Stream):
        cmap = _parse_tounicode(doc._stream_data(tu))
        return lambda bs: "".join(cmap.get(b, chr(b)) for b in bs)
    enc = doc.resolve(font.get("Encoding"))
    if isinstance(enc, str):  # Name subclasses str
        table = _base_table(str(enc))
    elif isinstance(enc, dict):
        table = _base_table(
            str(enc["BaseEncoding"]) if "BaseEncoding" in enc else None
        )
        diffs = doc.resolve(enc.get("Differences"))
        if isinstance(diffs, list):
            code = 0
            for el in diffs:
                if isinstance(el, int):
                    code = el
                elif isinstance(el, Name):
                    if 0 <= code <= 255:
                        table[code] = _glyph_to_unicode(str(el))
                    code += 1
    else:
        table = _base_table(None)
    return lambda bs: "".join(table[b] for b in bs)


# ---------------------------------------------------------------------------
# Content-stream text extraction
# ---------------------------------------------------------------------------

_KERN_SPACE = -180  # TJ adjustment (1/1000 em) at/below which = a space


def _extract_page_text(doc: PDFDocument, content: bytes, fonts: dict) -> str:
    lx = _Lexer(content, ops=True)
    stack: list = []
    parts: list[str] = []
    shown = False
    pending_nl = False
    decoder = _font_decoder(doc, None)
    decoders: dict[str, object] = {}

    def show(s: str) -> None:
        nonlocal shown, pending_nl
        if pending_nl and shown:
            parts.append("\n")
        parts.append(s)
        shown = True
        pending_nl = False

    while not lx.at_end():
        try:
            tok = lx.parse()
        except PDFError:
            break  # damaged tail: keep what we have (real-PDF practice)
        if not isinstance(tok, _Kw):
            stack.append(tok)
            continue
        op = tok.v
        if op == "Tf" and len(stack) >= 2 and isinstance(stack[-2], Name):
            fname = str(stack[-2])
            if fname not in decoders:
                decoders[fname] = _font_decoder(doc, fonts.get(fname))
            decoder = decoders[fname]
        elif op in ("Td", "TD"):
            ty = stack[-1] if stack else 0
            if isinstance(ty, (int, float)) and ty != 0 and shown:
                pending_nl = True
        elif op in ("T*", "BT", "Tm"):
            if shown:
                pending_nl = True
        elif op == "Tj":
            if stack and isinstance(stack[-1], bytes):
                show(decoder(stack[-1]))
        elif op == "'":
            if shown:
                pending_nl = True
            if stack and isinstance(stack[-1], bytes):
                show(decoder(stack[-1]))
        elif op == '"':
            if shown:
                pending_nl = True
            if stack and isinstance(stack[-1], bytes):
                show(decoder(stack[-1]))
        elif op == "TJ":
            if stack and isinstance(stack[-1], list):
                seg: list[str] = []
                space = False
                for el in stack[-1]:
                    if isinstance(el, (int, float)):
                        if el <= _KERN_SPACE:
                            space = True
                    elif isinstance(el, bytes):
                        if space and seg:
                            seg.append(" ")
                        space = False
                        seg.append(decoder(el))
                show("".join(seg))
        stack = []
    return "".join(parts)


def extract_pdf_text(data: bytes) -> list[str]:
    """Decode a PDF and return one extracted-text string per page."""
    doc = PDFDocument(data)
    out = []
    for page, resources in doc.pages():
        fonts = doc.resolve(resources.get("Font"))
        out.append(
            _extract_page_text(
                doc,
                doc.page_content(page),
                fonts if isinstance(fonts, dict) else {},
            )
        )
    return out


# ---------------------------------------------------------------------------
# Encoder (fixture generator — exercises every decoder path)
# ---------------------------------------------------------------------------


def _esc_lit(b: bytes) -> bytes:
    return (
        b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def _encode_filters(data: bytes, filters: tuple[str, ...]) -> tuple[bytes, str]:
    """Apply encode-side filters (reverse of decode order); returns
    (encoded, filter-entry PDF fragment)."""
    names = {
        "flate": "FlateDecode",
        "lzw": "LZWDecode",
        "ahx": "ASCIIHexDecode",
        "a85": "ASCII85Decode",
        "rl": "RunLengthDecode",
    }
    for f in reversed(filters):
        if f == "flate":
            data = zlib.compress(data, 6)
        elif f == "lzw":
            from flytemosaic_spark.sources.geotiff import _lzw_encode

            data = _lzw_encode(data)
        elif f == "ahx":
            data = data.hex().encode("ascii") + b">"
        elif f == "a85":
            out = bytearray()
            for i in range(0, len(data), 4):
                chunk = data[i : i + 4]
                pad = 4 - len(chunk)
                v = int.from_bytes(chunk + b"\0" * pad, "big")
                grp = bytearray(5)
                for k in range(4, -1, -1):
                    grp[k] = 33 + v % 85
                    v //= 85
                if pad == 0 and bytes(grp) == b"!!!!!":
                    out += b"z"
                else:
                    out += grp[: 5 - pad]
            data = bytes(out) + b"~>"
        elif f == "rl":
            out = bytearray()
            i = 0
            while i < len(data):
                run = 1
                while (
                    i + run < len(data)
                    and run < 128
                    and data[i + run] == data[i]
                ):
                    run += 1
                if run >= 2:
                    out += bytes([257 - run, data[i]])
                    i += run
                else:
                    j = i + 1
                    while (
                        j < len(data)
                        and j - i < 128
                        and not (
                            j + 1 < len(data) and data[j] == data[j + 1]
                        )
                    ):
                        j += 1
                    out += bytes([j - i - 1]) + data[i:j]
                    i = j
            out.append(128)
            data = bytes(out)
        else:
            raise ValueError(f"unknown encode filter {f}")
    if not filters:
        return data, ""
    if len(filters) == 1:
        return data, f" /Filter /{names[filters[0]]}"
    arr = " ".join(f"/{names[f]}" for f in filters)
    return data, f" /Filter [{arr}]"


def _content_stream(
    lines: list[str],
    *,
    hex_strings: bool,
    line_op: str,
    remap: dict[str, int] | None,
    tj_kern_spaces: bool,
    cid: bool = False,
) -> bytes:
    def enc_text(s: str) -> bytes:
        if cid:  # Identity-H 2-byte codes: 0x0100 + codepoint
            for ch in s:
                if ord(ch) > 0x7F:
                    raise ValueError("cid fixture text must be ASCII")
            return b"".join(
                (0x0100 + ord(ch)).to_bytes(2, "big") for ch in s
            )
        if remap:
            return bytes(remap.get(ch, ord(ch)) for ch in s)
        return s.encode("latin-1")

    def put(s: str) -> bytes:
        b = enc_text(s)
        if hex_strings:
            return b"<" + b.hex().encode("ascii") + b">"
        return b"(" + _esc_lit(b) + b")"

    def show(s: str) -> bytes:
        if tj_kern_spaces and " " in s:
            parts = s.split(" ")
            return (
                b"[" + b" -250 ".join(put(p) for p in parts) + b"] TJ"
            )
        return put(s) + b" Tj"

    out = [b"BT", b"/F1 12 Tf", b"14 TL", b"72 720 Td"]
    for i, line in enumerate(lines):
        if i == 0:
            out.append(show(line))
        elif line_op == "td":
            out.append(b"0 -14 Td " + show(line))
        elif line_op == "tstar":
            out.append(b"T* " + show(line))
        elif line_op == "quote":
            out.append(put(line) + b" '")
        elif line_op == "tm":
            out.append(
                b"1 0 0 1 72 %d Tm " % (720 - 14 * i) + show(line)
            )
        else:
            raise ValueError(f"unknown line_op {line_op}")
    out.append(b"ET")
    return b"\n".join(out)


def encode_pdf(
    pages: list[list[str]],
    *,
    filters: tuple[str, ...] = (),
    hex_strings: bool = False,
    xref_stream: bool = False,
    object_streams: bool = False,
    encoding: str | None = None,
    line_op: str = "td",
    tj_kern_spaces: bool = False,
) -> bytes:
    """Write a real PDF: ``pages`` is a list of pages, each a list of
    text lines. Options select decoder paths: stream ``filters``
    (decode order, e.g. ``("a85", "flate")``), hex vs literal strings,
    classic xref table vs cross-reference stream, object streams,
    ``encoding`` in {None, "differences", "tounicode", "cid"}
    (differences/tounicode remap lowercase a-z to bytes 0x80-0x99;
    cid writes a /Type0 Identity-H composite font with 2-byte codes
    0x0100+codepoint and a 2-byte ToUnicode CMap — hex strings
    forced), the line-advance operator (td/tstar/quote/tm) and TJ
    kern-encoded spaces."""
    if object_streams and not xref_stream:
        raise ValueError("object streams require a cross-reference stream")
    remap = None
    cid = encoding == "cid"
    if cid:
        hex_strings = True  # 2-byte codes are binary; hex is safe
    if encoding in ("differences", "tounicode"):
        remap = {chr(97 + i): 0x80 + i for i in range(26)}
    elif encoding is not None and not cid:
        raise ValueError(f"unknown encoding variant {encoding}")

    objects: dict[int, bytes] = {}  # num -> serialized body (no wrapper)
    streams: dict[int, tuple[bytes, bytes]] = {}  # num -> (dict frag, raw)

    font_extra = b""
    next_num = 4
    font_body = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
    )
    if cid:
        desc_num = next_num
        next_num += 1
        cmap_num = next_num
        next_num += 1
        objects[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FMSCID"
            b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
            b" /Supplement 0 >> >>"
        )
        streams[cmap_num] = (
            b"",
            b"/CIDInit /ProcSet findresource begin\n"
            b"12 dict begin\nbegincmap\n"
            b"/CMapName /FMS-CID-UC def\n/CMapType 2 def\n"
            b"1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
            b"1 beginbfrange\n<0100> <017f> <0000>\nendbfrange\n"
            b"endcmap\nCMapName currentdict /CMap defineresource pop\n"
            b"end\nend",
        )
        font_body = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /FMSCID"
            b" /Encoding /Identity-H /DescendantFonts [%d 0 R]"
            b" /ToUnicode %d 0 R%%s >>" % (desc_num, cmap_num)
        )
    if encoding == "differences":
        diff = b" ".join(b"/" + chr(97 + i).encode() for i in range(26))
        objects[next_num] = (
            b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding"
            b" /Differences [128 " + diff + b"] >>"
        )
        font_extra = b" /Encoding %d 0 R" % next_num
        next_num += 1
    elif encoding == "tounicode":
        cmap = (
            b"/CIDInit /ProcSet findresource begin\n"
            b"12 dict begin\nbegincmap\n"
            b"/CMapName /FMS-UC def\n/CMapType 2 def\n"
            b"1 begincodespacerange\n<00> <ff>\nendcodespacerange\n"
            b"1 beginbfrange\n<80> <99> <0061>\nendbfrange\n"
            b"endcmap\nCMapName currentdict /CMap defineresource pop\n"
            b"end\nend"
        )
        streams[next_num] = (b"", cmap)
        font_extra = b" /ToUnicode %d 0 R" % next_num
        next_num += 1

    objects[3] = font_body % font_extra

    page_nums = []
    for lines in pages:
        cs_num = next_num
        next_num += 1
        pg_num = next_num
        next_num += 1
        raw = _content_stream(
            lines,
            hex_strings=hex_strings,
            line_op=line_op,
            remap=remap,
            tj_kern_spaces=tj_kern_spaces,
            cid=cid,
        )
        enc, filt = _encode_filters(raw, filters)
        streams[cs_num] = (filt.encode("ascii"), enc)
        objects[pg_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >> >>"
            b" /Contents %d 0 R >>" % cs_num
        )
        page_nums.append(pg_num)

    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objects[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % len(pages)
    )
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"

    buf = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    in_objstm: dict[int, int] = {}  # num -> index within the ObjStm

    def emit_stream(num: int, extra_frag: bytes, raw: bytes) -> None:
        offsets[num] = len(buf)
        buf.extend(
            b"%d 0 obj\n<< /Length %d" % (num, len(raw))
            + extra_frag
            + b" >>\nstream\n"
        )
        buf.extend(raw)
        buf.extend(b"\nendstream\nendobj\n")

    the_objstm = None
    if object_streams:
        packed = sorted(objects)
        the_objstm = objstm_num = next_num
        next_num += 1
        header = bytearray()
        body = bytearray()
        for idx, num in enumerate(packed):
            header.extend(b"%d %d " % (num, len(body)))
            body.extend(objects[num] + b"\n")
            in_objstm[num] = idx
        stm = bytes(header) + bytes(body)
        enc = zlib.compress(stm, 6)
        emit_stream(
            objstm_num,
            b" /Type /ObjStm /N %d /First %d /Filter /FlateDecode"
            % (len(packed), len(header)),
            enc,
        )
    else:
        for num in sorted(objects):
            offsets[num] = len(buf)
            buf.extend(b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n")
    for num in sorted(streams):
        frag, raw = streams[num]
        emit_stream(num, frag, raw)

    if not xref_stream:
        size = max(offsets) + 1
        start = len(buf)
        buf.extend(b"xref\n0 %d\n" % size)
        buf.extend(b"0000000000 65535 f \n")
        for num in range(1, size):
            buf.extend(b"%010d 00000 n \n" % offsets[num])
        buf.extend(
            b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (size, start)
        )
        return bytes(buf)

    # cross-reference STREAM (+ optional type-2 entries), PNG Up rows
    xref_num = next_num
    size = xref_num + 1
    rows = bytearray()
    for num in range(size):
        if num == 0:
            rows += b"\x00" + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")
        elif num in in_objstm:
            rows += (
                b"\x02"
                + the_objstm.to_bytes(4, "big")
                + in_objstm[num].to_bytes(2, "big")
            )
        elif num == xref_num:
            rows += b"\x01" + (0).to_bytes(4, "big") + (0).to_bytes(2, "big")
        else:
            rows += b"\x01" + offsets[num].to_bytes(4, "big") + (0).to_bytes(2, "big")
    # fix the self entry after we know the offset: two passes instead —
    # compute offset first (it's just len(buf) now)
    xref_off = len(buf)
    stride = 7
    rows = bytearray(rows)
    self_at = xref_num * stride
    rows[self_at : self_at + 7] = (
        b"\x01" + xref_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
    )
    pred = bytearray()
    prev = bytes(stride)
    for r in range(0, len(rows), stride):
        row = rows[r : r + stride]
        pred.append(2)  # PNG Up
        pred.extend((row[i] - prev[i]) & 0xFF for i in range(stride))
        prev = bytes(row)
    enc = zlib.compress(bytes(pred), 6)
    emit_stream(
        xref_num,
        b" /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R"
        b" /Filter /FlateDecode"
        b" /DecodeParms << /Predictor 12 /Columns %d >>" % (size, stride),
        enc,
    )
    buf.extend(b"startxref\n%d\n%%%%EOF\n" % xref_off)
    return bytes(buf)
