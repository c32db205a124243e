"""EXIF metadata — the APP1 TIFF stream inside JPEG files.

Image curation filters on EXIF constantly (orientation — without
which a phone photo trains sideways — capture time, camera model,
exposure), and EXIF is just a TIFF IFD chain embedded in a JPEG APP1
segment: this module walks JPEG markers to the ``Exif\\0\\0`` APP1,
reuses the BOTH-byte-order IFD parser from ``sources/geotiff.py``,
follows the ExifIFD pointer (tag 34665), and applies the 8
orientation transforms to decoded pixels. ``build_exif_app1`` writes
a valid little-endian APP1 (the parser's oracle and the probe fixture
path — ``inject_app1`` splices it into any JPEG after SOI).
"""

from __future__ import annotations

import struct

import numpy as np

from flytemosaic_spark.sources.geotiff import _read_ifd

# IFD0 tags
_T_MAKE = 271
_T_MODEL = 272
_T_ORIENTATION = 274
_T_DATETIME = 306
_T_EXIF_IFD = 34665
# Exif sub-IFD tags
_T_EXPOSURE = 33434  # RATIONAL seconds
_T_ISO = 34855
_T_DT_ORIGINAL = 36867
_T_PIX_X = 40962
_T_PIX_Y = 40963


def parse_exif(jpeg: bytes) -> dict:
    """Extract EXIF from a JPEG: ``{"make", "model", "orientation",
    "datetime", "exposure_s", "iso", "pixel_x", "pixel_y"}`` (absent
    fields are None). Raises ValueError when the file has no
    Exif APP1."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    off = 2
    tiff = None
    while off + 4 <= len(jpeg):
        if jpeg[off] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = jpeg[off + 1]
        if marker in (0xD9, 0xDA):  # EOI / SOS: no APP1 found
            break
        (seg_len,) = struct.unpack_from(">H", jpeg, off + 2)
        if marker == 0xE1 and jpeg[off + 4 : off + 10] == b"Exif\x00\x00":
            tiff = jpeg[off + 10 : off + 2 + seg_len]
            break
        off += 2 + seg_len
    if tiff is None:
        raise ValueError("JPEG has no Exif APP1 segment")
    if tiff[:4] == b"II*\x00":
        bo = "<"
    elif tiff[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("Exif TIFF header is malformed")
    (ifd0_off,) = struct.unpack_from(bo + "I", tiff, 4)
    tags, _ = _read_ifd(tiff, bo, ifd0_off)
    out = {
        "make": tags.get(_T_MAKE, [None])[0],
        "model": tags.get(_T_MODEL, [None])[0],
        "orientation": int(tags.get(_T_ORIENTATION, [1])[0]),
        "datetime": tags.get(_T_DATETIME, [None])[0],
        "exposure_s": None,
        "iso": None,
        "pixel_x": None,
        "pixel_y": None,
    }
    if _T_EXIF_IFD in tags:
        sub, _ = _read_ifd(tiff, bo, int(tags[_T_EXIF_IFD][0]))
        if _T_EXPOSURE in sub:
            out["exposure_s"] = float(sub[_T_EXPOSURE][0])
        if _T_ISO in sub:
            out["iso"] = int(sub[_T_ISO][0])
        if _T_DT_ORIGINAL in sub:
            out["datetime"] = sub[_T_DT_ORIGINAL][0]
        if _T_PIX_X in sub:
            out["pixel_x"] = int(sub[_T_PIX_X][0])
        if _T_PIX_Y in sub:
            out["pixel_y"] = int(sub[_T_PIX_Y][0])
    return out


def apply_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """The 8 EXIF orientation transforms -> upright pixels
    ((H, W, C) in, (H', W', C) out; 5-8 swap the axes)."""
    if orientation == 1:
        return arr
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1]
    if orientation == 5:
        return arr.transpose(1, 0, 2)
    if orientation == 6:
        return arr.transpose(1, 0, 2)[:, ::-1]
    if orientation == 7:
        return arr.transpose(1, 0, 2)[::-1, ::-1]
    if orientation == 8:
        return arr.transpose(1, 0, 2)[::-1]
    raise ValueError(f"EXIF orientation {orientation} out of range")


def build_exif_app1(
    make: str = "flytemosaic",
    model: str = "spark",
    orientation: int = 1,
    datetime: str = "2024:01:01 00:00:00",
    exposure: tuple[int, int] = (1, 125),
    iso: int = 100,
    pixel_x: int | None = None,
    pixel_y: int | None = None,
) -> bytes:
    """A valid little-endian Exif APP1 segment (marker + length
    included) — IFD0 with Make/Model/Orientation/DateTime + an Exif
    sub-IFD with ExposureTime/ISO/PixelXDimension/PixelYDimension."""

    def entry(tag, typ, cnt, value_or_off):
        return struct.pack("<HHI", tag, typ, cnt) + value_or_off

    ext = bytearray()

    def ascii_val(s: str):
        data = s.encode("ascii") + b"\x00"
        if len(data) <= 4:
            return 2, len(data), data.ljust(4, b"\x00")
        off = len(ext)
        ext.extend(data)
        return 2, len(data), ("EXT", off)

    # IFD0: 5 entries (incl. ExifIFD pointer), then sub-IFD
    ifd0_entries = []
    for tag, s in ((_T_MAKE, make), (_T_MODEL, model),
                   (_T_DATETIME, datetime)):
        typ, cnt, val = ascii_val(s)
        ifd0_entries.append((tag, typ, cnt, val))
    ifd0_entries.append(
        (_T_ORIENTATION, 3, 1, struct.pack("<HH", orientation, 0))
    )
    sub_entries = [
        (_T_EXPOSURE, 5, 1, ("EXT_RAT", exposure)),
        (_T_ISO, 3, 1, struct.pack("<HH", iso, 0)),
    ]
    if pixel_x is not None:
        sub_entries.append((_T_PIX_X, 4, 1, struct.pack("<I", pixel_x)))
    if pixel_y is not None:
        sub_entries.append((_T_PIX_Y, 4, 1, struct.pack("<I", pixel_y)))
    sub_entries.sort(key=lambda e: e[0])

    ifd0_off = 8
    ifd0_size = 2 + 12 * (len(ifd0_entries) + 1) + 4
    sub_off = ifd0_off + ifd0_size
    sub_size = 2 + 12 * len(sub_entries) + 4
    ext_base = sub_off + sub_size

    def render(entries):
        body = struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            if isinstance(val, tuple) and val[0] == "EXT":
                body += entry(tag, typ, cnt,
                              struct.pack("<I", ext_base + val[1]))
            elif isinstance(val, tuple) and val[0] == "EXT_RAT":
                off = len(ext)
                ext.extend(struct.pack("<II", *val[1]))
                body += entry(tag, typ, cnt,
                              struct.pack("<I", ext_base + off))
            else:
                body += entry(tag, typ, cnt, val)
        return body + struct.pack("<I", 0)

    ifd0_full = list(ifd0_entries) + [
        (_T_EXIF_IFD, 4, 1, struct.pack("<I", sub_off))
    ]
    ifd0_full.sort(key=lambda e: e[0])
    tiff = b"II*\x00" + struct.pack("<I", ifd0_off)
    tiff += render(ifd0_full)
    tiff += render(sub_entries)
    tiff += bytes(ext)
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def inject_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI of any JPEG."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]
