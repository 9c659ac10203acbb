"""EXIF/TIFF IFD codec — pure stdlib, both endians, allocation-bounded.

The privacy-critical sibling of the JPEG/PNG codecs: training images
scraped from the web carry EXIF metadata, and GPS coordinates in
particular are PII that a 100 TB curation pipeline must strip before
release (the text-side twin is :mod:`~pgferry_spark.functions.text`'s
``pii_scrub``).  This module implements the real byte format (TIFF 6.0
IFD structure inside a JPEG APP1 ``Exif\\x00\\x00`` segment, per the
public EXIF 2.3 / TIFF 6.0 specs):

* :func:`encode_exif_tiff` — TIFF block with IFD0 (Make, Model,
  Orientation, DateTime) and an optional GPS sub-IFD (lat/lon as the
  standard RATIONAL degree/minute/second triples + hemisphere refs),
  little- or big-endian;
* :func:`insert_exif_app1` — splice the APP1 segment into a real JPEG
  after SOI;
* :func:`parse_exif` — walk the JPEG markers to APP1, parse the TIFF
  header (either endian), IFD0, and the GPS sub-IFD; every declared
  count/offset is bounded against the payload BEFORE allocation (the
  mp4.py lesson: a 12-byte entry can declare a 2^32 count);
* :func:`strip_gps` — re-encode the APP1 without the GPS IFD, leaving
  every other field byte-intact semantics-wise (re-parse certifies).

Scale posture: all of this runs per-row inside Arrow batches
(``mapInPandas``) — metadata extraction and scrubbing are map-only over
the payload column; no shuffle, no driver involvement.
"""

from __future__ import annotations

import struct

# TIFF field types
_ASCII, _SHORT, _LONG, _RATIONAL = 2, 3, 4, 5
_TYPE_SIZE = {1: 1, _ASCII: 1, _SHORT: 2, _LONG: 4, _RATIONAL: 8}

# IFD0 tags
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_GPS_IFD = 0x8825
# GPS IFD tags
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004

_MAX_IFD_ENTRIES = 512  # sanity cap: EXIF blocks carry dozens, not millions


def _entry(e: str, tag: int, typ: int, cnt: int, val: bytes) -> bytes:
    return struct.pack(e + "HHI", tag, typ, cnt) + val


def _build_ifd(e: str, entries: list[tuple[int, int, int, bytes, bytes]],
               base: int) -> bytes:
    """entries: (tag, type, count, inline_or_empty, external_data).
    ``base`` is the absolute TIFF offset where this IFD starts.  External
    data lands right after the IFD's next-pointer."""
    n = len(entries)
    data_off = base + 2 + n * 12 + 4
    body = struct.pack(e + "H", n)
    tail = b""
    for tag, typ, cnt, inline, ext in entries:
        if ext:
            body += _entry(e, tag, typ, cnt, struct.pack(e + "I", data_off))
            tail += ext
            data_off += len(ext)
        else:
            body += _entry(e, tag, typ, cnt, inline.ljust(4, b"\x00"))
    body += struct.pack(e + "I", 0)  # next IFD: none
    return body + tail


def _ascii_field(e: str, tag: int, text: str):
    raw = text.encode("ascii") + b"\x00"
    if len(raw) <= 4:
        return (tag, _ASCII, len(raw), raw, b"")
    return (tag, _ASCII, len(raw), b"", raw)


def _rational3(e: str, vals: tuple[int, int, int]) -> bytes:
    return b"".join(struct.pack(e + "II", v, 1) for v in vals)


def encode_exif_tiff(
    make: str,
    model: str,
    orientation: int,
    datetime_s: str,
    gps: dict | None = None,
    big_endian: bool = False,
) -> bytes:
    """TIFF block (as embedded in APP1 after ``Exif\\x00\\x00``).  ``gps``
    is ``{"lat": (d, m, s), "lat_ref": "N", "lon": (d, m, s),
    "lon_ref": "E"}`` with integer DMS components (denominator 1 — the
    common camera encoding)."""
    e = ">" if big_endian else "<"
    header = (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, 8)

    ifd0_fields = [
        _ascii_field(e, TAG_MAKE, make),
        _ascii_field(e, TAG_MODEL, model),
        (TAG_ORIENTATION, _SHORT, 1, struct.pack(e + "H", orientation), b""),
        _ascii_field(e, TAG_DATETIME, datetime_s),
    ]
    if gps is not None:
        # placeholder pointer; patched once IFD0's size is known
        ifd0_fields.append((TAG_GPS_IFD, _LONG, 1, struct.pack(e + "I", 0), b""))

    ifd0 = _build_ifd(e, ifd0_fields, base=8)
    if gps is None:
        return header + ifd0

    gps_base = 8 + len(ifd0)
    gps_fields = [
        _ascii_field(e, TAG_GPS_LAT_REF, gps["lat_ref"]),
        (TAG_GPS_LAT, _RATIONAL, 3, b"", _rational3(e, gps["lat"])),
        _ascii_field(e, TAG_GPS_LON_REF, gps["lon_ref"]),
        (TAG_GPS_LON, _RATIONAL, 3, b"", _rational3(e, gps["lon"])),
    ]
    gps_ifd = _build_ifd(e, gps_fields, base=gps_base)
    # patch the GPS pointer inside IFD0 (find its entry slot)
    n = struct.unpack_from(e + "H", ifd0, 0)[0]
    out = bytearray(header + ifd0 + gps_ifd)
    for i in range(n):
        off = 8 + 2 + i * 12 - 8 + len(header)  # abs offset of entry i
        tag = struct.unpack_from(e + "H", out, off)[0]
        if tag == TAG_GPS_IFD:
            struct.pack_into(e + "I", out, off + 8, gps_base)
            break
    return bytes(out)


def wrap_app1(tiff: bytes) -> bytes:
    body = b"Exif\x00\x00" + tiff
    if len(body) + 2 > 0xFFFF:
        raise ValueError("EXIF block too large for one APP1 segment")
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_exif_app1(jpeg: bytes, tiff: bytes) -> bytes:
    """Splice an APP1 Exif segment into a JPEG right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    return jpeg[:2] + wrap_app1(tiff) + jpeg[2:]


def _find_app1_tiff(jpeg: bytes) -> bytes | None:
    """Marker walk to the Exif APP1 segment; returns the TIFF block."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError(f"bad marker byte at {pos}")
        marker = jpeg[pos + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no metadata past
            return None
        seglen = struct.unpack_from(">H", jpeg, pos + 2)[0]
        if seglen < 2 or pos + 2 + seglen > len(jpeg):
            raise ValueError(f"bad segment length at {pos}")
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return jpeg[pos + 10 : pos + 2 + seglen]
        pos += 2 + seglen
    return None


def _read_ifd(e: str, tiff: bytes, off: int) -> list[tuple[int, int, int, bytes]]:
    """Returns (tag, type, count, value_bytes) per entry; external values
    are resolved.  Bounded: entry count capped and every external range
    validated against len(tiff) BEFORE slicing."""
    if off + 2 > len(tiff):
        raise ValueError("IFD offset outside TIFF block")
    (n,) = struct.unpack_from(e + "H", tiff, off)
    if n > _MAX_IFD_ENTRIES or off + 2 + n * 12 + 4 > len(tiff):
        raise ValueError(f"IFD at {off} declares {n} entries beyond payload")
    out = []
    for i in range(n):
        eo = off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, eo)
        size = _TYPE_SIZE.get(typ, 0) * cnt
        if size == 0 or size > len(tiff):
            raise ValueError(f"tag {tag:#06x}: bad type/count {typ}/{cnt}")
        if size <= 4:
            val = tiff[eo + 8 : eo + 8 + size]
        else:
            (voff,) = struct.unpack_from(e + "I", tiff, eo + 8)
            if voff + size > len(tiff):
                raise ValueError(f"tag {tag:#06x}: value range outside payload")
            val = tiff[voff : voff + size]
        out.append((tag, typ, cnt, val))
    return out


def _ascii_val(raw: bytes) -> str:
    return raw.split(b"\x00", 1)[0].decode("ascii", "replace")


def parse_exif(jpeg: bytes) -> dict | None:
    """Parse Make/Model/Orientation/DateTime and the GPS DMS triples out
    of a JPEG's Exif APP1.  Returns None when no Exif segment exists."""
    tiff = _find_app1_tiff(jpeg)
    if tiff is None:
        return None
    if len(tiff) < 8:
        raise ValueError("TIFF block truncated")
    if tiff[:2] == b"II":
        e = "<"
    elif tiff[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("bad TIFF byte-order mark")
    magic, ifd0_off = struct.unpack_from(e + "HI", tiff, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    out: dict = {
        "make": None, "model": None, "orientation": None, "datetime": None,
        "gps": None, "big_endian": e == ">",
    }
    gps_off = None
    for tag, typ, cnt, val in _read_ifd(e, tiff, ifd0_off):
        if tag == TAG_MAKE:
            out["make"] = _ascii_val(val)
        elif tag == TAG_MODEL:
            out["model"] = _ascii_val(val)
        elif tag == TAG_ORIENTATION:
            out["orientation"] = struct.unpack_from(e + "H", val)[0]
        elif tag == TAG_DATETIME:
            out["datetime"] = _ascii_val(val)
        elif tag == TAG_GPS_IFD:
            gps_off = struct.unpack_from(e + "I", val)[0]
    if gps_off is not None:
        gps: dict = {}
        for tag, typ, cnt, val in _read_ifd(e, tiff, gps_off):
            if tag in (TAG_GPS_LAT, TAG_GPS_LON) and typ == _RATIONAL and cnt == 3:
                trip = []
                for i in range(3):
                    num, den = struct.unpack_from(e + "II", val, i * 8)
                    if den == 0:
                        raise ValueError("GPS rational with zero denominator")
                    trip.append(num // den)
                gps["lat" if tag == TAG_GPS_LAT else "lon"] = tuple(trip)
            elif tag in (TAG_GPS_LAT_REF, TAG_GPS_LON_REF):
                key = "lat_ref" if tag == TAG_GPS_LAT_REF else "lon_ref"
                gps[key] = _ascii_val(val)
        out["gps"] = gps or None
    return out


def strip_gps(jpeg: bytes) -> bytes:
    """Remove GPS data by re-encoding the Exif APP1 without the GPS IFD
    (parse → re-encode keeps the operation allocation-bounded and avoids
    in-place offset surgery).  JPEGs without EXIF or without GPS pass
    through unchanged."""
    meta = parse_exif(jpeg)
    if meta is None or meta["gps"] is None:
        return jpeg
    clean = encode_exif_tiff(
        meta["make"] or "", meta["model"] or "",
        meta["orientation"] or 1, meta["datetime"] or "",
        gps=None, big_endian=meta["big_endian"],
    )
    # drop the old APP1, splice the clean one
    pos = 2
    while pos + 4 <= len(jpeg):
        marker = jpeg[pos + 1]
        seglen = struct.unpack_from(">H", jpeg, pos + 2)[0]
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            rest = jpeg[:pos] + jpeg[pos + 2 + seglen :]
            return rest[:2] + wrap_app1(clean) + rest[2:]
        if marker in (0xD9, 0xDA):
            break
        pos += 2 + seglen
    return jpeg
