"""EXIF/TIFF codec goldens — strip_gps tag-preservation (VERDICT r7 #1).

The r7 scrub re-encoded only the four known IFD0 fields, destroying the
EXIF sub-IFD, maker notes and any vendor tag.  These goldens pin the
fixed contract: strip_gps copies the whole IFD0 tree — every entry of
every tag, known or unknown, including the 0x8769 EXIF sub-IFD — and
drops ONLY the GPS pointer + its sub-IFD.  Reference semantics: the
public EXIF 2.3 / TIFF 6.0 specs; exiftool's ``-gps:all=`` behavior.
"""

import struct

import pytest

from pgferry_spark.multimodal import exif as X
from pgferry_spark.multimodal.jpeg import QUANT_UNIT, encode_jpeg_gray


def _base_jpeg() -> bytes:
    return encode_jpeg_gray(8, 8, bytes([17]) * 64, quant=QUANT_UNIT)


GPS = {
    "lat": (48, 51, 24),
    "lat_ref": "N",
    "lon": (2, 21, 8),
    "lon_ref": "E",
}


@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_with_exif_subifd(big_endian):
    tiff = X.encode_exif_tiff(
        "CamX", "M3", 6, "2026:02:01 12:00:00",
        gps=GPS, big_endian=big_endian,
        exif={"exposure": (1, 125), "iso": 400},
    )
    jpeg = X.insert_exif_app1(_base_jpeg(), tiff)
    m = X.parse_exif(jpeg)
    assert m["make"] == "CamX" and m["model"] == "M3"
    assert m["orientation"] == 6
    assert m["gps"] == {
        "lat": (48, 51, 24), "lat_ref": "N",
        "lon": (2, 21, 8), "lon_ref": "E",
    }
    assert m["exposure"] == (1, 125)
    assert m["iso"] == 400
    assert m["big_endian"] is big_endian


@pytest.mark.parametrize("big_endian", [False, True])
def test_strip_gps_preserves_exif_subifd(big_endian):
    tiff = X.encode_exif_tiff(
        "CamX", "M3", 6, "2026:02:01 12:00:00",
        gps=GPS, big_endian=big_endian,
        exif={"exposure": (1, 125), "iso": 400},
    )
    jpeg = X.insert_exif_app1(_base_jpeg(), tiff)
    out = X.strip_gps(jpeg)
    m = X.parse_exif(out)
    assert m["gps"] is None
    # every non-GPS field survives the re-encode
    assert m["make"] == "CamX" and m["model"] == "M3"
    assert m["orientation"] == 6 and m["datetime"] == "2026:02:01 12:00:00"
    assert m["exposure"] == (1, 125)
    assert m["iso"] == 400
    # and no GPS bytes linger anywhere in the APP1
    assert X._find_app1_tiff(out) is not None


def _tags(tree):
    """Flatten a tree to {tag: (typ, cnt, val)} with sub-IFDs nested."""
    out = {}
    for tag, typ, cnt, val, sub in tree:
        out[tag] = (typ, cnt, val) if sub is None else _tags(sub)
    return out


@pytest.mark.parametrize("big_endian", [False, True])
def test_strip_gps_preserves_unknown_tags_byte_semantically(big_endian):
    """The r7 defect golden: tags the scrub has never heard of — an ASCII
    ImageDescription with an EXTERNAL (>4 byte) value, an UNDEFINED-type
    UserComment inside the EXIF sub-IFD, and a vendor SHORT tag — must
    come out with identical (tag, type, count, value)."""
    e = ">" if big_endian else "<"
    desc = b"A long description exceeding four bytes\x00"
    comment = b"ASCII\x00\x00\x00scrub should not touch me"
    tree = [
        (0x010E, 2, len(desc), desc, None),            # ImageDescription
        X._tree_ascii(X.TAG_MAKE, "CamQ"),
        (X.TAG_ORIENTATION, 3, 1, struct.pack(e + "H", 3), None),
        (X.TAG_EXIF_IFD, 4, 1, b"", [
            (X.TAG_EXPOSURE, 5, 1, struct.pack(e + "II", 1, 60), None),
            (X.TAG_ISO, 3, 1, struct.pack(e + "H", 200), None),
            (0x9286, 7, len(comment), comment, None),  # UserComment
        ]),
        (X.TAG_GPS_IFD, 4, 1, b"", [
            X._tree_ascii(X.TAG_GPS_LAT_REF, "N"),
            (X.TAG_GPS_LAT, 5, 3, X._rational3(e, (1, 2, 3)), None),
        ]),
        (0x9C9B, 3, 2, struct.pack(e + "HH", 7, 9), None),  # vendor SHORT
    ]
    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(e + "HI", 42, 8)
        + X._encode_ifd_tree(e, tree, 8)
    )
    jpeg = X.insert_exif_app1(_base_jpeg(), tiff)

    out = X.strip_gps(jpeg)
    got = _tags(X._read_ifd_tree(e, X._find_app1_tiff(out), 8))
    want = _tags(X._read_ifd_tree(e, X._find_app1_tiff(jpeg), 8))
    want.pop(X.TAG_GPS_IFD)
    assert got == want
    assert X.TAG_GPS_IFD not in got
    assert got[0x010E] == (2, len(desc), desc)
    assert got[X.TAG_EXIF_IFD][0x9286] == (7, len(comment), comment)
    assert got[0x9C9B] == (3, 2, struct.pack(e + "HH", 7, 9))


def test_strip_gps_passthrough_without_gps_is_byte_identical():
    tiff = X.encode_exif_tiff(
        "CamX", "M3", 1, "2026:02:01 12:00:00",
        gps=None, exif={"exposure": (1, 30), "iso": 100},
    )
    jpeg = X.insert_exif_app1(_base_jpeg(), tiff)
    assert X.strip_gps(jpeg) == jpeg
    # no EXIF at all: also byte-identical
    assert X.strip_gps(_base_jpeg()) == _base_jpeg()


def test_strip_gps_idempotent():
    tiff = X.encode_exif_tiff(
        "CamX", "M3", 1, "2026:02:01 12:00:00",
        gps=GPS, exif={"exposure": (1, 30), "iso": 100},
    )
    jpeg = X.insert_exif_app1(_base_jpeg(), tiff)
    once = X.strip_gps(jpeg)
    assert X.strip_gps(once) == once


@pytest.mark.parametrize("big_endian", [False, True])
def test_strip_gps_finds_gps_nested_in_exif_subifd(big_endian):
    """Round-9 ADVICE (medium): a (nonstandard) 0x8825 GPS pointer nested
    INSIDE the 0x8769 EXIF sub-IFD must not ride the byte-identical
    passthrough — the presence check walks the full tree and the scrub
    prunes the nested pointer too."""
    e = ">" if big_endian else "<"
    tree = [
        X._tree_ascii(X.TAG_MAKE, "CamZ"),
        (X.TAG_EXIF_IFD, 4, 1, b"", [
            (X.TAG_ISO, 3, 1, struct.pack(e + "H", 200), None),
            (X.TAG_GPS_IFD, 4, 1, b"", [
                X._tree_ascii(X.TAG_GPS_LAT_REF, "N"),
                (X.TAG_GPS_LAT, 5, 3, X._rational3(e, (48, 51, 24)), None),
            ]),
        ]),
    ]
    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(e + "HI", 42, 8)
        + X._encode_ifd_tree(e, tree, 8)
    )
    jpeg = X.insert_exif_app1(_base_jpeg(), tiff)
    # the gate sees the nested GPS
    assert X.parse_exif(jpeg)["gps"] == {"lat": (48, 51, 24), "lat_ref": "N"}
    out = X.strip_gps(jpeg)
    assert out != jpeg
    got = _tags(X._read_ifd_tree(e, X._find_app1_tiff(out), 8))
    assert X.TAG_GPS_IFD not in got[X.TAG_EXIF_IFD]
    assert got[X.TAG_EXIF_IFD][X.TAG_ISO] == (3, 1, struct.pack(e + "H", 200))
    assert X.parse_exif(out)["gps"] is None
    # and the raw GPS rational bytes are gone from the payload
    assert X._rational3(e, (48, 51, 24)) not in out


@pytest.mark.parametrize("big_endian", [False, True])
def test_encoder_word_aligns_external_values(big_endian):
    """TIFF 6.0 word alignment (round-9 ADVICE): an ODD-length external
    ASCII value must not leave subsequent value/sub-IFD offsets odd.
    Declared counts stay the odd lengths; only the blob is padded."""
    e = ">" if big_endian else "<"
    odd = b"odd-length-value!\x00"          # 18 -> even baseline
    odd = odd[:-1]                           # 17: odd external value
    desc = b"another external value\x00"     # follows the odd blob
    tree = [
        (0x010E, 2, len(odd), odd, None),
        (0x010F, 2, len(desc), desc, None),
        (X.TAG_EXIF_IFD, 4, 1, b"", [
            (X.TAG_ISO, 3, 1, struct.pack(e + "H", 100), None),
        ]),
    ]
    blob = X._encode_ifd_tree(e, tree, 8)
    assert len(blob) % 2 == 0
    tiff = (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, 8) + blob
    # every external value offset and the sub-IFD pointer are even
    n = struct.unpack_from(e + "H", tiff, 8)[0]
    for i in range(n):
        eo = 8 + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, eo)
        size = X._TYPE_SIZE[typ] * cnt
        if size > 4 or tag == X.TAG_EXIF_IFD:
            off = struct.unpack_from(e + "I", tiff, eo + 8)[0]
            assert off % 2 == 0, f"tag {tag:#06x} at odd offset {off}"
    # counts/values round-trip unchanged
    got = _tags(X._read_ifd_tree(e, tiff, 8))
    assert got[0x010E] == (2, len(odd), odd)
    assert got[0x010F] == (2, len(desc), desc)


def test_ifd_entry_bomb_still_rejected():
    """Allocation bound survives the refactor: an IFD that declares 2^16-1
    entries beyond the payload must raise, not allocate."""
    e = "<"
    tiff = b"II" + struct.pack(e + "HI", 42, 8) + struct.pack(e + "H", 0xFFFF)
    jpeg = X.insert_exif_app1(_base_jpeg(), tiff)
    with pytest.raises(ValueError):
        X.parse_exif(jpeg)


def test_pointer_cycle_bounded():
    """A self-pointing EXIF-IFD pointer must hit the depth bound, not
    recurse forever."""
    e = "<"
    # IFD0 at 8 with one entry: EXIF pointer -> offset 8 (itself)
    ifd = struct.pack(e + "H", 1) + struct.pack(
        e + "HHI", X.TAG_EXIF_IFD, 4, 1
    ) + struct.pack(e + "I", 8) + struct.pack(e + "I", 0)
    tiff = b"II" + struct.pack(e + "HI", 42, 8) + ifd
    with pytest.raises(ValueError):
        X._read_ifd_tree(e, tiff, 8)
