"""EXIF parse/scrub: value parity against independently-built TIFF IFDs
(both byte orders), pixel-identity after scrubbing through the real JPEG
codec, distributed operators, and corruption fail-clean."""

import pytest

from article_extractor_spark.core.exif import (ExifError, build_exif_jpeg,
                                               parse_exif, strip_exif)
from article_extractor_spark.core.jpeg import decode_jpeg, encode_jpeg_gray


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-exif-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def base_jpeg(seed=0):
    px = bytes((seed + x * 3 + y * 5) % 256
               for y in range(16) for x in range(16))
    return encode_jpeg_gray(16, 16, px)


@pytest.mark.parametrize("bo", ["<", ">"])
def test_parse_roundtrip_both_byte_orders(bo):
    jpg = build_exif_jpeg(
        base_jpeg(), make="AcmeCam", model="X100",
        orientation=6, datetime_str="2024:03:04 05:06:07",
        gps=(48.8583, 2.2945), byte_order=bo)
    e = parse_exif(jpg)
    assert e["make"] == "AcmeCam" and e["model"] == "X100"
    assert e["orientation"] == 6
    assert e["datetime"] == "2024:03:04 05:06:07"
    assert abs(e["gps_lat"] - 48.8583) < 1e-4
    assert abs(e["gps_lon"] - 2.2945) < 1e-4


def test_southern_western_hemispheres():
    # a genuine S/W point (Valparaíso): refs must come back signed
    jpg = build_exif_jpeg(base_jpeg(), gps=(-33.0458, -71.6197))
    e = parse_exif(jpg)
    assert e["gps_lat"] < 0 and e["gps_lon"] < 0
    assert abs(e["gps_lat"] + 33.0458) < 1e-4
    assert abs(e["gps_lon"] + 71.6197) < 1e-4


def test_no_exif_returns_empty():
    assert parse_exif(base_jpeg()) == {}


def test_strip_preserves_pixels_exactly():
    jpg = build_exif_jpeg(base_jpeg(3), make="Cam", gps=(1.5, 2.5))
    assert parse_exif(jpg)  # EXIF present before
    stripped = strip_exif(jpg)
    assert parse_exif(stripped) == {}
    assert len(stripped) < len(jpg)
    w0, h0, n0, px0 = decode_jpeg(base_jpeg(3))
    w1, h1, n1, px1 = decode_jpeg(stripped)
    assert (w0, h0, px0) == (w1, h1, px1)  # bit-identical pixels


def test_strip_non_jpeg_passthrough():
    assert strip_exif(b"not a jpeg") == b"not a jpeg"
    assert strip_exif(b"") == b""


def test_corrupt_exif_parse_fails_clean_strip_still_works():
    jpg = bytearray(build_exif_jpeg(base_jpeg(), make="Cam", gps=(1.0, 2.0)))
    # corrupt the TIFF header inside APP1 (after FFD8 FFE1 len Exif\0\0)
    jpg[12] ^= 0xFF
    with pytest.raises(ExifError):
        parse_exif(bytes(jpg))
    # the segment is still well-delimited: scrub removes it regardless
    stripped = strip_exif(bytes(jpg))
    assert parse_exif(stripped) == {}


def test_distributed_stats_and_scrub(spark):
    from article_extractor_spark.operators.exifops import (exif_stats,
                                                           scrub_exif)

    rows = [
        (1, build_exif_jpeg(base_jpeg(1), make="CamA", gps=(10.0, 20.0))),
        (2, build_exif_jpeg(base_jpeg(2), model="B2", orientation=3)),
        (3, base_jpeg(3)),
        (4, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    stats = {r["media_id"]: r for r in exif_stats(df).collect()}
    assert stats[1]["has_gps"] == 1 and stats[1]["make"] == "CamA"
    assert abs(stats[1]["gps_lat"] - 10.0) < 1e-4
    assert stats[2]["has_exif"] == 1 and stats[2]["has_gps"] == 0
    assert stats[2]["orientation"] == 3
    assert stats[3]["has_exif"] == 0
    assert stats[4]["error"] is not None  # not a JPEG: ExifError row

    scrubbed = {r["media_id"]: r for r in scrub_exif(df).collect()}
    assert scrubbed[1]["bytes_removed"] > 0
    assert parse_exif(bytes(scrubbed[1]["content"])) == {}
    assert scrubbed[3]["bytes_removed"] == 0
    assert bytes(scrubbed[4]["content"]) == b"not an image"


def test_degenerate_ifd_entries_raise_exif_error_only():
    """Type-confused tags (GPS coordinate stored scalar) and zero-count
    entries must surface as ExifError, never struct.error/TypeError —
    the Arrow operator catches exactly ExifError."""
    import struct as st

    def tiff(entries):
        body = st.pack("<H", len(entries))
        for tag, typ, cnt, val4 in entries:
            body += st.pack("<HHL", tag, typ, cnt) + val4
        return b"II" + st.pack("<HL", 42, 8) + body + st.pack("<L", 0)

    app1 = b"Exif\x00\x00"
    base = base_jpeg()
    # GPS IFD pointer to an IFD whose GPSLat is a SHORT scalar, not RATIONAL
    gps_ifd_off = 8 + 2 + 12 + 4
    t = (b"II" + st.pack("<HL", 42, 8)
         + st.pack("<H", 1) + st.pack("<HHL", 0x8825, 4, 1)
         + st.pack("<L", gps_ifd_off) + st.pack("<L", 0)
         + st.pack("<H", 2)
         + st.pack("<HHL", 0x0001, 2, 2) + b"N\x00\x00\x00"
         + st.pack("<HHL", 0x0002, 3, 1) + st.pack("<L", 7)
         + st.pack("<L", 0))
    for payload in (
        tiff([(0x0112, 3, 0, b"\x00" * 4)]),   # SHORT with count 0
        t,                                        # scalar GPS latitude
    ):
        seg = app1 + payload
        jpg = (base[:2] + b"\xFF\xE1" + st.pack(">H", len(seg) + 2)
               + seg + base[2:])
        with pytest.raises(ExifError):
            parse_exif(jpg)


def test_strip_preserves_eoi_and_trailer_on_degenerate_jpeg():
    """ADVICE r5: a JPEG with no SOS (SOI + APP1(Exif) + EOI [+ trailer])
    must keep its EOI marker and trailing bytes through strip_exif —
    'every other byte passes through verbatim'."""
    import struct

    from article_extractor_spark.core.exif import EXIF_HEADER, strip_exif

    app1_payload = EXIF_HEADER + b"II*\x00\x08\x00\x00\x00\x00\x00"
    app1 = b"\xFF\xE1" + struct.pack(">H", 2 + len(app1_payload)) + app1_payload
    com = b"\xFF\xFE" + struct.pack(">H", 7) + b"hello"
    for trailer in (b"", b"\x01\x02"):
        data = b"\xFF\xD8" + app1 + com + b"\xFF\xD9" + trailer
        out = strip_exif(data)
        assert out == b"\xFF\xD8" + com + b"\xFF\xD9" + trailer
