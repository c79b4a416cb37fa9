"""Pure-stdlib EXIF (APP1) parsing and stripping for JPEG payloads.

Web-crawl images routinely carry EXIF metadata including GPS
coordinates — a privacy liability a training-data pipeline must be able
to measure and remove.  This implements the two halves at the level the
formats actually define them (public specs: JPEG/JFIF T.81 segment
grammar; EXIF 2.3 = a TIFF 6.0 IFD tree embedded in APP1):

* :func:`parse_exif` — walk the JPEG segment stream, find the
  ``Exif\\x00\\x00`` APP1 payload, honor its byte-order mark (II/MM),
  walk IFD0 -> {Exif sub-IFD, GPS IFD} and decode the common scalar/
  ASCII/RATIONAL tags (Make, Model, Orientation, DateTime, GPS
  lat/lon with hemisphere signs).
* :func:`strip_exif` — lossless scrub: remove APP1(Exif) segments at
  the SEGMENT level, leaving every other byte (including the entropy-
  coded image data) untouched, so the decoded pixels are bit-identical
  before and after.

Malformed metadata raises :class:`ExifError` from ``parse_exif`` but
never corrupts ``strip_exif`` (an unparseable APP1 is still a
well-delimited segment and is still removed).
"""

from __future__ import annotations

import struct

EXIF_HEADER = b"Exif\x00\x00"

# tag ids (EXIF 2.3 / TIFF 6.0)
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
GPS_LAT_REF = 0x0001
GPS_LAT = 0x0002
GPS_LON_REF = 0x0003
GPS_LON = 0x0004
TAG_DATETIME_ORIGINAL = 0x9003

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


class ExifError(ValueError):
    pass


def _segments(data: bytes):
    """Yield (marker, start, end) for every JPEG segment; entropy-coded
    scan data ends iteration (we never need to look past SOS here)."""
    if data[:2] != b"\xFF\xD8":
        raise ExifError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ExifError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI: yield it (and any trailer) verbatim
            yield marker, pos, len(data)
            return
        if marker == 0xDA:  # SOS: entropy data follows, stop walking
            yield marker, pos, len(data)
            return
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        if ln < 2 or pos + 2 + ln > len(data):
            raise ExifError("truncated segment")
        yield marker, pos, pos + 2 + ln
        pos += 2 + ln
    if pos < len(data):
        # <4 bytes left: not a walkable segment, but the strip contract
        # promises every non-Exif byte passes through verbatim
        yield None, pos, len(data)


def _read_ifd(tiff: bytes, offset: int, bo: str) -> dict[int, object]:
    """Decode one IFD's tags into {tag: value} (first value for arrays,
    full list for RATIONAL GPS coordinates)."""
    out: dict[int, object] = {}
    if offset + 2 > len(tiff):
        raise ExifError("IFD offset out of range")
    (n,) = struct.unpack(bo + "H", tiff[offset:offset + 2])
    for i in range(n):
        e = offset + 2 + 12 * i
        if e + 12 > len(tiff):
            raise ExifError("truncated IFD entry")
        tag, typ, cnt = struct.unpack(bo + "HHL", tiff[e:e + 8])
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip, per TIFF readers' convention
        total = size * cnt
        if total <= 4:
            raw = tiff[e + 8:e + 8 + total]
        else:
            (off,) = struct.unpack(bo + "L", tiff[e + 8:e + 12])
            if off + total > len(tiff):
                raise ExifError("tag data out of range")
            raw = tiff[off:off + total]
        if typ == 2:  # ASCII
            out[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 3:  # SHORT
            out[tag] = struct.unpack(bo + "H", raw[:2])[0]
        elif typ == 4:  # LONG
            out[tag] = struct.unpack(bo + "L", raw[:4])[0]
        elif typ == 5:  # RATIONAL list
            out[tag] = [struct.unpack(bo + "LL", raw[j:j + 8])
                        for j in range(0, total, 8)]
    return out


def _dms_to_degrees(rats, ref: str) -> float:
    deg = sum((n / d if d else 0.0) / (60 ** i)
              for i, (n, d) in enumerate(rats[:3]))
    return -deg if ref in ("S", "W") else deg


def parse_exif(data: bytes) -> dict:
    """{'make','model','orientation','datetime','gps_lat','gps_lon'}
    (keys present only when the tag is) or {} when no EXIF APP1 exists."""
    payload = None
    for marker, start, end in _segments(data):
        if marker == 0xE1 and data[start + 4:start + 10] == EXIF_HEADER:
            payload = data[start + 10:end]
            break
    if payload is None:
        return {}
    # Normalize every malformation class to ExifError so the Arrow
    # operator's single except clause holds: degenerate entries raise
    # struct.error (short buffers), type-confused tags raise TypeError
    # (a GPS coordinate stored as a scalar reaching the DMS fold) or
    # bare ValueError (a coordinate stored as ASCII: iterating the
    # string unpacks 1-char items — found by the bit-flip fuzz).
    try:
        return _parse_tiff(payload)
    except ExifError:
        raise
    except (struct.error, TypeError, IndexError, OverflowError,
            ValueError) as exc:
        raise ExifError(f"malformed EXIF: {type(exc).__name__}: {exc}") \
            from exc


def _parse_tiff(payload: bytes) -> dict:
    if len(payload) < 8:
        raise ExifError("EXIF payload too short")
    order = payload[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ExifError(f"bad TIFF byte order {order!r}")
    magic, ifd0_off = struct.unpack(bo + "HL", payload[2:8])
    if magic != 42:
        raise ExifError("bad TIFF magic")
    ifd0 = _read_ifd(payload, ifd0_off, bo)
    out: dict = {}
    if TAG_MAKE in ifd0:
        out["make"] = ifd0[TAG_MAKE]
    if TAG_MODEL in ifd0:
        out["model"] = ifd0[TAG_MODEL]
    if TAG_ORIENTATION in ifd0:
        out["orientation"] = ifd0[TAG_ORIENTATION]
    if TAG_DATETIME in ifd0:
        out["datetime"] = ifd0[TAG_DATETIME]
    if TAG_EXIF_IFD in ifd0:
        sub = _read_ifd(payload, ifd0[TAG_EXIF_IFD], bo)
        if TAG_DATETIME_ORIGINAL in sub:
            out["datetime_original"] = sub[TAG_DATETIME_ORIGINAL]
    if TAG_GPS_IFD in ifd0:
        gps = _read_ifd(payload, ifd0[TAG_GPS_IFD], bo)
        if GPS_LAT in gps and GPS_LAT_REF in gps:
            out["gps_lat"] = _dms_to_degrees(gps[GPS_LAT], gps[GPS_LAT_REF])
        if GPS_LON in gps and GPS_LON_REF in gps:
            out["gps_lon"] = _dms_to_degrees(gps[GPS_LON], gps[GPS_LON_REF])
    return out


def strip_exif(data: bytes) -> bytes:
    """Remove every APP1(Exif) segment; all other bytes — including the
    entropy-coded scan — pass through verbatim, so decoded pixels are
    bit-identical.  Non-JPEG input is returned unchanged."""
    if data[:2] != b"\xFF\xD8":
        return data
    out = bytearray(b"\xFF\xD8")
    try:
        for marker, start, end in _segments(data):
            if marker == 0xE1 and data[start + 4:start + 10] == EXIF_HEADER:
                continue
            out += data[start:end]
    except ExifError:
        return data  # structurally unwalkable: leave untouched
    return bytes(out)


def build_exif_jpeg(jpeg: bytes, *, make: str | None = None,
                    model: str | None = None, orientation: int | None = None,
                    datetime_str: str | None = None,
                    gps: tuple[float, float] | None = None,
                    byte_order: str = "<") -> bytes:
    """Test/fixture helper: insert a hand-built EXIF APP1 (II or MM) after
    SOI of an existing JPEG.  Writes real TIFF IFDs — the parser is
    exercised against independently-constructed bytes."""
    bo = byte_order
    entries0 = []
    blobs = bytearray()

    def ascii_entry(tag, s):
        raw = s.encode("ascii") + b"\x00"
        return (tag, 2, len(raw), raw)

    if make is not None:
        entries0.append(ascii_entry(TAG_MAKE, make))
    if model is not None:
        entries0.append(ascii_entry(TAG_MODEL, model))
    if orientation is not None:
        entries0.append((TAG_ORIENTATION, 3, 1,
                         struct.pack(bo + "H", orientation)))
    if datetime_str is not None:
        entries0.append(ascii_entry(TAG_DATETIME, datetime_str))

    gps_entries = []
    if gps is not None:
        lat, lon = gps

        def dms(v):
            v = abs(v)
            d = int(v)
            m = int((v - d) * 60)
            s = round(((v - d) * 60 - m) * 60 * 10000)
            return b"".join(struct.pack(bo + "LL", *p)
                            for p in ((d, 1), (m, 1), (s, 10000)))

        gps_entries = [
            (GPS_LAT_REF, 2, 2, (b"S" if lat < 0 else b"N") + b"\x00"),
            (GPS_LAT, 5, 3, dms(lat)),
            (GPS_LON_REF, 2, 2, (b"W" if lon < 0 else b"E") + b"\x00"),
            (GPS_LON, 5, 3, dms(lon)),
        ]
        entries0.append((TAG_GPS_IFD, 4, 1, None))  # patched below

    # layout: header(8) + IFD0 + [GPS IFD] + blob area
    n0 = len(entries0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    gps_off = ifd0_off + ifd0_size
    gps_size = (2 + 12 * len(gps_entries) + 4) if gps_entries else 0
    blob_off = gps_off + gps_size

    def encode_ifd(entries, blob_off):
        body = struct.pack(bo + "H", len(entries))
        for tag, typ, cnt, raw in entries:
            if raw is None:  # GPS IFD pointer
                val = struct.pack(bo + "L", gps_off)
            elif len(raw) <= 4:
                val = raw + b"\x00" * (4 - len(raw))
            else:
                val = struct.pack(bo + "L", blob_off)
                blobs.extend(raw)
                blob_off += len(raw)
            body += struct.pack(bo + "HHL", tag, typ, cnt) + val
        return body + struct.pack(bo + "L", 0), blob_off

    ifd0_body, blob_off = encode_ifd(entries0, blob_off)
    gps_body = b""
    if gps_entries:
        gps_body, blob_off = encode_ifd(gps_entries, blob_off)

    tiff = (b"II" if bo == "<" else b"MM") \
        + struct.pack(bo + "HL", 42, ifd0_off) + ifd0_body + gps_body \
        + bytes(blobs)
    app1 = EXIF_HEADER + tiff
    seg = b"\xFF\xE1" + struct.pack(">H", len(app1) + 2) + app1
    if jpeg[:2] != b"\xFF\xD8":
        raise ExifError("base is not a JPEG")
    return jpeg[:2] + seg + jpeg[2:]
