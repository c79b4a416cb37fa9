"""Metadata stripping for PNG and GIF — the companions to JPEG's
`core/exif.py` scrub, completing the media privacy pass across the
raster formats the engine decodes.

* PNG: chunk-level walk (length/type/data/crc per the PNG spec);
  ancillary metadata chunks are dropped — textual (tEXt/zTXt/iTXt),
  timestamps (tIME), and embedded EXIF (eXIf, which can carry GPS just
  like JPEG APP1).  Critical chunks and everything affecting pixels
  (PLTE, tRNS, gAMA, ...) pass through verbatim, so decoded pixels are
  bit-identical.
* GIF: block-level walk; comment extensions (0x21 0xFE) and plain-text
  extensions (0x21 0x01) are dropped, application extensions OTHER than
  NETSCAPE looping are dropped (XMP metadata ships as an application
  extension); graphic-control extensions, image descriptors and LZW
  data pass through verbatim.

Both walkers are lossless for the image itself and never raise on
malformed input — an unwalkable payload is returned unchanged (the
`strip_exif` convention)."""

from __future__ import annotations

import struct

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
PNG_META_CHUNKS = {b"tEXt", b"zTXt", b"iTXt", b"tIME", b"eXIf"}
GIF_HEADERS = (b"GIF87a", b"GIF89a")


def strip_png_metadata(data: bytes) -> bytes:
    """Drop tEXt/zTXt/iTXt/tIME/eXIf chunks; all other chunks verbatim.
    Non-PNG or structurally unwalkable input is returned unchanged."""
    if data[:8] != PNG_SIGNATURE:
        return data
    out = bytearray(PNG_SIGNATURE)
    pos = 8
    try:
        while pos < len(data):
            if pos + 8 > len(data):
                return data  # truncated chunk header
            (ln,) = struct.unpack(">L", data[pos:pos + 4])
            ctype = data[pos + 4:pos + 8]
            end = pos + 8 + ln + 4  # data + crc
            if end > len(data):
                return data
            if ctype not in PNG_META_CHUNKS:
                out += data[pos:end]
            pos = end
            if ctype == b"IEND":
                break
    except struct.error:
        return data
    return bytes(out)


def _gif_sub_blocks_end(data: bytes, pos: int) -> int:
    """Return the offset just past a sub-block chain starting at pos."""
    while True:
        if pos >= len(data):
            raise ValueError("truncated sub-blocks")
        n = data[pos]
        pos += 1 + n
        if n == 0:
            return pos


def strip_gif_metadata(data: bytes) -> bytes:
    """Drop comment (0xFE) and plain-text (0x01) extensions and non-
    NETSCAPE application (0xFF) extensions; everything else verbatim.
    Non-GIF or unwalkable input is returned unchanged."""
    if data[:6] not in GIF_HEADERS:
        return data
    try:
        if len(data) < 13:
            return data
        flags = data[10]
        pos = 13
        if flags & 0x80:  # global color table
            pos += 3 * (1 << ((flags & 0x07) + 1))
        out = bytearray(data[:pos])
        while pos < len(data):
            block = data[pos]
            if block == 0x3B:  # trailer
                out.append(0x3B)
                pos += 1
                break
            if block == 0x21:  # extension
                label = data[pos + 1]
                end = _gif_sub_blocks_end(data, pos + 2)
                if label in (0xFE, 0x01):
                    pass  # comment / plain text: drop
                elif label == 0xFF:
                    app = data[pos + 3:pos + 3 + 11]
                    if app.startswith(b"NETSCAPE"):
                        out += data[pos:end]  # looping control: keep
                else:
                    out += data[pos:end]  # graphic control etc.: keep
                pos = end
            elif block == 0x2C:  # image descriptor
                ifields = data[pos + 9]
                ipos = pos + 10
                if ifields & 0x80:  # local color table
                    ipos += 3 * (1 << ((ifields & 0x07) + 1))
                ipos += 1  # LZW min code size
                ipos = _gif_sub_blocks_end(data, ipos)
                out += data[pos:ipos]
                pos = ipos
            else:
                return data  # unknown block: leave payload untouched
    except (ValueError, IndexError):
        return data
    return bytes(out)


WAV_META_CHUNKS = {b"id3 ", b"ID3 ", b"bext"}
WAV_META_LIST_FORMS = {b"INFO", b"adtl"}  # tag lists; LIST/wavl is AUDIO


def strip_wav_metadata(data: bytes) -> bytes:
    """Drop RIFF metadata chunks (LIST chunks of form INFO/adtl, id3,
    broadcast-wave bext) from a WAVE file; fmt/data, LIST/wavl (the
    RIFF wave-list form that CARRIES audio) and unknown chunks pass
    through verbatim and the RIFF size field is rewritten.  Non-WAV or
    unwalkable input is returned unchanged."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return data
    out = bytearray(b"RIFF\x00\x00\x00\x00WAVE")
    pos = 12
    try:
        while pos + 8 <= len(data):
            ctype = data[pos:pos + 4]
            (ln,) = struct.unpack("<L", data[pos + 4:pos + 8])
            end = pos + 8 + ln + (ln & 1)  # chunks are word-aligned
            if end > len(data) + 1:
                return data
            drop = ctype in WAV_META_CHUNKS or (
                ctype == b"LIST"
                and data[pos + 8:pos + 12] in WAV_META_LIST_FORMS)
            if not drop:
                out += data[pos:min(end, len(data))]
            pos = end
    except struct.error:
        return data
    struct.pack_into("<L", out, 4, len(out) - 8)
    return bytes(out)


def strip_media_metadata(data: bytes) -> bytes:
    """Route by magic: JPEG -> EXIF strip, PNG -> chunk strip, GIF ->
    extension strip, WAV -> RIFF chunk strip; anything else passes
    through unchanged."""
    if data[:2] == b"\xFF\xD8":
        from article_extractor_spark.core.exif import strip_exif

        return strip_exif(data)
    if data[:8] == PNG_SIGNATURE:
        return strip_png_metadata(data)
    if data[:6] in GIF_HEADERS:
        return strip_gif_metadata(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return strip_wav_metadata(data)
    return data
