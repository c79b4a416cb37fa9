"""Pure-stdlib PNG codec (zlib inflate/deflate + scanline filters).

A real image codec with no third-party dependency: enough of the PNG
spec (RFC 2083) to encode and decode 8-bit grayscale / RGB / RGBA,
non-interlaced, including all five scanline filter types (None, Sub,
Up, Average, Paeth).  This makes the multimodal "real decode" path
genuinely real in codec-less containers — PIL remains a seam for other
formats (`operators/multimodal.py::decode_image_real`).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, pixels: bytes,
               color_type: int = 2, filter_type: int | None = 0) -> bytes:
    """Encode raw pixel bytes (row-major, `channels` bytes per pixel)
    into a PNG.  ``filter_type`` 0-4 applies that filter to every row;
    ``None`` cycles filters per row (y % 5) so a round-trip exercises
    every decode path."""
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} bytes, got {len(pixels)}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        ft = (y % 5) if filter_type is None else filter_type
        raw.append(ft)
        if ft == 0:
            raw += row
        else:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ft == 1:
                    raw.append((row[i] - a) & 0xFF)
                elif ft == 2:
                    raw.append((row[i] - b) & 0xFF)
                elif ft == 3:
                    raw.append((row[i] - (a + b) // 2) & 0xFF)
                else:
                    raw.append((row[i] - _paeth(a, b, c)) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG into ``(width, height, channels, pixel_bytes)``.

    Supports 8-bit depth, color types 0/2/6, no interlace; multiple
    IDAT chunks are concatenated per spec.  Raises ``ValueError`` on
    anything else (truncated stream, bad signature, unsupported
    layout)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    height = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or color_type not in _CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG layout (depth={depth}, "
                    f"color={color_type}, interlace={interlace})")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("bad scanline data length")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 1:
            for i in range(stride):
                row[i] = (row[i] + (row[i - ch] if i >= ch else 0)) & 0xFF
        elif ft == 2:
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown filter type {ft}")
        out += row
        prev = row
    return width, height, ch, bytes(out)
