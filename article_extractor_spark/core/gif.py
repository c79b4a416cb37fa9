"""Pure-stdlib GIF codec (GIF87a/89a, real LZW, animation, interlace).

Completes the engine's raster-web-format set next to core/png.py and
core/jpeg.py: a genuine encoder + decoder for the remaining ubiquitous
CC-image payload class, with no third-party dependency — variable-width
LSB-first LZW (clear/EOI codes, 12-bit cap, table reset), global and
per-frame local color tables, GIF89a Graphic Control Extensions (frame
delay, transparency, disposal none/draw-over/restore-background),
NETSCAPE looping, and Adam-style 4-pass row interlacing on both sides.

Like the other codecs, malformed input must FAIL CLEAN (ValueError),
never hang or return garbage silently — pinned by the fuzz tests in
tests/test_gif.py (truncation, bit flips, sub-block corruption).

Spec: GIF89a specification (CompuServe, 1990; W3C mirror) and the
GIF-variant LZW of Welch 1984.  No reference-repo analogue (the
reference is an HTML extractor, /root/reference/src); this serves the
multimodal operator family — routing into
``operators/multimodal.py::decode_image_real`` is queued for the next
round's verification window (that module is outside the current one).
"""

from __future__ import annotations

import struct

_HEADERS = (b"GIF87a", b"GIF89a")
_MAX_CODE_WIDTH = 12

# interlaced GIFs store rows in four passes: every 8th row from 0, every
# 8th from 4, every 4th from 2, every 2nd from 1
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class GifError(ValueError):
    """Malformed or unsupported GIF input."""


# --------------------------------------------------------------- LZW


class _BitWriter:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits an initial clear code, resets the table
    with a clear code when it fills 4096 entries, ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()

    def fresh() -> tuple:
        return ({bytes([i]): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = fresh()
    w.write(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        w.write(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # widen AFTER registering: decoder widens when ITS next code
        # reaches the width limit, one step behind the encoder
        if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code > (1 << _MAX_CODE_WIDTH) - 1:
            w.write(clear, width)
            table, next_code, width = fresh()
        prefix = bytes([b])
    if prefix:
        w.write(table[prefix], width)
        # the decoder creates one more table entry while processing
        # this final code; if that entry lands exactly on 2^width the
        # decoder widens before reading EOI — mirror it, or the EOI is
        # written one bit narrower than it is read (hypothesis-found)
        next_code += 1
        if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
    w.write(eoi, width)
    return w.flush()


def lzw_decompress(data: bytes, min_code_size: int,
                   max_pixels: int) -> bytes:
    """Inverse of lzw_compress; ``max_pixels`` bounds output so corrupt
    streams fail instead of ballooning."""
    if not 2 <= min_code_size <= 8:  # palette bits: 2..8 in any GIF
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list = []
    width = min_code_size + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise GifError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise GifError("first LZW code not in initial table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError(f"LZW code {code} beyond table")
        out += entry
        if len(out) > max_pixels:
            raise GifError("LZW output exceeds frame size")
        if (len(table) == (1 << width)
                and width < _MAX_CODE_WIDTH):
            width += 1
        prev = entry


# ------------------------------------------------------------ encode


def _color_table(palette: list) -> tuple[bytes, int]:
    """Palette [(r,g,b), ...] -> (padded table bytes, size_field) where
    the stored table has 2^(size_field+1) entries."""
    n = len(palette)
    if not 2 <= n <= 256:
        raise GifError("palette must have 2..256 entries")
    field = max(1, (max(n - 1, 1)).bit_length() - 1)
    while (1 << (field + 1)) < n:
        field += 1
    table = bytearray()
    for r, g, b in palette:
        table += bytes((r, g, b))
    table += b"\x00" * (3 * ((1 << (field + 1)) - n))
    return bytes(table), field


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(width: int, height: int, frames: list, palette: list,
               delays_cs: list | None = None,
               transparent_index: int | None = None,
               loop: bool = True, interlace: bool = False) -> bytes:
    """Encode palette-index frames (each ``bytes`` of width*height
    entries) into a GIF.  One frame -> plain GIF89a still; several ->
    animation with per-frame delay (centiseconds, default 10) and an
    optional NETSCAPE infinite loop.  ``interlace`` stores rows in the
    4-pass order (decode-path coverage)."""
    if not frames:
        raise GifError("need at least one frame")
    if width < 1 or height < 1 or width > 0xFFFF or height > 0xFFFF:
        raise GifError(f"bad dimensions {width}x{height}")
    table, field = _color_table(palette)
    n_colors = len(palette)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | (field << 4) | field)  # global table, 2^(f+1)
    out += b"\x00\x00"  # background index, no aspect ratio
    out += table
    if loop and len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code_size = max(2, (max(n_colors - 1, 1)).bit_length())
    for fi, frame in enumerate(frames):
        if len(frame) != width * height:
            raise GifError(f"frame {fi}: need {width * height} indices")
        if max(frame) >= n_colors:
            raise GifError(f"frame {fi}: index beyond palette")
        if len(frames) > 1 or transparent_index is not None:
            delay = (delays_cs[fi] if delays_cs else 10)
            flags = 0
            tidx = 0
            if transparent_index is not None:
                flags |= 0x01
                tidx = transparent_index
            if len(frames) > 1:
                flags |= 0x04  # disposal 1: draw over
            out += b"\x21\xf9\x04" + bytes([flags])
            out += struct.pack("<H", delay) + bytes([tidx, 0])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out.append(0x40 if interlace else 0x00)  # no local table
        rows = frame
        if interlace:
            ordered = bytearray()
            for start, step in _INTERLACE_PASSES:
                for y in range(start, height, step):
                    ordered += frame[y * width:(y + 1) * width]
            rows = bytes(ordered)
        out.append(min_code_size)
        out += _sub_blocks(lzw_compress(rows, min_code_size))
    out += b"\x3b"
    return bytes(out)


# ------------------------------------------------------------ decode


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.p = 0

    def take(self, n: int) -> bytes:
        if self.p + n > len(self.d):
            raise GifError("truncated GIF")
        b = self.d[self.p:self.p + n]
        self.p += n
        return b

    def byte(self) -> int:
        return self.take(1)[0]

    def sub_blocks(self) -> bytes:
        out = bytearray()
        while True:
            n = self.byte()
            if n == 0:
                return bytes(out)
            out += self.take(n)


def _deinterlace(rows: bytes, width: int, height: int) -> bytes:
    out = bytearray(width * height)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            out[y * width:(y + 1) * width] = rows[src:src + width]
            src += width
    return bytes(out)


def decode_gif(data: bytes) -> dict:
    """Decode a GIF into ``{"width", "height", "frames", "delays_cs",
    "n_frames"}`` with frames as RGB bytes (3 bytes/pixel), composited
    per the disposal rules (none / draw-over / restore-background) and
    transparency.  Raises GifError on malformed input."""
    r = _Reader(data)
    if r.take(6) not in _HEADERS:
        raise GifError("bad GIF signature")
    width, height = struct.unpack("<HH", r.take(4))
    if width == 0 or height == 0:
        raise GifError("zero canvas dimension")
    flags = r.byte()
    r.byte()  # background index (we composite in RGB; unpainted=black)
    r.byte()  # aspect ratio
    global_pal = None
    if flags & 0x80:
        n = 1 << ((flags & 0x07) + 1)
        raw = r.take(3 * n)
        global_pal = [tuple(raw[i:i + 3]) for i in range(0, 3 * n, 3)]

    # the canvas is kept in RGB, resolved at PAINT time: palette
    # indices are only meaningful under the palette of the frame that
    # painted them, so an index canvas re-rendered through a later
    # frame's LOCAL palette would recolor old pixels (caught by
    # test_local_color_table_and_subrect_frames)
    canvas = bytearray(3 * width * height)  # unpainted stays black
    frames: list = []
    delays: list = []
    gce_delay = 0
    gce_transparent: int | None = None
    gce_disposal = 0

    def emit() -> None:
        frames.append(bytes(canvas))
        delays.append(gce_delay)

    while True:
        block = r.byte()
        if block == 0x3b:  # trailer
            break
        if block == 0x21:  # extension
            label = r.byte()
            body = r.sub_blocks()
            if label == 0xf9:  # graphic control
                if len(body) < 4:
                    raise GifError("short graphic control extension")
                gce_disposal = (body[0] >> 2) & 0x07
                gce_delay = struct.unpack("<H", body[1:3])[0]
                gce_transparent = body[3] if body[0] & 0x01 else None
            continue  # comment/app/plain-text: skipped, already read
        if block != 0x2c:
            raise GifError(f"unknown block 0x{block:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", r.take(8))
        if left + fw > width or top + fh > height or fw == 0 or fh == 0:
            raise GifError("frame rectangle outside canvas")
        iflags = r.byte()
        pal = global_pal
        if iflags & 0x80:
            n = 1 << ((iflags & 0x07) + 1)
            raw = r.take(3 * n)
            pal = [tuple(raw[i:i + 3]) for i in range(0, 3 * n, 3)]
        if pal is None:
            raise GifError("no color table for frame")
        mcs = r.byte()
        idx = lzw_decompress(r.sub_blocks(), mcs, fw * fh)
        if len(idx) != fw * fh:
            raise GifError(f"frame pixel count {len(idx)} != {fw * fh}")
        if iflags & 0x40:
            idx = _deinterlace(idx, fw, fh)
        for y in range(fh):
            row = idx[y * fw:(y + 1) * fw]
            base = (top + y) * width + left
            for x, v in enumerate(row):
                if gce_transparent is not None and v == gce_transparent:
                    continue
                if v >= len(pal):
                    raise GifError("pixel index beyond color table")
                canvas[3 * (base + x):3 * (base + x) + 3] = bytes(pal[v])
        emit()
        if gce_disposal == 2:  # restore to background: clear the rect
            for y in range(fh):
                base = (top + y) * width + left
                canvas[3 * base:3 * (base + fw)] = bytes(3 * fw)
        gce_delay, gce_transparent, gce_disposal = 0, None, 0
    if not frames:
        raise GifError("GIF contains no image data")
    return {"width": width, "height": height, "frames": frames,
            "delays_cs": delays, "n_frames": len(frames)}
