"""Pure-stdlib baseline JPEG (ITU-T T.81) grayscale encoder/decoder.

Mirrors the approach of :mod:`article_extractor_spark.core.png`: a REAL
codec (marker parsing, canonical Huffman tables, DC prediction, AC
run-length/EOB, zigzag, dequantization, float IDCT) so the multimodal
pipeline decodes genuine JPEG bytes instead of the md5 stub — closing the
"video/JPEG still md5-stub" seam flagged in round 3 (multimodal.py:41).

Everything here derives from the public JPEG specification (ITU-T T.81 /
ISO 10918-1): the zigzag order (Figure 5), the DC/AC entropy coding
procedure (Annex F), and the example luminance Huffman tables (Annex K.3).

JPEG is lossy in general; the companion driver query feeds it images made
of constant 8x8 blocks and a quantization table whose DC step (8) exactly
matches the DCT's DC gain, so the roundtrip is bit-exact and formula-
oracle-able — while the codec itself stays fully general baseline.
"""
from __future__ import annotations

import math
import struct
from typing import Dict, List, Tuple

# Zigzag scan order: index in zigzag sequence -> (row-major) coefficient
# index, per T.81 Figure 5.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Example luminance Huffman tables, T.81 Annex K.3.1 (public spec tables).
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# DC quant step 8 == the 8x8 DCT's DC gain, so constant blocks roundtrip
# exactly; AC steps are conventional mid-quality values (any value works
# for constant blocks — their AC coefficients are zero).
DEFAULT_QTABLE = [8] + [16] * 63


def _canonical_codes(bits: List[int], vals: List[int]
                     ) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code generation."""
    codes: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: List[int], vals: List[int]
                  ) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial Huffman decoding."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _fdct8x8(block: List[float]) -> List[float]:
    # separable: rows then columns (2*8*64 mult-adds, not 64*64)
    tmp = [0.0] * 64
    for x in range(8):
        row = x * 8
        for v in range(8):
            cv = _COS[v]
            tmp[row + v] = 0.5 * _C[v] * sum(
                block[row + y] * cv[y] for y in range(8))
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            cu = _COS[u]
            out[u * 8 + v] = 0.5 * _C[u] * sum(
                tmp[x * 8 + v] * cu[x] for x in range(8))
    return out


def _idct8x8(coef: List[float]) -> List[float]:
    tmp = [0.0] * 64
    for u in range(8):
        row = u * 8
        for y in range(8):
            tmp[row + y] = 0.5 * sum(
                _C[v] * coef[row + v] * _COS[v][y] for v in range(8))
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            out[x * 8 + y] = 0.5 * sum(
                _C[u] * tmp[u * 8 + y] * _COS[u][x] for u in range(8))
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker FF{nxt:02X} "
                                     "inside entropy data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _magnitude(v: int) -> Tuple[int, int]:
    """(category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    cat = v.bit_length() if v > 0 else (-v).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(v: int, t: int) -> int:
    """EXTEND procedure, T.81 F.2.2.1."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def encode_jpeg_gray(width: int, height: int, pixels: bytes,
                     qtable: List[int] | None = None) -> bytes:
    """Encode 8-bit grayscale ``pixels`` (row-major, len == w*h) to a
    baseline sequential JPEG using the Annex K.3.1 luminance Huffman
    tables.  Fully general: real FDCT, quantization, DC prediction and
    AC run-length coding for arbitrary content."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer size mismatch")
    q = list(qtable or DEFAULT_QTABLE)
    if len(q) != 64:
        raise ValueError("qtable must have 64 entries")

    out = bytearray(b"\xFF\xD8")  # SOI
    # DQT: Pq=0 (8-bit), Tq=0, zigzag order
    zz_q = [q[ZIGZAG[i]] for i in range(64)]
    out += b"\xFF\xDB" + struct.pack(">H", 67)
    out += bytes([0]) + bytes(zz_q)
    # SOF0: baseline, 1 component, no subsampling
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])  # id=1, H=V=1, qtable 0
    # DHT: DC table 0 then AC table 0
    out += b"\xFF\xC4" + struct.pack(
        ">H", 2 + 1 + 16 + len(DC_LUM_VALS))
    out += bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS)
    out += b"\xFF\xC4" + struct.pack(
        ">H", 2 + 1 + 16 + len(AC_LUM_VALS))
    out += bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS)
    # SOS
    out += b"\xFF\xDA" + struct.pack(">HB", 8, 1)
    out += bytes([1, 0x00, 0, 63, 0])

    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    pred = 0
    bx_count = (width + 7) // 8
    by_count = (height + 7) // 8
    for by in range(by_count):
        for bx in range(bx_count):
            # level-shifted block with edge replication
            block = [0.0] * 64
            for y in range(8):
                sy = min(by * 8 + y, height - 1)
                for x in range(8):
                    sx = min(bx * 8 + x, width - 1)
                    block[y * 8 + x] = pixels[sy * width + sx] - 128.0
            coef = _fdct8x8(block)
            qc = [0] * 64
            for i in range(64):
                c = coef[ZIGZAG[i]] / q[ZIGZAG[i]]
                qc[i] = int(math.floor(c + 0.5)) if c >= 0 else \
                    -int(math.floor(-c + 0.5))
            # DC
            diff = qc[0] - pred
            pred = qc[0]
            cat, mbits = _magnitude(diff)
            code, length = dc_codes[cat]
            bw.write(code, length)
            if cat:
                bw.write(mbits, cat)
            # AC: run-length with ZRL and EOB
            run = 0
            for i in range(1, 64):
                if qc[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                cat, mbits = _magnitude(qc[i])
                code, length = ac_codes[(run << 4) | cat]
                bw.write(code, length)
                bw.write(mbits, cat)
                run = 0
            if run:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def decode_jpeg_gray(data: bytes) -> Tuple[int, int, bytes]:
    """Decode a baseline sequential grayscale JPEG.  Returns
    (width, height, row-major 8-bit pixels).  Parses DQT/DHT/SOF0/SOS
    markers generically (any conforming single-component baseline
    stream, not just this module's encoder output)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: Dict[int, List[int]] = {}
    huff: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    width = height = 0
    comp_q = 0
    dc_id = ac_id = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    zz = list(seg[i:i + 64])
                    i += 64
                else:
                    zz = [struct.unpack(">H", seg[i + 2 * j:i + 2 * j + 2])[0]
                          for j in range(64)]
                    i += 128
                tbl = [0] * 64
                for j in range(64):
                    tbl[ZIGZAG[j]] = zz[j]
                qtables[tq] = tbl
            pos += seglen
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + nv
            pos += seglen
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("only single-component (grayscale) "
                                 "baseline JPEG supported")
            _cid, hv, comp_q = seg[6], seg[7], seg[8]
            if hv != 0x11:
                raise ValueError("subsampling not supported for "
                                 "single-component streams")
            pos += seglen
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            if ns != 1:
                raise ValueError("one scan component expected")
            tsel = seg[2]
            dc_id, ac_id = tsel >> 4, tsel & 0x0F
            pos += seglen
            break
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline frame marker FF{marker:02X}")
        else:  # APPn / COM / DRI etc. — skip
            pos += seglen
    else:
        raise ValueError("no SOS marker")

    if not width or comp_q not in qtables:
        raise ValueError("missing SOF0 or quant table")
    dc_tab = huff[(0, dc_id)]
    ac_tab = huff[(1, ac_id)]
    q = qtables[comp_q]
    br = _BitReader(data, pos)

    def read_symbol(tab: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = tab.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    img = bytearray(width * height)
    pred = 0
    bx_count = (width + 7) // 8
    by_count = (height + 7) // 8
    for by in range(by_count):
        for bx in range(bx_count):
            zz = [0] * 64
            t = read_symbol(dc_tab)
            pred += _extend(br.bits(t), t)
            zz[0] = pred
            i = 1
            while i < 64:
                rs = read_symbol(ac_tab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        i += 16
                        continue
                    break  # EOB
                i += r
                if i > 63:
                    raise ValueError("AC index overflow")
                zz[i] = _extend(br.bits(s), s)
                i += 1
            coef = [0.0] * 64
            for j in range(64):
                coef[ZIGZAG[j]] = zz[j] * q[ZIGZAG[j]]
            spatial = _idct8x8(coef)
            for y in range(8):
                py = by * 8 + y
                if py >= height:
                    break
                row = py * width
                for x in range(8):
                    px = bx * 8 + x
                    if px >= width:
                        break
                    v = int(math.floor(spatial[y * 8 + x] + 128.5))
                    img[row + px] = 0 if v < 0 else (255 if v > 255 else v)
    return width, height, bytes(img)
