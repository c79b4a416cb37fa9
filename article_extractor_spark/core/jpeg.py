"""Baseline JPEG (ITU-T T.81) grayscale encoder/decoder.

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

The per-block hot paths (DCT/IDCT, quantize, color conversion, plane
(de)blocking) are numpy-vectorized across all blocks of an image with the
SAME per-element operation order as the scalar reference functions kept
alongside them — elementwise IEEE float64 ops are order-deterministic, so
the vector paths are bit-identical to the scalar ones (pinned by the
roundtrip tests).  Entropy coding stays bit-serial per the format.
"""
from __future__ import annotations

import math
import struct
from typing import Dict, List, Tuple

import numpy as np

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

# Example chrominance Huffman tables, T.81 Annex K.3.2 (public spec tables).
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# DC quant step 8 == the 8x8 DCT's DC gain, so constant blocks roundtrip
# exactly; AC steps are conventional mid-quality values (any value works
# for constant blocks — their AC coefficients are zero).  The same table
# serves luma and chroma so constant-MCU color images roundtrip exactly
# too (a conventional chroma table would only change lossy-path fidelity).
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


_CODE_CACHE: Dict[tuple, Dict[int, Tuple[int, int]]] = {}


def _canonical_codes_cached(bits: List[int], vals: List[int]
                            ) -> Dict[int, Tuple[int, int]]:
    """Memoized :func:`_canonical_codes` — the encoders rebuild the same
    four Annex K tables per image otherwise (callers must not mutate)."""
    key = (tuple(bits), tuple(vals))
    tab = _CODE_CACHE.get(key)
    if tab is None:
        tab = _CODE_CACHE[key] = _canonical_codes(bits, vals)
    return tab


_DECODE_CACHE: Dict[tuple, Dict[Tuple[int, int], int]] = {}


def _decode_table(bits: List[int], vals: List[int]
                  ) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial Huffman decoding.
    Memoized: a corpus decode pass sees the same few DHT tables per
    stream (bounded: tables are <= 16+256 entries, distinct table sets
    in one task's inputs are few; callers must not mutate)."""
    key = (tuple(bits), tuple(vals))
    tab = _DECODE_CACHE.get(key)
    if tab is None:
        if len(_DECODE_CACHE) > 4096:  # unbounded-input guard
            _DECODE_CACHE.clear()
        tab = _DECODE_CACHE[key] = {
            (l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}
    return tab


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


# ---- vectorized twins of the block math above -------------------------
# Each reproduces the scalar function's per-element operation ORDER
# (sequential accumulation over the 8-length axis, same multiply
# grouping), so float64 results are bit-identical — the roundtrip tests
# pin this.  Only the batch axis is vectorized.

_COS_NP = np.array(_COS)          # (v, y) cosine table, same values
_C_NP = np.array(_C)
_HV_NP = np.array([0.5 * c for c in _C])  # the (0.5 * _C[v]) prefactors
_ZIG_NP = np.array(ZIGZAG)


def _rha_np(c: "np.ndarray") -> "np.ndarray":
    """Vector :func:`_round_half_away` (int64)."""
    return np.where(c >= 0, np.floor(c + 0.5),
                    -np.floor(-c + 0.5)).astype(np.int64)


def _fdct_blocks(blocks: "np.ndarray") -> "np.ndarray":
    """(n, 8, 8) level-shifted samples -> (n, 8, 8) DCT coefficients
    (natural order, axes flatten to ``coef[u * 8 + v]``)."""
    n = blocks.shape[0]
    acc = np.zeros((n, 8, 8))
    for y in range(8):  # tmp[x, v] = (0.5*C[v]) * sum_y block[x, y]*COS[v][y]
        acc += blocks[:, :, y, np.newaxis] * _COS_NP[np.newaxis,
                                                     np.newaxis, :, y]
    tmp = acc * _HV_NP[np.newaxis, np.newaxis, :]
    acc2 = np.zeros((n, 8, 8))
    for x in range(8):  # out[u, v] = (0.5*C[u]) * sum_x tmp[x, v]*COS[u][x]
        acc2 += tmp[:, x, np.newaxis, :] * _COS_NP[np.newaxis, :,
                                                   x, np.newaxis]
    return acc2 * _HV_NP[np.newaxis, :, np.newaxis]


def _idct_blocks(coefs: "np.ndarray") -> "np.ndarray":
    """(n, 8, 8) dequantized coefficients (axes flatten to
    ``coef[u * 8 + v]``) -> (n, 8, 8) spatial samples indexed
    ``[block, y, x]`` (the scalar function's ``spatial[y * 8 + x]``)."""
    n = coefs.shape[0]
    acc = np.zeros((n, 8, 8))
    for v in range(8):  # tmp[u, y] = 0.5 * sum_v (C[v]*coef[u, v])*COS[v][y]
        acc += (_C_NP[v] * coefs[:, :, v])[:, :, np.newaxis] \
            * _COS_NP[np.newaxis, np.newaxis, v, :]
    tmp = 0.5 * acc
    acc2 = np.zeros((n, 8, 8))
    for u in range(8):  # out[., y] = 0.5 * sum_u (C[u]*tmp[u, y])*COS[u][x]
        acc2 += (_C_NP[u] * tmp[:, u, :])[:, np.newaxis, :] \
            * _COS_NP[np.newaxis, u, :, np.newaxis]
    # acc2 axes are (block, x-loop, y-loop) per the scalar out[x*8+y];
    # reading spatial[y*8+x] therefore indexes [block, y, x] — return
    # as-is and document the axis meaning at the call sites
    return 0.5 * acc2


def _gather_blocks(plane, pw: int, ph: int,
                   bw_blocks: int, bh_blocks: int) -> "np.ndarray":
    """Vector twin of the encoders' ``block_at``: (bh*bw, 8, 8) level-
    shifted float64 blocks with edge replication, block index
    ``by * bw_blocks + bx``."""
    arr = np.frombuffer(bytes(plane), dtype=np.uint8).reshape(ph, pw)
    rows = np.minimum(np.arange(bh_blocks * 8), ph - 1)
    cols = np.minimum(np.arange(bw_blocks * 8), pw - 1)
    g = arr[rows][:, cols].astype(np.float64) - 128.0
    return (g.reshape(bh_blocks, 8, bw_blocks, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _quantize_blocks(coefs: "np.ndarray", q: List[int]) -> "np.ndarray":
    """(n, 8, 8) DCT coefficients -> (n, 64) zigzag-ordered quantized
    int64 (the scalar ``_round_half_away(coef[ZIGZAG[i]] / q[ZIGZAG[i]])``)."""
    flat = coefs.reshape(-1, 64)
    qa = np.asarray(q, dtype=np.float64)
    return _rha_np(flat[:, _ZIG_NP] / qa[_ZIG_NP])


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

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 F.2.1.3.1)."""
        self._n = 0  # discard pad bits
        p = self.pos
        while p + 1 < len(self.data) and self.data[p] == 0xFF \
                and self.data[p + 1] == 0xFF:
            p += 1  # fill bytes
        if p + 1 >= len(self.data) or self.data[p] != 0xFF \
                or not (0xD0 <= self.data[p + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos = p + 2


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


def _round_half_away(c: float) -> int:
    return int(math.floor(c + 0.5)) if c >= 0 else -int(math.floor(-c + 0.5))


def _encode_block(bw: "_BitWriter", block: List[float], q: List[int],
                  dc_codes: Dict[int, Tuple[int, int]],
                  ac_codes: Dict[int, Tuple[int, int]], pred: int) -> int:
    """FDCT + quantize + entropy-code one level-shifted 8x8 block;
    returns the new DC predictor for this block's component."""
    coef = _fdct8x8(block)
    qc = [0] * 64
    for i in range(64):
        qc[i] = _round_half_away(coef[ZIGZAG[i]] / q[ZIGZAG[i]])
    return _encode_qc(bw, qc, dc_codes, ac_codes, pred)


def _encode_qc(bw: "_BitWriter", qc, dc_codes: Dict[int, Tuple[int, int]],
               ac_codes: Dict[int, Tuple[int, int]], pred: int) -> int:
    """Entropy-code one already-quantized zigzag block (the bit-serial
    tail of :func:`_encode_block`; the batched encoders feed it rows of
    :func:`_quantize_blocks`)."""
    diff = qc[0] - pred
    pred = qc[0]
    cat, mbits = _magnitude(diff)
    code, length = dc_codes[cat]
    bw.write(code, length)
    if cat:
        bw.write(mbits, cat)
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
    return pred


def _clamp8(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def rgb_to_ycbcr(r: int, g: int, b: int) -> Tuple[int, int, int]:
    """JFIF (ITU-R BT.601 full-range) RGB -> YCbCr, round-half-away."""
    y = _round_half_away(0.299 * r + 0.587 * g + 0.114 * b)
    cb = _round_half_away(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)
    cr = _round_half_away(0.5 * r - 0.418688 * g - 0.081312 * b + 128)
    return _clamp8(y), _clamp8(cb), _clamp8(cr)


def ycbcr_to_rgb(y: int, cb: int, cr: int) -> Tuple[int, int, int]:
    """JFIF YCbCr -> RGB (inverse BT.601), round-half-away + clamp."""
    r = _round_half_away(y + 1.402 * (cr - 128))
    g = _round_half_away(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    b = _round_half_away(y + 1.772 * (cb - 128))
    return _clamp8(r), _clamp8(g), _clamp8(b)


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

    dc_codes = _canonical_codes_cached(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes_cached(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    pred = 0
    bx_count = (width + 7) // 8
    by_count = (height + 7) // 8
    # batched FDCT + quantize over every block (edge-replicated,
    # level-shifted), raster order; entropy coding stays serial
    qcs = _quantize_blocks(
        _fdct_blocks(_gather_blocks(pixels, width, height,
                                    bx_count, by_count)), q).tolist()
    for qc in qcs:
        pred = _encode_qc(bw, qc, dc_codes, ac_codes, pred)
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def _ycbcr_420_planes(width: int, height: int, rgb: bytes
                      ) -> Tuple[bytearray, bytearray, bytearray, int, int]:
    """BT.601 convert + 2x2 chroma subsample (rounded mean, edge
    replication).  Returns (Y, Cb, Cr, chroma_w, chroma_h); shared by
    the baseline and progressive color encoders so both quantize
    identical coefficients."""
    # vector twin of per-pixel rgb_to_ycbcr + the 2x2 rounded-mean
    # subsample: same expression trees, exact integer arithmetic
    px = np.frombuffer(bytes(rgb), dtype=np.uint8).astype(np.int64)
    r, g, b = px[0::3], px[1::3], px[2::3]
    yv = np.clip(_rha_np(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    cbv = np.clip(_rha_np(-0.168736 * r - 0.331264 * g + 0.5 * b + 128),
                  0, 255)
    crv = np.clip(_rha_np(0.5 * r - 0.418688 * g - 0.081312 * b + 128),
                  0, 255)
    yp = bytearray(yv.astype(np.uint8).tobytes())
    cw, ch = (width + 1) // 2, (height + 1) // 2
    y0 = 2 * np.arange(ch)
    y1 = np.minimum(y0 + 1, height - 1)
    x0 = 2 * np.arange(cw)
    x1 = np.minimum(x0 + 1, width - 1)
    out = []
    for full in (cbv, crv):
        f = full.reshape(height, width)
        s = (f[y0][:, x0] + f[y0][:, x1] + f[y1][:, x0] + f[y1][:, x1])
        out.append(bytearray(((s + 2) // 4).astype(np.uint8).tobytes()))
    return yp, out[0], out[1], cw, ch


def encode_jpeg_color(width: int, height: int, rgb: bytes,
                      qtable: List[int] | None = None) -> bytes:
    """Encode interleaved 8-bit RGB ``rgb`` (row-major, len == w*h*3) to
    a baseline sequential YCbCr 4:2:0 JPEG: BT.601 color conversion,
    2x2 chroma subsampling (rounded mean), interleaved 16x16 MCUs
    (Y1 Y2 Y3 Y4 Cb Cr), luminance Huffman/quant tables for Y and the
    Annex K.3.2 chrominance Huffman tables for Cb/Cr.  Fully general
    (lossy on arbitrary content); constant-color MCUs roundtrip exactly
    with the default tables (DC step == DCT DC gain)."""
    if len(rgb) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    q = list(qtable or DEFAULT_QTABLE)
    if len(q) != 64:
        raise ValueError("qtable must have 64 entries")

    yp, cbs, crs, cw, ch = _ycbcr_420_planes(width, height, rgb)

    out = bytearray(b"\xFF\xD8")  # SOI
    zz_q = bytes(q[ZIGZAG[i]] for i in range(64))
    for tq in (0, 1):  # DQT: luma table 0, chroma table 1 (same values)
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) + zz_q
    # SOF0: 3 components, Y 2x2 / Cb 1x1 / Cr 1x1
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    # DHT: DC/AC luminance (class 0), DC/AC chrominance (class 1)
    for tc_th, bits, vals in ((0x00, DC_LUM_BITS, DC_LUM_VALS),
                              (0x10, AC_LUM_BITS, AC_LUM_VALS),
                              (0x01, DC_CHR_BITS, DC_CHR_VALS),
                              (0x11, AC_CHR_BITS, AC_CHR_VALS)):
        out += b"\xFF\xC4" + struct.pack(">H", 2 + 1 + 16 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    # SOS: Y uses tables 0/0, chroma 1/1
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    dc_lum = _canonical_codes_cached(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _canonical_codes_cached(AC_LUM_BITS, AC_LUM_VALS)
    dc_chr = _canonical_codes_cached(DC_CHR_BITS, DC_CHR_VALS)
    ac_chr = _canonical_codes_cached(AC_CHR_BITS, AC_CHR_VALS)

    # batched FDCT + quantize per component grid (edge-replicated,
    # level-shifted — the vector twin of the old per-MCU block_at);
    # the MCU-interleaved entropy loop below indexes into the grids
    mcux, mcuy = (width + 15) // 16, (height + 15) // 16
    qy = _quantize_blocks(_fdct_blocks(_gather_blocks(
        yp, width, height, 2 * mcux, 2 * mcuy)), q).tolist()
    qcb = _quantize_blocks(_fdct_blocks(_gather_blocks(
        cbs, cw, ch, mcux, mcuy)), q).tolist()
    qcr = _quantize_blocks(_fdct_blocks(_gather_blocks(
        crs, cw, ch, mcux, mcuy)), q).tolist()

    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):  # 4 luma blocks, raster order in the MCU
                for bx in range(2):
                    preds[0] = _encode_qc(
                        bw, qy[(my * 2 + by) * 2 * mcux + mx * 2 + bx],
                        dc_lum, ac_lum, preds[0])
            preds[1] = _encode_qc(
                bw, qcb[my * mcux + mx], dc_chr, ac_chr, preds[1])
            preds[2] = _encode_qc(
                bw, qcr[my * mcux + mx], dc_chr, ac_chr, preds[2])
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(width: int, height: int, pixels: bytes,
                            qtable: List[int] | None = None,
                            restart_interval: int = 0) -> bytes:
    """Encode a PROGRESSIVE (SOF2) JPEG per T.81 Annex G.1.2: spectral
    selection + successive approximation, DC and AC first/refinement
    scans, optional restart intervals (DRI + RSTn, DC-pred/EOB-run
    reset, byte-aligned).  ``pixels`` is row-major 8-bit grayscale
    (len == w*h, one component) or interleaved RGB (len == w*h*3,
    encoded as YCbCr 4:2:0 exactly like :func:`encode_jpeg_color`).

    The quantized coefficients are identical to the baseline encoders'
    (same FDCT, quantizer and plane prep), so
    ``decode_jpeg(encode_jpeg_progressive(...)) ==
    decode_jpeg(encode_jpeg_gray/color(...))`` byte-for-byte — the
    cross-oracle the tests and the ``jpeg_progressive`` driver query
    pin.  EOB runs are capped at 1 (plain EOB0) because the Annex K.3
    example AC tables define no EOBn>0 symbols; that is spec-valid and
    merely costs compression.  Scan script (libjpeg-style): DC first
    (Al=1), AC first bands (Y split 1-5/6-63 at Al=2, chroma 1-63 at
    Al=1), DC refinement, then AC refinement passes down to Al=0."""
    q = list(qtable or DEFAULT_QTABLE)
    if len(q) != 64:
        raise ValueError("qtable must have 64 entries")
    if len(pixels) == width * height:
        planes = [(bytes(pixels), width, height, 1, 1)]
    elif len(pixels) == width * height * 3:
        yp, cbs, crs, cw, ch = _ycbcr_420_planes(width, height, pixels)
        planes = [(yp, width, height, 2, 2),
                  (cbs, cw, ch, 1, 1), (crs, cw, ch, 1, 1)]
    else:
        raise ValueError("pixel buffer size mismatch")
    ncomp = len(planes)
    hmax = max(p[3] for p in planes)
    vmax = max(p[4] for p in planes)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # quantized zigzag coefficient blocks per component, padded MCU grid
    # (identical math to _encode_block: FDCT on edge-replicated level-
    # shifted blocks, round-half-away quantize)
    comps = []  # (blocks, bw_pad, comp_bw, comp_bh, hc, vc)
    for plane, pw, ph, hc, vc in planes:
        bw_pad, bh_pad = mcux * hc, mcuy * vc
        cwidth = (width * hc + hmax - 1) // hmax
        cheight = (height * vc + vmax - 1) // vmax
        # batched FDCT + quantize over the padded MCU grid (identical
        # math to _encode_block: edge-replicated level-shifted blocks,
        # round-half-away quantize)
        blocks = _quantize_blocks(_fdct_blocks(_gather_blocks(
            plane, pw, ph, bw_pad, bh_pad)), q).tolist()
        comps.append((blocks, bw_pad,
                      (cwidth + 7) // 8, (cheight + 7) // 8, hc, vc))

    out = bytearray(b"\xFF\xD8")  # SOI
    zz_q = bytes(q[ZIGZAG[i]] for i in range(64))
    for tq in range(1 if ncomp == 1 else 2):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) + zz_q
    out += b"\xFF\xC2" + struct.pack(  # SOF2: progressive DCT
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for ci, (_, _, _, _, hc, vc) in enumerate(comps):
        out += bytes([ci + 1, (hc << 4) | vc, 0 if ci == 0 else 1])
    tables = [(0x00, DC_LUM_BITS, DC_LUM_VALS),
              (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if ncomp == 3:
        tables += [(0x01, DC_CHR_BITS, DC_CHR_VALS),
                   (0x11, AC_CHR_BITS, AC_CHR_VALS)]
    for tc_th, bits, vals in tables:
        out += b"\xFF\xC4" + struct.pack(">H", 2 + 1 + 16 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    dc_codes = [_canonical_codes_cached(DC_LUM_BITS, DC_LUM_VALS)]
    ac_codes = [_canonical_codes_cached(AC_LUM_BITS, AC_LUM_VALS)]
    if ncomp == 3:
        dc_codes += [_canonical_codes_cached(DC_CHR_BITS, DC_CHR_VALS)] * 2
        ac_codes += [_canonical_codes_cached(AC_CHR_BITS, AC_CHR_VALS)] * 2

    def emit_scan(cis: List[int], ss: int, se: int, ah: int,
                  al: int) -> None:
        nonlocal out
        interleaved = len(cis) > 1
        seg = bytearray([len(cis)])
        for ci in cis:
            td = 0 if ci == 0 else 1  # table ids mirror the DHT layout
            seg += bytes([ci + 1, (td << 4) | td])
        seg += bytes([ss, se, (ah << 4) | al])
        out += b"\xFF\xDA" + struct.pack(">H", 2 + len(seg)) + seg

        bw = _BitWriter()
        preds = {ci: 0 for ci in cis}
        rst = 0

        def dc_unit(ci: int, blk: List[int]) -> None:
            if ah == 0:
                v = blk[0] >> al  # DC point transform: arithmetic shift
                cat, mbits = _magnitude(v - preds[ci])
                preds[ci] = v
                code, length = dc_codes[ci][cat]
                bw.write(code, length)
                if cat:
                    bw.write(mbits, cat)
            else:  # refinement: one correction bit (T.81 G.1.2.1)
                bw.write((blk[0] >> al) & 1, 1)

        def ac_first_unit(ci: int, blk: List[int]) -> None:
            codes = ac_codes[ci]
            r = 0
            for k in range(ss, se + 1):
                v = blk[k]
                t = (v >> al) if v >= 0 else -((-v) >> al)  # sign-magnitude
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    code, length = codes[0xF0]  # ZRL
                    bw.write(code, length)
                    r -= 16
                cat, mbits = _magnitude(t)
                code, length = codes[(r << 4) | cat]
                bw.write(code, length)
                bw.write(mbits, cat)
                r = 0
            if r:  # trailing zeros: EOB0 (run capped at 1, see docstring)
                code, length = codes[0x00]
                bw.write(code, length)

        def ac_refine_unit(ci: int, blk: List[int]) -> None:
            # T.81 G.1.2.3 figure G.7 (the jcphuff.c shape), EOB run
            # capped at 1 so correction bits never buffer across blocks
            codes = ac_codes[ci]
            absv = [abs(blk[k]) >> al for k in range(ss, se + 1)]
            eob = -1  # last newly-nonzero index, relative to ss
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i
            r = 0
            pending: List[int] = []  # buffered correction bits
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    code, length = codes[0xF0]  # ZRL
                    bw.write(code, length)
                    r -= 16
                    for b in pending:
                        bw.write(b, 1)
                    pending = []
                if t > 1:  # history coefficient: next magnitude bit
                    pending.append(t & 1)
                    continue
                code, length = codes[(r << 4) | 1]  # newly nonzero
                bw.write(code, length)
                bw.write(1 if blk[ss + i] >= 0 else 0, 1)
                for b in pending:
                    bw.write(b, 1)
                pending = []
                r = 0
            if r > 0 or pending:
                code, length = codes[0x00]  # EOB0 + its correction bits
                bw.write(code, length)
                for b in pending:
                    bw.write(b, 1)

        def unit(ci: int, blk: List[int]) -> None:
            if ss == 0:
                dc_unit(ci, blk)
            elif ah == 0:
                ac_first_unit(ci, blk)
            else:
                ac_refine_unit(ci, blk)

        if interleaved:
            total = mcux * mcuy
        else:
            _, _, comp_bw, comp_bh, _, _ = comps[cis[0]]
            total = comp_bw * comp_bh
        for idx in range(total):
            if restart_interval and idx and idx % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                for c in preds:
                    preds[c] = 0
            if interleaved:
                my, mx = divmod(idx, mcux)
                for ci in cis:
                    blocks, bw_pad, _cbw, _cbh, hc, vc = comps[ci]
                    for by in range(vc):
                        for bx in range(hc):
                            unit(ci, blocks[(my * vc + by) * bw_pad
                                            + mx * hc + bx])
            else:
                ci = cis[0]
                blocks, bw_pad, comp_bw, _cbh, _, _ = comps[ci]
                by, bx = divmod(idx, comp_bw)
                unit(ci, blocks[by * bw_pad + bx])
        bw.flush()
        out += bw.buf

    if ncomp == 1:
        emit_scan([0], 0, 0, 0, 1)    # DC first, Al=1
        emit_scan([0], 1, 5, 0, 2)    # AC band 1-5 first, Al=2
        emit_scan([0], 6, 63, 0, 2)   # AC band 6-63 first, Al=2
        emit_scan([0], 0, 0, 1, 0)    # DC refinement
        emit_scan([0], 1, 63, 2, 1)   # AC refinement 2 -> 1
        emit_scan([0], 1, 63, 1, 0)   # AC refinement 1 -> 0
    else:
        emit_scan([0, 1, 2], 0, 0, 0, 1)  # interleaved DC first
        emit_scan([0], 1, 5, 0, 2)
        emit_scan([1], 1, 63, 0, 1)
        emit_scan([2], 1, 63, 0, 1)
        emit_scan([0], 6, 63, 0, 2)
        emit_scan([0, 1, 2], 0, 0, 1, 0)  # interleaved DC refinement
        emit_scan([0], 1, 63, 2, 1)
        emit_scan([1], 1, 63, 1, 0)
        emit_scan([2], 1, 63, 1, 0)
        emit_scan([0], 1, 63, 1, 0)
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def _next_marker_pos(data: bytes, pos: int) -> int:
    """Advance past entropy-coded data to the next real marker (skipping
    stuffed FF 00 pairs and FF fill bytes)."""
    n = len(data)
    while pos < n - 1:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            return pos
        pos += 1
    raise ValueError("no marker after entropy data")


def decode_jpeg(data: bytes) -> Tuple[int, int, int, bytes]:
    """Decode a baseline sequential (SOF0/SOF1) or PROGRESSIVE (SOF2)
    JPEG — 1- or 3-component, any sampling factors, interleaved or
    non-interleaved scans, spectral selection + successive approximation
    (EOB runs, refinement correction bits, T.81 G.2), restart intervals
    in both modes.  Returns (width, height, n_components, pixels) —
    row-major 8-bit grayscale for 1 component, interleaved RGB (BT.601
    inverse, nearest-neighbor chroma upsample) for 3.  Parses
    DQT/DHT/DRI between scans generically (any conforming classic
    stream, not just this module's encoders' output)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: Dict[int, List[int]] = {}
    huff: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    width = height = 0
    comps: List[Tuple[int, int, int, int]] = []  # (cid, H, V, tq)
    progressive = False
    restart_interval = 0
    hmax = vmax = 1
    mcux = mcuy = 0
    # per-cid: (zigzag-coeff blocks over the MCU-padded grid, padded
    # blocks-wide, padded blocks-high, component blocks-wide/high — the
    # un-padded grid non-interleaved scans iterate, T.81 A.2.2)
    store: Dict[int, Tuple[List[List[int]], int, int, int, int]] = {}

    def read_symbol(br: "_BitReader", tab: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = tab.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def get_tab(tc: int, th: int) -> Dict[Tuple[int, int], int]:
        tab = huff.get((tc, th))
        if tab is None:
            raise ValueError(f"missing huffman table class {tc} id {th}")
        return tab

    def decode_scan(start: int, scomps: List[Tuple[int, int, int]],
                    ss: int, se: int, ah: int, al: int) -> int:
        by_cid = {cid: (hc, vc, tq) for cid, hc, vc, tq in comps}
        for cid, _, _ in scomps:
            if cid not in by_cid:
                raise ValueError(f"scan component {cid} not in frame")
        if not (0 <= ss <= se <= 63):
            raise ValueError("bad spectral band")
        if progressive:
            if ss == 0 and se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            if ss > 0 and len(scomps) != 1:
                raise ValueError("progressive AC scan must be"
                                 " non-interleaved")
        br = _BitReader(data, start)
        preds = {cid: 0 for cid, _, _ in scomps}
        eobrun = 0
        interleaved = len(scomps) > 1
        # resolve entropy tables up front (clean error over KeyError)
        tabs: Dict[int, Tuple] = {}
        for cid, dsel, asel in scomps:
            need_dc = (not progressive) or (ss == 0 and ah == 0)
            need_ac = (not progressive) or ss > 0
            tabs[cid] = (get_tab(0, dsel) if need_dc else None,
                         get_tab(1, asel) if need_ac else None)

        def decode_unit(blk: List[int], cid: int) -> None:
            nonlocal eobrun
            dc_tab, ac_tab = tabs[cid]
            if not progressive:
                t = read_symbol(br, dc_tab)
                preds[cid] += _extend(br.bits(t), t)
                blk[0] = preds[cid]
                i = 1
                while i < 64:
                    rs = read_symbol(br, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            i += 16
                            continue
                        break  # EOB
                    i += r
                    if i > 63:
                        raise ValueError("AC index overflow")
                    blk[i] = _extend(br.bits(s), s)
                    i += 1
                return
            if ss == 0:  # DC scan
                if ah == 0:
                    t = read_symbol(br, dc_tab)
                    preds[cid] += _extend(br.bits(t), t)
                    blk[0] = preds[cid] << al
                elif br.bit():  # refinement: one correction bit
                    blk[0] |= 1 << al
                return
            if ah == 0:  # AC first scan (T.81 G.2.2)
                if eobrun:
                    eobrun -= 1
                    return
                k = ss
                while k <= se:
                    rs = read_symbol(br, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1  # EOBn: this block + n-1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC index overflow")
                    blk[k] = _extend(br.bits(s), s) << al
                    k += 1
                return
            # AC refinement scan (T.81 G.2; mirrors the encoder's
            # buffered-correction-bit order)
            p1 = 1 << al
            m1 = -1 << al
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = read_symbol(br, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        val = 0  # ZRL: pass 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid refinement magnitude")
                        val = p1 if br.bit() else m1
                    while k <= se:
                        if blk[k] != 0:
                            if br.bit() and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:  # tail correction bits of this block
                    if blk[k] != 0 and br.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                    k += 1
                eobrun -= 1

        if interleaved:
            total = mcux * mcuy
        else:
            _, _, _, comp_bw, comp_bh = store[scomps[0][0]]
            total = comp_bw * comp_bh
        for mcu in range(total):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.restart()
                for c in preds:
                    preds[c] = 0
                eobrun = 0
            if interleaved:
                my, mx = divmod(mcu, mcux)
                for cid, _dsel, _asel in scomps:
                    hc, vc, _tq = by_cid[cid]
                    blocks, bw_pad, _bh, _cbw, _cbh = store[cid]
                    for by in range(vc):
                        for bx in range(hc):
                            decode_unit(
                                blocks[(my * vc + by) * bw_pad
                                       + mx * hc + bx], cid)
            else:
                cid = scomps[0][0]
                blocks, bw_pad, _bh, comp_bw, _cbh = store[cid]
                by, bx = divmod(mcu, comp_bw)
                decode_unit(blocks[by * bw_pad + bx], cid)
        return _next_marker_pos(data, br.pos)

    saw_scan = False
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: bare
            continue
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            if comps:
                raise ValueError("multiple SOF markers")
            progressive = marker == 0xC2
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG not supported")
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            hmax = max(hc for _, hc, _, _ in comps)
            vmax = max(vc for _, _, vc, _ in comps)
            if not width or not height or not hmax or not vmax:
                raise ValueError("bad frame geometry")
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            for cid, hc, vc, _tq in comps:
                bw_pad, bh_pad = mcux * hc, mcuy * vc
                cw_ = (width * hc + hmax - 1) // hmax
                ch_ = (height * vc + vmax - 1) // vmax
                store[cid] = ([[0] * 64 for _ in range(bw_pad * bh_pad)],
                              bw_pad, bh_pad,
                              (cw_ + 7) // 8, (ch_ + 7) // 8)
            pos += seglen
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
            pos += seglen
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if not (1 <= ns <= len(comps)):
                raise ValueError("bad scan component count")
            scomps = []
            for c in range(ns):
                cid, tsel = seg[1 + 2 * c], seg[2 + 2 * c]
                scomps.append((cid, tsel >> 4, tsel & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos = decode_scan(pos + seglen, scomps, ss, se,
                              ahal >> 4, ahal & 0x0F)
            saw_scan = True
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported frame marker FF{marker:02X}")
        else:  # APPn / COM etc. — skip
            pos += seglen

    if not width or not comps or not saw_scan:
        raise ValueError("missing SOF or SOS")

    # reconstruct: batched dequantize + IDCT over every (padded) block
    # per component (the vector twin of the old per-block loop; same
    # floor(spatial + 128.5) + clamp per pixel)
    planes: Dict[int, Tuple["np.ndarray", int, int]] = {}
    for cid, hc, vc, tq in comps:
        if tq not in qtables:
            raise ValueError(f"missing quant table {tq}")
        q = qtables[tq]
        blocks, bw_pad, bh_pad, _cbw, _cbh = store[cid]
        pw, ph = bw_pad * 8, bh_pad * 8
        blk = np.array(blocks, dtype=np.int64)          # (n, 64) zigzag
        qa = np.asarray(q, dtype=np.int64)
        coefs = np.zeros((blk.shape[0], 64))
        coefs[:, _ZIG_NP] = (blk * qa[_ZIG_NP]).astype(np.float64)
        spatial = _idct_blocks(coefs.reshape(-1, 8, 8))  # [block, y, x]
        pix = np.clip(np.floor(spatial + 128.5), 0, 255).astype(np.uint8)
        plane = (pix.reshape(bh_pad, bw_pad, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(ph, pw))
        planes[cid] = (plane, pw, ph)

    if len(comps) == 1:
        plane, _pw, _ph = planes[comps[0][0]]
        return width, height, 1, plane[:height, :width].tobytes()

    # 3 components: nearest-neighbor chroma upsample + YCbCr -> RGB
    # (vectorized with the scalar ycbcr_to_rgb expression trees)
    chans = []
    for cid, hc, vc, _tq in comps:
        plane, _pw, _ph = planes[cid]
        rows = (np.arange(height) * vc) // vmax
        cols = (np.arange(width) * hc) // hmax
        chans.append(plane[rows][:, cols].astype(np.int64))
    yv, cb, cr = chans
    r = np.clip(_rha_np(yv + 1.402 * (cr - 128)), 0, 255)
    g = np.clip(_rha_np(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
                0, 255)
    b = np.clip(_rha_np(yv + 1.772 * (cb - 128)), 0, 255)
    img = np.stack((r, g, b), axis=-1).astype(np.uint8)
    return width, height, 3, img.tobytes()


def decode_jpeg_gray(data: bytes) -> Tuple[int, int, bytes]:
    """Decode a baseline sequential grayscale JPEG.  Returns
    (width, height, row-major 8-bit pixels)."""
    width, height, ncomp, px = decode_jpeg(data)
    if ncomp != 1:
        raise ValueError("not a grayscale JPEG")
    return width, height, px
