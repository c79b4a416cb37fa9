"""GIF codec (core/gif.py): LZW + container round-trips, interlace,
animation compositing (disposal + transparency), spec-shape checks of
the emitted bytes, and fail-clean fuzz — the same test posture as the
PNG/JPEG/Y4M/PDF codecs (corrupt input must raise GifError, never hang
or silently return garbage)."""

import random
import struct

import pytest

from article_extractor_spark.core.gif import (
    GifError, decode_gif, encode_gif, lzw_compress, lzw_decompress)


PAL4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
PAL256 = [(i, (i * 7) % 256, (i * 13) % 256) for i in range(256)]


def _rgb_of(frame_idx_bytes, pal):
    return b"".join(bytes(pal[i]) for i in frame_idx_bytes)


# ------------------------------------------------------------- LZW

@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_roundtrip_random(mcs):
    rng = random.Random(1000 + mcs)
    n_sym = 1 << mcs
    data = bytes(rng.randrange(n_sym) for _ in range(5000))
    comp = lzw_compress(data, mcs)
    assert lzw_decompress(comp, mcs, len(data)) == data


def test_lzw_roundtrip_repetitive_hits_table_reset():
    # long repetitive stream forces the 4096-entry table reset path
    data = (b"\x00\x01\x02\x03" * 40 + b"\x01" * 200) * 60
    comp = lzw_compress(data, 2)
    assert lzw_decompress(comp, 2, len(data)) == data
    assert len(comp) < len(data)  # it actually compresses


def test_lzw_kwkwk_case():
    # "ababab..." generates the code-equals-next-entry (KwKwK) path
    data = b"\x00\x01" * 500
    comp = lzw_compress(data, 2)
    assert lzw_decompress(comp, 2, len(data)) == data


def test_lzw_rejects_garbage():
    with pytest.raises(GifError):
        lzw_decompress(b"\xff" * 40, 2, 10_000)
    with pytest.raises(GifError):
        lzw_decompress(b"", 2, 100)
    with pytest.raises(GifError):
        lzw_decompress(b"\x00\x01", 9, 100)  # mcs out of range


# ------------------------------------------------------- still images

def test_single_frame_roundtrip_exact():
    w, h = 13, 7
    rng = random.Random(7)
    idx = bytes(rng.randrange(4) for _ in range(w * h))
    gif = encode_gif(w, h, [idx], PAL4)
    assert gif[:6] == b"GIF89a" and gif[-1:] == b"\x3b"
    out = decode_gif(gif)
    assert (out["width"], out["height"], out["n_frames"]) == (w, h, 1)
    assert out["frames"][0] == _rgb_of(idx, PAL4)


def test_256_color_roundtrip_exact():
    w, h = 32, 9
    rng = random.Random(77)
    idx = bytes(rng.randrange(256) for _ in range(w * h))
    out = decode_gif(encode_gif(w, h, [idx], PAL256))
    assert out["frames"][0] == _rgb_of(idx, PAL256)


def test_interlaced_roundtrip_exact():
    w, h = 11, 17  # odd sizes exercise every interlace pass boundary
    rng = random.Random(5)
    idx = bytes(rng.randrange(4) for _ in range(w * h))
    plain = encode_gif(w, h, [idx], PAL4, interlace=False)
    inter = encode_gif(w, h, [idx], PAL4, interlace=True)
    assert plain != inter  # rows really are stored in a different order
    assert decode_gif(inter)["frames"][0] == _rgb_of(idx, PAL4)
    assert decode_gif(inter)["frames"] == decode_gif(plain)["frames"]


def test_header_and_screen_descriptor_shape():
    gif = encode_gif(4, 3, [bytes(12)], PAL4)
    assert struct.unpack("<HH", gif[6:10]) == (4, 3)
    flags = gif[10]
    assert flags & 0x80  # global color table present
    n = 1 << ((flags & 0x07) + 1)
    assert n >= len(PAL4)
    # palette bytes follow verbatim
    table = gif[13:13 + 3 * n]
    assert table[:12] == b"".join(bytes(c) for c in PAL4)


# --------------------------------------------------------- animation

def test_animation_delays_and_draw_over():
    w, h = 6, 4
    f1 = bytes([1]) * (w * h)
    f2 = bytes([0] * (w * h // 2) + [2] * (w * h // 2))
    gif = encode_gif(w, h, [f1, f2], PAL4, delays_cs=[25, 50])
    assert b"NETSCAPE2.0" in gif
    out = decode_gif(gif)
    assert out["n_frames"] == 2
    assert out["delays_cs"] == [25, 50]
    assert out["frames"][0] == _rgb_of(f1, PAL4)
    # frame 2 painted index 0 (opaque) everywhere in the top half: the
    # composite equals frame 2's own colors, no bleed-through
    assert out["frames"][1] == _rgb_of(f2, PAL4)


def test_transparency_composites_previous_frame():
    w, h = 5, 2
    f1 = bytes([1]) * (w * h)
    f2 = bytes([0]) * (w * h)  # index 0 declared transparent
    gif = encode_gif(w, h, [f1, f2], PAL4, transparent_index=0)
    out = decode_gif(gif)
    # transparent pixels keep the previous frame's red
    assert out["frames"][1] == _rgb_of(f1, PAL4)


def test_restore_to_background_disposal():
    # hand-build: frame 1 (disposal=2), then full-canvas frame 2 with a
    # transparent top half — the restored area must NOT show frame 1
    w, h = 4, 4
    f1 = bytes([1]) * (w * h)
    f2 = bytes([0] * (w * h // 2) + [2] * (w * h // 2))
    gif = bytearray(encode_gif(w, h, [f1, f2], PAL4,
                               transparent_index=0))
    # first GCE: flip disposal bits (byte after 21 f9 04) from
    # draw-over (0x05 with transparency) to restore-background (0x09)
    i = bytes(gif).index(b"\x21\xf9\x04")
    assert gif[i + 3] & 0x04
    gif[i + 3] = (gif[i + 3] & ~0x1C) | 0x08
    out = decode_gif(bytes(gif))
    top = out["frames"][1][:3 * (w * h // 2)]
    assert top == b"\x00\x00\x00" * (w * h // 2)  # restored, not red
    bottom = out["frames"][1][3 * (w * h // 2):]
    assert bottom == bytes(PAL4[2]) * (w * h // 2)


def test_extensions_are_skipped():
    gif = bytearray(encode_gif(3, 3, [bytes(9)], PAL4))
    # inject a comment extension right before the image descriptor
    i = bytes(gif).index(b"\x2c")
    gif[i:i] = b"\x21\xfe\x05hello\x00"
    assert decode_gif(bytes(gif))["n_frames"] == 1


# ------------------------------------------------------------- fuzz

def test_fuzz_truncation_fails_clean():
    gif = encode_gif(9, 9, [bytes([i % 4 for i in range(81)])], PAL4)
    for cut in range(1, len(gif), 7):
        with pytest.raises(GifError):
            decode_gif(gif[:cut])


def test_fuzz_bitflips_never_hang():
    rng = random.Random(99)
    gif = bytearray(encode_gif(9, 9, [bytes([i % 4 for i in range(81)])],
                               PAL4))
    survived = 0
    for _ in range(300):
        g = bytearray(gif)
        for _ in range(rng.randint(1, 4)):
            g[rng.randrange(len(g))] ^= 1 << rng.randrange(8)
        try:
            out = decode_gif(bytes(g))
            # if it decodes, the invariants must still hold
            assert len(out["frames"][0]) == \
                3 * out["width"] * out["height"]
            survived += 1
        except GifError:
            pass
    # some flips are benign (palette bytes), most must be caught
    assert survived < 300


def test_encode_validates_input():
    with pytest.raises(GifError):
        encode_gif(2, 2, [], PAL4)
    with pytest.raises(GifError):
        encode_gif(2, 2, [bytes(3)], PAL4)  # wrong pixel count
    with pytest.raises(GifError):
        encode_gif(2, 2, [bytes([9, 0, 0, 0])], PAL4)  # index > pal
    with pytest.raises(GifError):
        encode_gif(2, 2, [bytes(4)], [(0, 0, 0)])  # 1-entry palette


def test_pil_cross_check_if_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    w, h = 10, 6
    rng = random.Random(3)
    idx = bytes(rng.randrange(4) for _ in range(w * h))
    gif = encode_gif(w, h, [idx], PAL4)
    im = PIL.open(io.BytesIO(gif)).convert("RGB")
    assert im.size == (w, h)
    assert im.tobytes() == _rgb_of(idx, PAL4)


def test_local_color_table_and_subrect_frames():
    """Hand-built container exercising decoder branches the encoder
    never emits: a per-frame LOCAL color table overriding the global
    one, and a second frame covering only a sub-rectangle of the
    canvas (left/top offsets), composited over the first."""
    import struct as _s

    from article_extractor_spark.core.gif import lzw_compress

    w, h = 6, 4
    g = bytearray(b"GIF89a")
    g += _s.pack("<HH", w, h)
    g.append(0x80 | (1 << 4) | 1)  # global table: 4 entries
    g += b"\x00\x00"
    g += bytes((10, 10, 10)) + bytes((20, 20, 20)) \
        + bytes((30, 30, 30)) + bytes((0, 0, 0))
    # frame 1: full canvas, GLOBAL palette, all index 1
    f1 = bytes([1]) * (w * h)
    g += b"\x2c" + _s.pack("<HHHH", 0, 0, w, h) + b"\x00"
    g.append(2)
    comp = lzw_compress(f1, 2)
    g.append(len(comp)); g += comp; g.append(0)
    # frame 2: 2x2 sub-rect at (3,1), LOCAL palette (red/green/blue/x)
    f2 = bytes([0, 1, 2, 0])
    g += b"\x2c" + _s.pack("<HHHH", 3, 1, 2, 2)
    g.append(0x80 | 1)  # local table, 4 entries
    g += bytes((255, 0, 0)) + bytes((0, 255, 0)) \
        + bytes((0, 0, 255)) + bytes((9, 9, 9))
    g.append(2)
    comp = lzw_compress(f2, 2)
    g.append(len(comp)); g += comp; g.append(0)
    g += b"\x3b"

    from article_extractor_spark.core.gif import decode_gif
    out = decode_gif(bytes(g))
    assert out["n_frames"] == 2
    grey = bytes((20, 20, 20))
    assert out["frames"][0] == grey * (w * h)
    fr = out["frames"][1]

    def px(x, y):
        return fr[3 * (y * w + x):3 * (y * w + x) + 3]

    assert px(3, 1) == bytes((255, 0, 0))
    assert px(4, 1) == bytes((0, 255, 0))
    assert px(3, 2) == bytes((0, 0, 255))
    assert px(4, 2) == bytes((255, 0, 0))
    # everything outside the sub-rect keeps frame 1's grey
    assert px(0, 0) == grey and px(5, 3) == grey and px(2, 1) == grey
