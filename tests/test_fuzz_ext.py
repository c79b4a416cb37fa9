"""Hypothesis property fuzz for the round-5 continuation modules
(media_ext routing, imagededup banding, audiofp fingerprint) — pure
Python surfaces, no Spark session, milliseconds per example."""

import io
import struct
import wave

from hypothesis import given, settings, strategies as st

from article_extractor_spark.operators.audiofp import wav_energy_fingerprint
from article_extractor_spark.operators.media_ext import (decode_image_any,
                                                         sniff_format)

# ------------------------------------------------------- media_ext routing


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_decode_any_garbage_fails_clean(data):
    """Arbitrary bytes: sniff never raises; decode either succeeds with a
    sane shape or raises one of the typed errors the Arrow operator
    catches (ValueError covers GifError/PngError/JpegError subclasses;
    corrupt PNG deflate raises zlib.error, truncated JPEG headers
    struct.error)."""
    import struct
    import zlib

    assert sniff_format(data) in ("gif", "png", "jpeg", "other")
    try:
        w, h, n, px = decode_image_any(data)
        assert w >= 1 and h >= 1 and n >= 1 and isinstance(px, bytes)
    except (ValueError, NotImplementedError, IndexError,
            zlib.error, struct.error, EOFError):
        pass


def test_corrupt_png_and_truncated_jpeg_become_error_rows():
    """The exact payload classes the review flagged: corrupt PNG IDAT
    (zlib.error) and a bare truncated JPEG header (struct.error) must
    degrade to error rows through the pure decode path's except set."""
    import struct
    import zlib

    from article_extractor_spark.core.png import encode_png

    good = encode_png(4, 4, bytes(48))
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # inside IDAT deflate data
    for payload in (bytes(corrupt), b"\xff\xd8\xff\xc0"):
        try:
            decode_image_any(payload)
        except (ValueError, NotImplementedError, IndexError,
                zlib.error, struct.error, EOFError):
            pass  # exactly the classes image_stats_any catches


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=12),
       st.binary(min_size=1, max_size=200),
       st.integers(min_value=0, max_value=2000),
       st.integers(min_value=0, max_value=255))
def test_corrupted_gif_fails_clean_or_decodes(w, h, noise, pos, flip):
    """A valid GIF with one byte flipped / truncated must decode or fail
    with a typed error — never hang, never return an impossible shape."""
    from article_extractor_spark.core.gif import encode_gif

    pal = [(i * 17 % 256, i * 29 % 256, i * 43 % 256) for i in range(4)]
    idx = bytes((noise[i % len(noise)]) % 4 for i in range(w * h))
    gif = bytearray(encode_gif(w, h, [idx], pal))
    p = pos % len(gif)
    gif[p] ^= flip
    for payload in (bytes(gif), bytes(gif[:p])):
        try:
            dw, dh, n, px = decode_image_any(payload)
            assert dw >= 1 and dh >= 1 and len(px) == dw * dh * 3 * n
        except (ValueError, NotImplementedError, IndexError):
            pass


# ----------------------------------------------------------- EXIF


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=500))
def test_exif_on_garbage_fails_clean(data):
    """parse_exif raises only ExifError on arbitrary bytes; strip_exif
    NEVER raises and is a no-op or a shrink, never a growth."""
    from article_extractor_spark.core.exif import (ExifError, parse_exif,
                                                   strip_exif)

    try:
        out = parse_exif(data)
        assert isinstance(out, dict)
    except ExifError:
        pass
    stripped = strip_exif(data)
    assert len(stripped) <= len(data) or stripped == data


@settings(max_examples=80, deadline=None)
@given(st.integers(min_value=0, max_value=3000),
       st.integers(min_value=1, max_value=255))
def test_exif_bitflip_fails_clean_and_strip_idempotent(pos, flip):
    from article_extractor_spark.core.exif import (ExifError, parse_exif,
                                                   strip_exif)
    from article_extractor_spark.core.jpeg import encode_jpeg_gray

    base = encode_jpeg_gray(16, 16, bytes(range(0, 256)))
    from article_extractor_spark.core.exif import build_exif_jpeg

    jpg = bytearray(build_exif_jpeg(base, make="Cam", gps=(12.5, -7.25)))
    jpg[pos % len(jpg)] ^= flip
    payload = bytes(jpg)
    try:
        parse_exif(payload)
    except ExifError:
        pass
    once = strip_exif(payload)
    assert strip_exif(once) == once  # idempotent


# --------------------------------------------------- imagededup pigeonhole


def band_slices(h, bits, bands):
    """Pure-Python replica of phash_bands' divmod slicing."""
    base, extra = divmod(bits, bands)
    out = []
    offset = 0
    for b in range(bands):
        width = base + (1 if b < extra else 0)
        out.append((h >> offset) & ((1 << width) - 1))
        offset += width
    return out


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=2, max_value=64),
       st.integers(min_value=0, max_value=5),
       st.data())
def test_pigeonhole_no_false_negatives(bits, d, data):
    """Any pair within Hamming distance d agrees exactly on >=1 of the
    d+1 divmod bands — the guarantee the LSH join relies on."""
    bands = min(d + 1, bits)
    h1 = data.draw(st.integers(min_value=0, max_value=(1 << bits) - 1))
    flips = data.draw(st.lists(
        st.integers(min_value=0, max_value=bits - 1),
        min_size=0, max_size=d, unique=True))
    h2 = h1
    for f in flips:
        h2 ^= 1 << f
    assert bin(h1 ^ h2).count("1") <= d
    s1, s2 = band_slices(h1, bits, bands), band_slices(h2, bits, bands)
    if len(flips) < bands:  # pigeonhole needs strictly fewer flips than bands
        assert any(a == b for a, b in zip(s1, s2))
    # bands always reassemble to the hash (disjoint + complete cover)
    base, extra = divmod(bits, bands)
    offset, acc = 0, 0
    for b, v in enumerate(s1):
        acc |= v << offset
        offset += base + (1 if b < extra else 0)
    assert acc == h1


# ----------------------------------------------------------- warc_http


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_split_http_head_never_raises_never_grows(data):
    from article_extractor_spark.sources.warc_http import split_http_head

    status, ctype, payload = split_http_head(data)
    assert len(payload) <= len(data)
    assert status is None or isinstance(status, int)
    if not data.startswith(b"HTTP/"):
        assert payload == data


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=100, max_value=599),
       st.binary(min_size=0, max_size=300),
       st.sampled_from([b"\r\n", b"\n"]))
def test_split_http_head_roundtrip(status, payload, eol):
    """A well-formed head with either line ending yields exactly the
    payload back, wherever \\r\\n\\r\\n appears inside it."""
    from article_extractor_spark.sources.warc_http import split_http_head

    head = (b"HTTP/1.1 %d X" % status) + eol \
        + b"Content-Type: text/html" + eol + eol
    s, c, p = split_http_head(head + payload)
    assert s == status and c == "text/html" and p == payload


# ----------------------------------------------------------- audiofp


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-10000, max_value=10000),
                min_size=1, max_size=3000),
       st.integers(min_value=4, max_value=512),
       st.integers(min_value=1, max_value=64))
def test_fingerprint_matches_pure_fold(samples, frame_len, n_bits):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    n, nf, fp = wav_energy_fingerprint(buf.getvalue(), frame_len, n_bits)
    assert n == len(samples)
    frames = [samples[i:i + frame_len]
              for i in range(0, len(samples), frame_len)]
    assert nf == len(frames)
    want = 0
    for f in range(min(n_bits, len(frames) - 1)):
        a = sum(s * s for s in frames[f])
        b = sum(s * s for s in frames[f + 1])
        if b * len(frames[f]) > a * len(frames[f + 1]):
            want |= 1 << f
    assert fp == want


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(min_value=-3000, max_value=3000),
                min_size=16, max_size=2000),
       st.integers(min_value=2, max_value=10))
def test_fingerprint_amplitude_invariant(samples, scale):
    def wav(xs):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(struct.pack(f"<{len(xs)}h", *xs))
        return buf.getvalue()

    assert wav_energy_fingerprint(wav(samples))[2] == \
        wav_energy_fingerprint(wav([s * scale for s in samples]))[2]


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fingerprint_garbage_fails_clean(data):
    try:
        n, nf, fp = wav_energy_fingerprint(data)
        assert n >= 0 and nf >= 0 and fp >= 0
    except (ValueError, EOFError, wave.Error, struct.error):
        pass


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-9000, max_value=9000),
                min_size=1, max_size=600),
       st.sampled_from([4000, 8000, 16000, 44100]),
       st.sampled_from([4000, 8000, 11025, 16000]))
def test_resample_wav_properties(samples, src_rate, dst_rate):
    """Resample: output length follows the exact formula, identity at
    equal rates, and every output sample exists in the input."""
    import io
    import struct
    import wave

    from article_extractor_spark.operators.audiofp import resample_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(src_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    out = resample_wav(buf.getvalue(), dst_rate)
    with wave.open(io.BytesIO(out), "rb") as r:
        assert r.getframerate() == dst_rate
        got = struct.unpack(f"<{r.getnframes()}h",
                            r.readframes(r.getnframes()))
    assert len(got) == (len(samples) * dst_rate) // src_rate
    for j, v in enumerate(got):
        assert v == samples[(j * src_rate) // dst_rate]
    if src_rate == dst_rate:
        assert got == tuple(samples)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_resample_garbage_fails_clean(data):
    import struct
    import wave

    from article_extractor_spark.operators.audiofp import resample_wav
    from article_extractor_spark.operators.videofp import resample_y4m

    try:
        resample_wav(data, 8000)
    except (ValueError, EOFError, wave.Error, struct.error):
        pass
    try:
        resample_y4m(data, (10, 1))
    except (ValueError, IndexError):
        pass


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=500))
def test_media_scrub_idempotent_never_grows(data):
    """strip_media_metadata on arbitrary bytes: never raises, never
    grows the payload, and is idempotent (scrubbing a scrubbed payload
    is a no-op) — the safety contract of a blind corpus-wide pass."""
    from article_extractor_spark.core.mediameta import strip_media_metadata

    once = strip_media_metadata(data)
    assert len(once) <= len(data) or once == data
    assert strip_media_metadata(once) == once
