"""PNG/GIF metadata stripping: pixel bit-identity through the real
codecs, targeted chunk/extension removal, animation preservation, and
the format-routed distributed scrub."""

import struct
import zlib

import pytest

from article_extractor_spark.core.gif import decode_gif, encode_gif
from article_extractor_spark.core.mediameta import (strip_gif_metadata,
                                                    strip_media_metadata,
                                                    strip_png_metadata)
from article_extractor_spark.core.png import decode_png, encode_png

PAL4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-mediameta-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">L", len(data)) + ctype + data
            + struct.pack(">L", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def png_with_metadata(seed=0):
    base = encode_png(6, 4, bytes((seed + i) % 256 for i in range(72)))
    # splice tEXt + tIME + eXIf before IEND
    iend = base.rindex(b"IEND") - 4
    extra = (png_chunk(b"tEXt", b"Author\x00Someone Private")
             + png_chunk(b"tIME", struct.pack(">HBBBBB", 2024, 3, 4, 5, 6, 7))
             + png_chunk(b"eXIf", b"II*\x00\x08\x00\x00\x00\x00\x00"))
    return base[:iend] + extra + base[iend:]


def gif_with_metadata(n_frames=2):
    frames = [bytes((k + x + y) % 4 for y in range(4) for x in range(6))
              for k in range(n_frames)]
    base = encode_gif(6, 4, frames, PAL4)
    # splice a comment extension + a fake XMP app extension after header
    flags = base[10]
    hdr_end = 13 + (3 * (1 << ((flags & 0x07) + 1)) if flags & 0x80 else 0)
    comment = b"\x21\xFE\x0Bsecret note\x00"
    xmp = b"\x21\xFF\x0BXMP DataXMP" + b"\x05<xmp/" + b"\x00"
    return base[:hdr_end] + comment + xmp + base[hdr_end:]


def test_png_strip_preserves_pixels():
    dirty = png_with_metadata(5)
    assert b"tEXt" in dirty and b"eXIf" in dirty
    clean = strip_png_metadata(dirty)
    assert b"tEXt" not in clean and b"eXIf" not in clean \
        and b"tIME" not in clean
    assert len(clean) < len(dirty)
    w, h, ch, px = decode_png(clean)
    w2, h2, ch2, px2 = decode_png(encode_png(
        6, 4, bytes((5 + i) % 256 for i in range(72))))
    assert (w, h, px) == (w2, h2, px2)


def test_gif_strip_preserves_animation():
    dirty = gif_with_metadata(3)
    clean = strip_gif_metadata(dirty)
    assert b"secret note" not in clean and b"XMP Data" not in clean
    d0 = decode_gif(gif_with_metadata(3))  # decoder skips extensions
    d1 = decode_gif(clean)
    assert d1["n_frames"] == 3
    assert d1["frames"] == d0["frames"]
    assert d1["delays_cs"] == d0["delays_cs"]


def test_gif_netscape_loop_kept():
    frames = [bytes(24), bytes(24)]
    animated = encode_gif(6, 4, frames, PAL4, loop=True)
    assert b"NETSCAPE" in animated
    clean = strip_gif_metadata(animated)
    assert b"NETSCAPE" in clean  # looping control is not metadata


def test_wav_strip_preserves_samples():
    import io
    import wave

    from article_extractor_spark.core.mediameta import strip_wav_metadata

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<20h", *range(20)))
    base = buf.getvalue()
    # splice a LIST/INFO chunk with an artist tag before the data chunk
    info = b"INFOIART" + struct.pack("<L", 8) + b"Someone\x00"
    lst = b"LIST" + struct.pack("<L", len(info)) + info
    didx = base.index(b"data")
    dirty = base[:didx] + lst + base[didx:]
    clean = strip_wav_metadata(dirty)
    assert b"Someone" not in clean and b"LIST" not in clean
    with wave.open(io.BytesIO(clean), "rb") as r:
        got = r.readframes(r.getnframes())
    assert got == struct.pack("<20h", *range(20))
    # RIFF size field rewritten to the new length
    assert struct.unpack("<L", clean[4:8])[0] == len(clean) - 8
    assert strip_wav_metadata(b"RIFFxxxxNOTW") == b"RIFFxxxxNOTW"


def test_passthrough_unknown_and_truncated():
    assert strip_png_metadata(b"not png") == b"not png"
    assert strip_gif_metadata(b"GIF89a") == b"GIF89a"  # truncated
    dirty = png_with_metadata()
    assert strip_png_metadata(dirty[:30]) == dirty[:30]


def test_routed_scrub_distributed(spark):
    from article_extractor_spark.core.exif import build_exif_jpeg, parse_exif
    from article_extractor_spark.core.jpeg import encode_jpeg_gray
    from article_extractor_spark.operators.exifops import scrub_media_metadata

    jpg = build_exif_jpeg(
        encode_jpeg_gray(16, 16, bytes(range(256))), gps=(1.0, 2.0))
    rows = [(1, jpg), (2, png_with_metadata()), (3, gif_with_metadata()),
            (4, b"other payload")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in scrub_media_metadata(df).collect()}
    assert parse_exif(bytes(got[1]["content"])) == {}
    assert b"tEXt" not in bytes(got[2]["content"])
    assert b"secret note" not in bytes(got[3]["content"])
    assert bytes(got[4]["content"]) == b"other payload"
    assert all(got[i]["bytes_removed"] > 0 for i in (1, 2, 3))
    assert got[4]["bytes_removed"] == 0


def test_wav_list_wavl_audio_form_kept():
    """LIST/'wavl' carries AUDIO per the RIFF spec — the scrub must keep
    it while still dropping LIST/INFO."""
    from article_extractor_spark.core.mediameta import strip_wav_metadata

    data_chunk = b"data" + struct.pack("<L", 4) + b"\x01\x02\x03\x04"
    wavl = b"wavl" + data_chunk
    lst_audio = b"LIST" + struct.pack("<L", len(wavl)) + wavl
    info = b"INFOIART" + struct.pack("<L", 4) + b"Me\x00\x00"
    lst_info = b"LIST" + struct.pack("<L", len(info)) + info
    fmt = b"fmt " + struct.pack("<L", 16) + struct.pack(
        "<HHLLHH", 1, 1, 8000, 16000, 2, 16)
    body = fmt + lst_audio + lst_info
    wav = b"RIFF" + struct.pack("<L", 4 + len(body)) + b"WAVE" + body
    clean = strip_wav_metadata(wav)
    assert b"wavl" in clean and b"\x01\x02\x03\x04" in clean
    assert b"IART" not in clean
