"""Round-5 continuation modules: any-image decode routing (GIF included)
and the raw-bytes charset->extract composite.  Both are NEW files
composing frozen closures from the outside — no registered query's
transitive source changes (guarded by test_verification_currency)."""

import hashlib

import pytest

from article_extractor_spark.core.gif import decode_gif, encode_gif
from article_extractor_spark.core.png import encode_png
from article_extractor_spark.operators.media_ext import (
    decode_image_any, image_stats_any, sniff_format)

PAL4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-round5-ext-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _gif_bytes(w=6, h=4, n_frames=1):
    frames = [bytes((x + y + k) % 4 for y in range(h) for x in range(w))
              for k in range(n_frames)]
    return encode_gif(w, h, frames, PAL4)


def _png_bytes(w=5, h=3):
    px = bytes((x * 7 + y * 31 + c) % 256
               for y in range(h) for x in range(w) for c in range(3))
    return encode_png(w, h, px)


def test_sniff_format():
    assert sniff_format(_gif_bytes()) == "gif"
    assert sniff_format(_png_bytes()) == "png"
    assert sniff_format(b"\xFF\xD8\xFF\xE0rest") == "jpeg"
    assert sniff_format(b"plain text") == "other"
    assert sniff_format(b"") == "other"


def test_decode_any_gif_matches_codec():
    gif = _gif_bytes(6, 4, 3)
    w, h, n, px = decode_image_any(gif)
    ref = decode_gif(gif)
    assert (w, h, n) == (6, 4, 3)
    assert px == b"".join(ref["frames"])


def test_decode_any_png_dimensions_and_pixels():
    png = _png_bytes(5, 3)
    w, h, n, px = decode_image_any(png)
    assert (w, h, n) == (5, 3, 1)
    assert len(px) == 5 * 3 * 3


def test_decode_any_jpeg_roundtrip_dims():
    from article_extractor_spark.core.jpeg import encode_jpeg_gray

    pix = bytes((x * 3 + y * 5) % 256 for y in range(16) for x in range(16))
    jpg = encode_jpeg_gray(16, 16, pix)
    w, h, n, px = decode_image_any(jpg)
    assert (w, h, n) == (16, 16, 1)
    assert len(px) == 16 * 16


def test_image_stats_any_distributed(spark):
    rows = [
        (1, _gif_bytes(6, 4, 2)),
        (2, _png_bytes(5, 3)),
        (3, b"not an image at all"),
        (4, _gif_bytes(3, 3, 1)),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in image_stats_any(df).collect()}
    assert out[1]["format"] == "gif"
    assert (out[1]["width"], out[1]["height"], out[1]["n_frames"]) == (6, 4, 2)
    ref = decode_gif(_gif_bytes(6, 4, 2))
    assert out[1]["pixel_md5"] == hashlib.md5(
        b"".join(ref["frames"])).hexdigest()
    assert out[1]["error"] is None
    assert out[2]["format"] == "png"
    assert (out[2]["width"], out[2]["height"]) == (5, 3)
    # malformed member degrades to an error row, never a task failure
    assert out[3]["error"] is not None and out[3]["width"] is None
    assert out[4]["n_frames"] == 1


# ---------------------------------------------------------------- bytes path

def test_extract_from_bytes_parity_with_string_path(spark):
    """utf-8 payloads through the bytes path must extract byte-identically
    to the registered string path."""
    from article_extractor_spark.operators.extract import extract_articles
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)
    from article_extractor_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(40).cache()
    want = {r["url"]: (r["title"], r["text"])
            for r in extract_articles(pages).collect()}

    binpages = pages.selectExpr("url", "encode(html, 'UTF-8') AS body")
    got = {r["url"]: (r["title"], r["text"])
           for r in extract_articles_from_bytes(binpages).collect()}
    assert got == want and len(got) == 40


def test_extract_from_bytes_legacy_encodings(spark):
    """cp1252 and shift_jis pages with meta charset decode correctly before
    extraction (the U+2019 curly quote / Japanese text survive)."""
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)

    def page(enc_label, body_text):
        return ("<html><head><meta charset=\"%s\"><title>T</title></head>"
                "<body><article><p>%s</p><p>%s</p></article></body></html>"
                % (enc_label, body_text * 30, body_text * 30))

    rows = [
        ("http://a.test/1", page("windows-1252", "café ’quote’ ").encode("cp1252")),
        ("http://b.test/2", page("shift_jis", "日本語の文章 ").encode("shift_jis")),
    ]
    df = spark.createDataFrame(rows, "url string, body binary")
    out = {r["url"]: r["text"] for r in extract_articles_from_bytes(df).collect()}
    assert "’quote’" in out["http://a.test/1"]
    assert "café" in out["http://a.test/1"]
    assert "日本語の文章" in out["http://b.test/2"]


def test_warc_to_extract_e2e(spark, tmp_path):
    """The true raw-crawl chain: WARC response records (binary payloads,
    mixed encodings) -> read_warc -> charset decode -> extraction."""
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)
    from article_extractor_spark.sources.warc import build_warc, read_warc

    def page(enc_label, body_text):
        return ("<html><head><meta charset=\"%s\"><title>T</title></head>"
                "<body><article><p>%s</p><p>%s</p></article></body></html>"
                % (enc_label, body_text * 30, body_text * 30))

    records = [
        ("http://w.test/utf8", "2024-01-01T00:00:00Z",
         page("utf-8", "plain utf-8 words here ").encode("utf-8")),
        ("http://w.test/cp1252", "2024-01-01T00:00:01Z",
         page("windows-1252", "smart ’quotes’ and café ").encode("cp1252")),
    ]
    seg = tmp_path / "seg.warc"
    seg.write_bytes(build_warc(records))

    pages = read_warc(spark, str(seg))
    assert dict(pages.dtypes)["html"] == "binary"
    out = {r["url"]: r["text"]
           for r in extract_articles_from_bytes(
               pages, body_col="html").collect()}
    assert "plain utf-8 words here" in out["http://w.test/utf8"]
    assert "’quotes’" in out["http://w.test/cp1252"]
    assert "café" in out["http://w.test/cp1252"]


def test_resize_images_any(spark):
    """Real nearest-neighbor resize: output pixels follow the exact
    integer sampling formula, aspect preserved, never upscaled, GIF
    animations resize their first frame, errors degrade."""
    from article_extractor_spark.core.png import decode_png
    from article_extractor_spark.operators.media_ext import (
        resize_images_any, resize_pixels)

    # formula oracle for the pure kernel
    src = bytes((x * 7 + y * 13 + c) % 256
                for y in range(10) for x in range(8) for c in range(3))
    out = resize_pixels(src, 8, 10, 4, 5)
    for y in range(5):
        for x in range(4):
            sx, sy = (x * 8) // 4, (y * 10) // 5
            assert out[3 * (y * 4 + x):3 * (y * 4 + x) + 3] == \
                src[3 * (sy * 8 + sx):3 * (sy * 8 + sx) + 3]

    big_png = encode_png(16, 8, bytes((i * 3) % 256
                                      for i in range(16 * 8 * 3)))
    small_png = encode_png(4, 4, bytes(48))
    anim = encode_gif(6, 4, [bytes((k + i) % 4 for i in range(24))
                             for k in range(3)], PAL4)
    rows = [(1, big_png), (2, small_png), (3, anim), (4, b"junk")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r
           for r in resize_images_any(df, max_side=8).collect()}
    assert (got[1]["width"], got[1]["height"]) == (8, 4)  # aspect kept
    w, h, _ch, px = decode_png(bytes(got[1]["content"]))
    assert (w, h) == (8, 4) and len(px) == 8 * 4 * 3
    assert (got[2]["width"], got[2]["height"]) == (4, 4)  # never upscaled
    assert (got[3]["width"], got[3]["height"]) == (6, 4)  # first frame
    assert got[4]["error"] is not None
