"""JVM-side payload routing + the mixed-media WARC end-to-end chain:
one segment carrying HTML pages and images fans out to extraction and
image near-dup dedup."""

import pytest

from article_extractor_spark.core.gif import encode_gif
from article_extractor_spark.core.png import encode_png
from article_extractor_spark.operators.media_ext import sniff_format
from article_extractor_spark.operators.router import (route_payloads,
                                                      sniff_payloads)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-router-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


PAL = [(0, 0, 0), (255, 255, 255)]


def gif_bytes():
    return encode_gif(4, 4, [bytes(16)], PAL)


def png_bytes():
    return encode_png(4, 4, bytes(48))


def html_bytes(body="hello world "):
    return ("<html><head><title>T</title></head><body><article>"
            f"<p>{body * 40}</p><p>{body * 40}</p></article></body></html>"
            ).encode()


def test_sniff_matches_python_sniffer(spark):
    payloads = [gif_bytes(), png_bytes(), b"\xFF\xD8\xFF\xE0jpeg-ish",
                b"random bytes \x00\x01", b""]
    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r["id"]: r["format"] for r in sniff_payloads(df).collect()}
    for i, p in rows:
        want = sniff_format(p)
        if want == "other":
            assert got[i] in ("other", "html")  # html is a router refinement
        else:
            assert got[i] == want


def test_html_heuristic(spark):
    rows = [
        (1, html_bytes()),
        (2, b"<!DOCTYPE html><p>x</p>"),
        (3, b"{\"json\": true}"),
        (4, b"plain text about <html> spec"),  # contains the token: html
        (5, b"GIF89a" + bytes(20)),            # magic wins over any text
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r["id"]: r["format"] for r in sniff_payloads(df).collect()}
    assert got[1] == "html" and got[2] == "html" and got[4] == "html"
    assert got[3] == "other" and got[5] == "gif"


def test_routing_is_a_partition(spark):
    rows = [(1, gif_bytes()), (2, png_bytes()), (3, html_bytes()),
            (4, b"\x00binary junk")]
    df = spark.createDataFrame(rows, "id long, content binary")
    routed = route_payloads(df)
    ids = {k: {r["id"] for r in v.collect()} for k, v in routed.items()}
    assert ids == {"html": {3}, "image": {1, 2}, "other": {4}}


def test_mixed_media_warc_end_to_end(spark, tmp_path):
    """ONE WARC segment -> read_warc -> route -> HTML through the
    raw-bytes extraction front end, images through decode + phash
    near-dup survivor selection."""
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)
    from article_extractor_spark.operators.imagededup import phash_survivors
    from article_extractor_spark.operators.media_ext import image_stats_any
    from article_extractor_spark.sources.warc import build_warc, read_warc
    from pyspark.sql import functions as F

    dup_gif = gif_bytes()
    checker = bytes((x + y) % 2 for y in range(4) for x in range(4))
    records = [
        ("http://m.test/page1", "2024-01-01T00:00:00Z",
         html_bytes("first article words ")),
        ("http://m.test/page2", "2024-01-01T00:00:01Z",
         html_bytes("second article words ")),
        ("http://m.test/a.gif", "2024-01-01T00:00:02Z", dup_gif),
        ("http://m.test/b.gif", "2024-01-01T00:00:03Z", dup_gif),
        ("http://m.test/c.gif", "2024-01-01T00:00:04Z",
         encode_gif(4, 4, [checker], PAL)),
        ("http://m.test/data.bin", "2024-01-01T00:00:05Z",
         b"\x00\x01neither html nor image"),
    ]
    seg = tmp_path / "mixed.warc"
    seg.write_bytes(build_warc(records))

    pages = read_warc(spark, str(seg)).localCheckpoint()
    routed = route_payloads(pages, content_col="html")

    arts = {r["url"]: r["text"] for r in extract_articles_from_bytes(
        routed["html"], body_col="html").collect()}
    assert set(arts) == {"http://m.test/page1", "http://m.test/page2"}
    assert "first article words" in arts["http://m.test/page1"]

    media = (routed["image"]
             .withColumn("media_id",
                         F.xxhash64("url"))
             .select("media_id", F.col("html").alias("content"), "url"))
    stats = image_stats_any(media)
    decoded = stats.filter("error IS NULL")
    assert decoded.count() == 3

    hashes = decoded.select(
        "media_id",
        F.expr("cast(conv(substring(pixel_md5, 1, 4), 16, 10) as long)")
        .alias("phash"))
    kept = phash_survivors(hashes, max_hamming=0)
    # the two identical GIFs collapse to one survivor; checker stays
    assert kept.count() == 2

    assert routed["other"].count() == 1