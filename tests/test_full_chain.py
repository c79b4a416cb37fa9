"""Capstone chain over the continuation modules: one mixed WARC segment
-> payload routing -> robots-meta gate -> fused bytes extraction ->
host-quality gate -> canonical dedup -> WET segments, with the media
branch scrubbed of metadata and deduped by phash.  Every stage is the
library operator; expectations are derived independently per stage."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-full-chain-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


GOOD_BODY = ("a perfectly reasonable paragraph of website text with "
             "common words and punctuation, the kind a real site has. ")
JUNK_BODY = "buy cheap now "


def page(body, head_extra="", canonical=None):
    canon = (f'<link rel="canonical" href="{canonical}">'
             if canonical else "")
    return (f"<html><head><title>T</title>{head_extra}{canon}</head>"
            f"<body><article><p>{body * 40}</p><p>{body * 40}</p>"
            "</article></body></html>").encode()


def test_full_curation_chain(spark, tmp_path):
    from article_extractor_spark.core.exif import build_exif_jpeg, parse_exif
    from article_extractor_spark.core.jpeg import encode_jpeg_gray
    from article_extractor_spark.operators.exifops import scrub_media_metadata
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)
    from article_extractor_spark.operators.hostquality import (
        filter_by_host_quality)
    from article_extractor_spark.operators.htmlmeta import (canonical_dedup,
                                                            noindex_filter)
    from article_extractor_spark.operators.router import route_payloads
    from article_extractor_spark.sources.warc import build_warc, read_warc
    from article_extractor_spark.sources.wet_sink import write_wet_segments

    jpg = build_exif_jpeg(
        encode_jpeg_gray(16, 16, bytes(range(256))), gps=(48.85, 2.29))
    records = [
        # good.test: two url-variants of ONE canonical article + one more
        ("http://good.test/a?utm=x", "2024-01-01T00:00:00Z",
         page(GOOD_BODY, canonical="http://good.test/a")),
        ("http://good.test/a", "2024-01-01T00:00:01Z",
         page(GOOD_BODY, canonical="http://good.test/a")),
        ("http://good.test/b", "2024-01-01T00:00:02Z", page(GOOD_BODY)),
        # noindex page on the good host: publisher opted out
        ("http://good.test/private", "2024-01-01T00:00:03Z",
         page(GOOD_BODY, head_extra='<meta name="robots" content="noindex">')),
        # junk host: three junk pages -> host gate drops the domain
        ("http://junk.test/1", "2024-01-01T00:00:04Z", page(JUNK_BODY)),
        ("http://junk.test/2", "2024-01-01T00:00:05Z", page(JUNK_BODY)),
        ("http://junk.test/3", "2024-01-01T00:00:06Z", page(JUNK_BODY)),
        # media payload with GPS EXIF
        ("http://good.test/photo.jpg", "2024-01-01T00:00:07Z", jpg),
    ]
    seg = tmp_path / "in.warc"
    seg.write_bytes(build_warc(records))

    pages = read_warc(spark, str(seg)).localCheckpoint()
    routed = route_payloads(pages, content_col="html")

    # text branch -------------------------------------------------------
    indexed = noindex_filter(
        routed["html"].withColumn("html",
                                  F.decode(F.col("html"), "UTF-8")))
    assert indexed.count() == 6  # 7 html pages minus the noindex one

    arts = extract_articles_from_bytes(
        indexed.select("url", F.encode("html", "UTF-8").alias("body")),
        body_col="body").localCheckpoint()
    # junk pages here are LONG (length factor saturates at 0.4) but have
    # zero stopwords and no punctuation; good pages add the stopword and
    # punctuation terms (~0.7) — gate between the two bands
    gated = filter_by_host_quality(
        arts.withColumn("doc_id", F.xxhash64("url")),
        min_mean_quality=0.45, min_pages=2).localCheckpoint()
    assert {r["url"].split("/")[2] for r in gated.collect()} == {"good.test"}
    assert gated.count() == 3  # junk.test domain gone whole

    # canonical dedup needs the page html; rejoin by url
    html_by_url = routed["html"].select(
        "url", F.decode(F.col("html"), "UTF-8").alias("page_html"))
    deduped = canonical_dedup(
        gated.join(html_by_url, "url"),
        html_col="page_html", url_col="url")
    urls = {r["url"] for r in deduped.collect()}
    assert urls == {"http://good.test/a", "http://good.test/b"}

    out = str(tmp_path / "wet")
    n = write_wet_segments(deduped, out)
    assert n == 2
    back = read_warc(spark, out, record_types=("conversion",))
    assert back.count() == 2

    # last mile: verified training shards over the curated survivors
    from article_extractor_spark.plans.shards import (verify_shards,
                                                     write_training_shards)

    shard_dir = str(tmp_path / "shards")
    manifest = write_training_shards(
        deduped.select("url", "text"), shard_dir, n_shards=2,
        key_col="url")
    assert manifest["total_rows"] == 2
    assert verify_shards(spark, shard_dir)["ok"]

    # media branch ------------------------------------------------------
    media = routed["image"].select(
        F.xxhash64("url").alias("media_id"),
        F.col("html").alias("content"))
    scrubbed = scrub_media_metadata(media).collect()
    assert len(scrubbed) == 1
    assert scrubbed[0]["bytes_removed"] > 0
    assert parse_exif(bytes(scrubbed[0]["content"])) == {}  # GPS gone
