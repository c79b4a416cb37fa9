"""Streaming discovery twins (streaming/discover_stream.py): feed and
sitemap bodies drained with availableNow, first-seen-per-key frontier
appended exactly once across restarts; row-identical to the batch
rollups on unique-key input."""

import os

import pytest
from pyspark.sql import SparkSession, functions as F


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-stream-discover-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _feed(host, n0, n, guid_prefix="g"):
    items = "".join(
        f"<item><guid>{guid_prefix}{i}</guid>"
        f"<link>https://{host}/p{i}</link>"
        f"<pubDate>Mon, 05 Aug 2024 10:00:{i % 60:02d} GMT</pubDate>"
        f"</item>" for i in range(n0, n0 + n))
    return f"<rss><channel>{items}</channel></rss>"


def test_feed_frontier_stream_exactly_once(spark, tmp_path):
    from article_extractor_spark.streaming.discover_stream import (
        start_feed_frontier_stream)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    wave1 = [("https://a.com/feed", _feed("a.com", 0, 5)),
             ("https://b.org/feed", _feed("b.org", 0, 3, "h")),
             # duplicate guids WITHIN the wave: g0..g4 again, new url
             ("https://mirror.net/feed", _feed("mirror.net", 0, 5))]
    spark.createDataFrame(wave1, "feed_url string, xml string") \
        .coalesce(1).write.mode("append").parquet(in_dir)

    q = start_feed_frontier_stream(spark, in_dir, out_dir)
    q.awaitTermination(300)
    got = spark.read.parquet(os.path.join(out_dir, "frontier"))
    assert got.count() == 8  # 5 unique g* + 3 h*, mirror deduped
    assert got.select("guid").distinct().count() == 8

    # wave 2: overlap (g3, g4) + new (g5, g6) -> only the delta appends
    wave2 = [("https://a.com/feed", _feed("a.com", 3, 4))]
    spark.createDataFrame(wave2, "feed_url string, xml string") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    q2 = start_feed_frontier_stream(spark, in_dir, out_dir)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(os.path.join(out_dir, "frontier"))
    assert got2.count() == 10
    assert got2.where(F.col("guid").isin("g5", "g6")).count() == 2
    # g3 kept its FIRST-SEEN url (a.com wave-1), not re-emitted
    assert got2.where(F.col("guid") == "g3").count() == 1


def test_feed_stream_matches_batch_on_unique_keys(spark, tmp_path):
    from article_extractor_spark.sources.feed import feed_entries
    from article_extractor_spark.streaming.discover_stream import (
        start_feed_frontier_stream)

    rows = [("https://a.com/feed", _feed("a.com", 0, 6)),
            ("https://b.org/feed", _feed("b.org", 10, 4, "q"))]
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    df = spark.createDataFrame(rows, "feed_url string, xml string")
    df.coalesce(1).write.parquet(in_dir)
    q = start_feed_frontier_stream(spark, in_dir, out_dir)
    q.awaitTermination(300)
    cols = ["guid", "url", "title", "published", "feed_url", "host"]
    got = sorted(map(tuple, spark.read.parquet(
        os.path.join(out_dir, "frontier")).select(cols).collect()))
    exp = sorted(map(tuple, feed_entries(df).select(cols).collect()))
    assert got == exp


def test_sitemap_frontier_stream(spark, tmp_path):
    from article_extractor_spark.streaming.discover_stream import (
        sitemap_frontier_stream)

    sm = """<urlset>
      <url><loc>https://a.com/x</loc><lastmod>2024-01-02</lastmod></url>
      <url><loc>https://a.com/x</loc><lastmod>2024-01-03</lastmod></url>
      <url><loc>https://EVIL.org/x</loc></url>
      <url><loc>https://a.com/y</loc></url>
    </urlset>"""
    in_dir = str(tmp_path / "in")
    spark.createDataFrame([("https://a.com/s.xml", sm)],
                          "sitemap_url string, xml string") \
        .coalesce(1).write.parquet(in_dir)
    stream = (spark.readStream
              .schema("sitemap_url string, xml string").parquet(in_dir))
    out_dir = str(tmp_path / "out")
    q = (sitemap_frontier_stream(stream).writeStream
         .format("parquet")
         .option("path", os.path.join(out_dir, "frontier"))
         .option("checkpointLocation", os.path.join(out_dir, "_cp"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {r["url"]: r for r in spark.read.parquet(
        os.path.join(out_dir, "frontier")).collect()}
    # cross-host dropped; duplicate url emitted once; host attached
    assert set(got) == {"https://a.com/x", "https://a.com/y"}
    assert got["https://a.com/x"]["host"] == "a.com"
