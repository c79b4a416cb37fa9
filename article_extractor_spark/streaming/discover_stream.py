"""Streaming discovery: the incremental twin of the sitemap/feed
frontier sources — live feed and sitemap fetches arrive as files, new
article URLs append exactly once.

Semantics contract (and the one honest difference from batch): the
batch rollups (``feed_entries``, ``sitemap_urls``) are CATALOG views —
newest-published/latest-lastmod wins per key — while a crawl frontier
is FIRST-SEEN — you fetch a URL when you first discover it, and a
later catalog update is a re-crawl decision, not a frontier insert.
So the streaming twins key on guid/url and emit the first arrival,
exactly once (``dropDuplicates`` state + the sink checkpoint, the
``dedup_stream`` pattern); on inputs where each key appears once the
streaming output is row-identical to batch (asserted in
tests/test_streaming_discover.py).

State size = distinct keys seen, NOT corpus rows — frontier keys per
crawl window are bounded; pass ``watermark`` (with an event-time
column on the stream) to bound it further, same trade as
dedup_stream.  All parsing is the batch modules' own zero-shuffle
projections — nothing is reimplemented here.

Unregistered this round (window saturation, NOTES.md), like its batch
counterparts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from article_extractor_spark.sources.feed import parse_feeds
from article_extractor_spark.sources.sitemap import parse_sitemaps

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"


def feed_frontier_stream(feeds_stream: DataFrame,
                         ts_col: str | None = None,
                         watermark_delay: str = "1 hour") -> DataFrame:
    """Stream of fetched feed bodies (feed_url, xml) -> first-seen
    frontier rows (guid, url, title, published, feed_url, host),
    exactly once per guid."""
    entries = parse_feeds(feeds_stream)
    if ts_col:
        entries = entries.withWatermark(ts_col, watermark_delay)
    return (entries.dropDuplicates(["guid"])
                   .withColumn("host", F.lower(F.regexp_extract(
                       F.col("url"), _HOST_RE, 1))))


def sitemap_frontier_stream(sitemaps_stream: DataFrame,
                            ts_col: str | None = None,
                            watermark_delay: str = "1 hour"
                            ) -> DataFrame:
    """Stream of fetched sitemap bodies (sitemap_url, xml) ->
    first-seen frontier rows (url, lastmod, host), exactly once per
    url; cross-host locs are dropped (the same-host rule the batch
    rollup enforces)."""
    parsed = parse_sitemaps(sitemaps_stream)
    same_host = (F.lower(F.regexp_extract(F.col("loc"), _HOST_RE, 1))
                 == F.lower(F.regexp_extract(
                     F.col("sitemap_url"), _HOST_RE, 1)))
    out = (parsed.where(same_host)
                 .select(F.col("loc").alias("url"), "lastmod")
           )
    if ts_col:
        out = out.withWatermark(ts_col, watermark_delay)
    return (out.dropDuplicates(["url"])
               .withColumn("host", F.lower(F.regexp_extract(
                   F.col("url"), _HOST_RE, 1))))


def start_feed_frontier_stream(spark, in_dir: str, out_dir: str):
    """availableNow runner: parquet feed-body backlog -> parquet
    frontier append, checkpointed (exactly-once across restarts)."""
    import os

    feeds = (spark.readStream
                  .schema("feed_url string, xml string")
                  .parquet(in_dir))
    frontier = feed_frontier_stream(feeds)
    return (frontier.writeStream
            .format("parquet")
            .option("path", os.path.join(out_dir, "frontier"))
            .option("checkpointLocation",
                    os.path.join(out_dir, "_checkpoint"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
