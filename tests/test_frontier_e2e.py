"""Frontier discovery end-to-end: robots.txt -> Sitemap: pointers ->
sitemap urlsets + RSS/Atom feeds -> unioned frontier -> robots
allow/disallow filtering -> politeness scheduling.  Glue-level
integration across sources/sitemap.py, sources/feed.py and
operators/weburl.py — the chain a real crawl runs between "we know
these hosts" and "fetch these URLs at these times"."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-frontier-e2e-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


ROBOTS = [
    ("a.com", """User-agent: *
Disallow: /private/
Sitemap: https://a.com/sitemap.xml
"""),
    ("b.org", """# only a sitemap pointer, everything allowed
sitemap: https://b.org/sm.xml
"""),
]

SITEMAPS = [
    ("https://a.com/sitemap.xml", """<urlset>
       <url><loc>https://a.com/page1</loc>
            <lastmod>2024-01-01T00:00:10Z</lastmod></url>
       <url><loc>https://a.com/private/secret</loc>
            <lastmod>2024-01-01T00:00:11Z</lastmod></url>
       <url><loc>https://a.com/page2</loc>
            <lastmod>2024-01-01T00:00:12Z</lastmod></url>
     </urlset>"""),
    ("https://b.org/sm.xml", """<urlset>
       <url><loc>https://b.org/x</loc>
            <lastmod>2024-01-01T00:00:10Z</lastmod></url>
     </urlset>"""),
]

FEEDS = [
    ("https://a.com/feed", """<rss><channel>
       <item><link>https://a.com/post</link><guid>p1</guid>
         <pubDate>Mon, 01 Jan 2024 00:00:13 GMT</pubDate></item>
       <item><link>https://a.com/private/post</link><guid>p2</guid>
         <pubDate>Mon, 01 Jan 2024 00:00:14 GMT</pubDate></item>
     </channel></rss>"""),
]


def test_frontier_chain(spark):
    from article_extractor_spark.operators.weburl import (
        crawl_schedule, parse_robots_txt, robots_filter)
    from article_extractor_spark.sources.feed import feed_entries
    from article_extractor_spark.sources.sitemap import (
        sitemap_urls, sitemap_urls_from_robots)

    robots = spark.createDataFrame(ROBOTS, "host string, content string")

    # 1. discovery: robots names the sitemaps
    pointers = sorted(r["sitemap_url"] for r in
                      sitemap_urls_from_robots(robots).collect())
    assert pointers == ["https://a.com/sitemap.xml",
                        "https://b.org/sm.xml"]

    # 2. frontier: sitemap urls union feed entries
    sm = sitemap_urls(spark.createDataFrame(
        SITEMAPS, "sitemap_url string, xml string"))
    fe = feed_entries(spark.createDataFrame(
        FEEDS, "feed_url string, xml string"))
    frontier = (sm.select("host", "url",
                          F.col("lastmod").cast("long").alias("ts"))
                  .unionByName(fe.select(
                      "host", "url",
                      F.col("published").cast("long").alias("ts"))))
    rows = frontier.collect()
    assert len(rows) == 6 and all(r["ts"] is not None for r in rows)

    # 3. politeness: robots rules drop the /private/ URLs on a.com
    rules = parse_robots_txt(robots)
    ids = frontier.withColumn(
        "doc_id", F.xxhash64("url")).localCheckpoint()
    allowed = (robots_filter(ids, rules)
               .where(F.col("allowed") == 1)
               .join(ids.select("doc_id", "url", "ts"), "doc_id"))
    urls = sorted(r["url"] for r in allowed.collect())
    assert urls == ["https://a.com/page1", "https://a.com/page2",
                    "https://a.com/post", "https://b.org/x"]

    # 4. scheduling: per-host slots >= request ts, spaced >= min_delay
    sched = crawl_schedule(
        allowed.select("doc_id", "host", F.col("ts")), min_delay=5)
    got = sorted(((r["host"], r["slot"], r["ts"]) for r in
                  sched.collect()))
    by_host = {}
    for host, slot, ts in got:
        assert slot >= ts
        by_host.setdefault(host, []).append(slot)
    for host, slots in by_host.items():
        slots.sort()
        assert all(b - a >= 5 for a, b in zip(slots, slots[1:])), host
    assert len(by_host["a.com"]) == 3 and len(by_host["b.org"]) == 1
