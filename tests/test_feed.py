"""RSS/Atom feed source (sources/feed.py): RFC-822 and RFC-3339 date
chains, CDATA/entity titles, Atom link-rel selection, format dispatch,
and the guid-deduped frontier rollup — pinned against hand-built spec
cases plus an independent xml.etree oracle on randomized RSS feeds."""

import datetime as dt
import random
import xml.etree.ElementTree as ET

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-feed-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Example Blog</title>
  <item>
    <title><![CDATA[First & Best]]></title>
    <link>https://blog.example.com/a?x=1&amp;y=2</link>
    <guid>post-a</guid>
    <pubDate>Mon, 05 Aug 2024 10:20:30 GMT</pubDate>
    <description>Hello &amp; welcome</description>
  </item>
  <item>
    <pubDate>Tue, 06 Aug 2024 01:02:03 +0200</pubDate>
    <link>https://blog.example.com/b</link>
  </item>
  <item><title>no link, dropped</title></item>
  <item>
    <link>https://blog.example.com/c</link>
    <pubDate>not a date</pubDate>
  </item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Feed</title>
  <entry>
    <title>Entry One</title>
    <link rel="self" href="https://site.org/meta/1"/>
    <link rel="alternate" href="https://site.org/posts/1?a=1&amp;b=2"/>
    <id>urn:one</id>
    <published>2024-03-05T10:20:30+02:00</published>
    <summary>sum one</summary>
  </entry>
  <entry>
    <link href="https://site.org/posts/2"/>
    <updated>2024-03-06T00:00:00Z</updated>
    <content>full content</content>
  </entry>
  <entry><title>linkless, dropped</title><id>urn:x</id></entry>
</feed>"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "feed_url string, xml string")


def test_rss_items(spark):
    from article_extractor_spark.sources.feed import parse_rss

    rows = {r["url"]: r for r in parse_rss(
        _df(spark, [("https://blog.example.com/feed", RSS)])).collect()}
    assert set(rows) == {"https://blog.example.com/a?x=1&y=2",
                         "https://blog.example.com/b",
                         "https://blog.example.com/c"}
    a = rows["https://blog.example.com/a?x=1&y=2"]
    assert a["title"] == "First & Best"  # CDATA + literal ampersand
    assert a["guid"] == "post-a"
    assert a["published"] == dt.datetime(2024, 8, 5, 10, 20, 30)
    assert a["summary"] == "Hello & welcome"
    b = rows["https://blog.example.com/b"]
    assert b["guid"] == b["url"]  # guid falls back to link
    assert b["published"] == dt.datetime(2024, 8, 5, 23, 2, 3)  # UTC
    assert rows["https://blog.example.com/c"]["published"] is None


def test_atom_entries(spark):
    from article_extractor_spark.sources.feed import parse_atom

    rows = {r["url"]: r for r in parse_atom(
        _df(spark, [("https://site.org/atom.xml", ATOM)])).collect()}
    # rel="self" skipped, rel="alternate" chosen; bare link accepted
    assert set(rows) == {"https://site.org/posts/1?a=1&b=2",
                         "https://site.org/posts/2"}
    one = rows["https://site.org/posts/1?a=1&b=2"]
    assert one["guid"] == "urn:one"
    assert one["published"] == dt.datetime(2024, 3, 5, 8, 20, 30)
    assert one["summary"] == "sum one"
    two = rows["https://site.org/posts/2"]
    assert two["published"] == dt.datetime(2024, 3, 6)  # updated used
    assert two["summary"] == "full content"  # content fallback
    assert two["guid"] == two["url"]


def test_dispatch_and_cross_format(spark):
    from article_extractor_spark.sources.feed import parse_feeds

    df = _df(spark, [("https://blog.example.com/feed", RSS),
                     ("https://site.org/atom.xml", ATOM),
                     ("https://junk.org/x", "<html>not a feed</html>"),
                     ("https://null.org/y", None)])
    got = parse_feeds(df).collect()
    assert len(got) == 5  # 3 RSS + 2 Atom, junk/null contribute none
    assert {r["feed_url"] for r in got} == {
        "https://blog.example.com/feed", "https://site.org/atom.xml"}


def test_feed_entries_dedup_latest(spark):
    from article_extractor_spark.sources.feed import feed_entries

    rss2 = """<rss><channel><item>
      <guid>post-a</guid><link>https://blog.example.com/a-moved</link>
      <pubDate>Wed, 01 Jan 2025 00:00:00 GMT</pubDate>
    </item></channel></rss>"""
    df = _df(spark, [("https://blog.example.com/feed", RSS),
                     ("https://mirror.example.net/feed", rss2)])
    rows = {r["guid"]: r for r in feed_entries(df).collect()}
    # same guid in two feeds: the newer published wins
    a = rows["post-a"]
    assert a["url"] == "https://blog.example.com/a-moved"
    assert a["published"] == dt.datetime(2025, 1, 1)
    assert a["host"] == "blog.example.com"
    assert len(rows) == 3  # post-a + b + c


def test_randomized_rss_vs_etree_oracle(spark):
    from article_extractor_spark.sources.feed import parse_rss

    rng = random.Random(77)
    docs = []
    for d in range(10):
        items = []
        for u in range(rng.randint(0, 6)):
            kids = [f"<link>https://h{d}.com/p{u}</link>"]
            if rng.random() < 0.7:
                day = rng.randint(1, 28)
                kids.append(
                    f"<pubDate>Mon, {day:02d} Aug 2024 "
                    f"0{rng.randint(0,9)}:15:00 GMT</pubDate>")
            if rng.random() < 0.5:
                kids.append(f"<title>t {u} &amp; {d}</title>")
            rng.shuffle(kids)
            items.append("<item>" + "".join(kids) + "</item>")
        docs.append((f"https://h{d}.com/feed",
                     "<rss><channel>" + "".join(items)
                     + "</channel></rss>"))

    got = sorted(
        (r["feed_url"], r["url"], r["title"],
         None if r["published"] is None else r["published"].isoformat())
        for r in parse_rss(_df(spark, docs)).collect())

    exp = []
    for fu, xml in docs:
        for item in ET.fromstring(xml).iter("item"):
            link = item.find("link")
            if link is None or not (link.text or "").strip():
                continue
            t = item.find("title")
            pd_el = item.find("pubDate")
            ts = None
            if pd_el is not None:
                ts = dt.datetime.strptime(
                    pd_el.text.strip(), "%a, %d %b %Y %H:%M:%S %Z") \
                    .isoformat()
            exp.append((fu, link.text.strip(),
                        t.text.strip() if t is not None else None, ts))
    assert got == sorted(exp)
