"""Sitemap source (sources/sitemap.py): urlset + sitemapindex parsing,
W3C-datetime lastmod, entity/CDATA locs, gzip inflation, cross-host
enforcement — pinned against an INDEPENDENT xml.etree oracle on a
generated corpus plus hand-built spec-shape cases."""

import datetime as dt
import gzip
import random
import xml.etree.ElementTree as ET

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-sitemap-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

URLSET = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="{NS}">
  <url>
    <loc>https://example.com/a?x=1&amp;y=2</loc>
    <lastmod>2024-03-05T10:20:30+02:00</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url>
    <priority>not-a-number</priority>
    <loc><![CDATA[https://example.com/cdata path]]></loc>
    <lastmod>2024-01-02</lastmod>
  </url>
  <url><loc>https://OTHER-host.org/cross</loc></url>
  <url><loc>  https://example.com/trimmed  </loc><lastmod>bogus</lastmod></url>
</urlset>"""

INDEX = f"""<?xml version="1.0"?>
<sitemapindex xmlns="{NS}">
  <sitemap><loc>https://example.com/sitemap-1.xml.gz</loc>
    <lastmod>2024-02-02T00:00:00Z</lastmod></sitemap>
  <sitemap><loc>https://example.com/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "sitemap_url string, xml string")


def test_urlset_fields(spark):
    from article_extractor_spark.sources.sitemap import parse_sitemaps

    rows = {r["loc"]: r for r in parse_sitemaps(
        _df(spark, [("https://example.com/sitemap.xml", URLSET)])
    ).collect()}
    # entry without <loc> dropped; order-independent children parsed
    assert set(rows) == {
        "https://example.com/a?x=1&y=2",
        "https://example.com/cdata path",
        "https://OTHER-host.org/cross",
        "https://example.com/trimmed",
    }
    a = rows["https://example.com/a?x=1&y=2"]
    assert a["changefreq"] == "daily" and a["priority"] == 0.8
    # +02:00 zone converts to UTC
    assert a["lastmod"] == dt.datetime(2024, 3, 5, 8, 20, 30)
    c = rows["https://example.com/cdata path"]
    assert c["priority"] is None  # not-a-number -> NULL, no ANSI error
    assert c["lastmod"] == dt.datetime(2024, 1, 2)  # date-only midnight
    assert rows["https://example.com/trimmed"]["lastmod"] is None


def test_sitemap_index(spark):
    from article_extractor_spark.sources.sitemap import (
        parse_sitemap_index, parse_sitemaps)

    df = _df(spark, [("https://example.com/sitemap.xml", INDEX)])
    got = sorted((r["child_loc"], r["lastmod"]) for r in
                 parse_sitemap_index(df).collect())
    assert got == [
        ("https://example.com/sitemap-1.xml.gz",
         dt.datetime(2024, 2, 2)),
        ("https://example.com/sitemap-2.xml", None),
    ]
    # an index document yields ZERO urlset rows (and vice versa)
    assert parse_sitemaps(df).count() == 0
    assert parse_sitemap_index(
        _df(spark, [("https://e.com/s.xml", URLSET)])).count() == 0


def test_sitemap_urls_same_host_and_latest_lastmod(spark):
    from article_extractor_spark.sources.sitemap import sitemap_urls

    sm2 = f"""<urlset xmlns="{NS}">
      <url><loc>https://example.com/a?x=1&amp;y=2</loc>
           <lastmod>2024-06-01</lastmod></url>
    </urlset>"""
    df = _df(spark, [("https://example.com/s1.xml", URLSET),
                     ("https://example.com/s2.xml", sm2)])
    rows = {r["url"]: r for r in sitemap_urls(df).collect()}
    assert "https://other-host.org/cross" not in {
        u.lower() for u in rows}
    a = rows["https://example.com/a?x=1&y=2"]
    assert a["host"] == "example.com"
    assert a["lastmod"] == dt.datetime(2024, 6, 1)  # max over sitemaps
    # cross-host kept when enforcement is off
    all_rows = sitemap_urls(df, enforce_same_host=False).count()
    assert all_rows == len(rows) + 1


def test_gunzip_bodies(spark):
    from article_extractor_spark.sources.sitemap import (
        gunzip_bodies, parse_sitemaps)

    payloads = [
        ("https://e.com/s.xml.gz", gzip.compress(URLSET.encode())),
        ("https://e.com/plain.xml", URLSET.encode()),
        ("https://e.com/corrupt.xml.gz",
         gzip.compress(URLSET.encode())[:20]),
    ]
    df = spark.createDataFrame(payloads, "sitemap_url string, body binary")
    out = gunzip_bodies(df)
    texts = {r["sitemap_url"]: r["xml"] for r in out.collect()}
    assert texts["https://e.com/s.xml.gz"] == URLSET
    assert texts["https://e.com/plain.xml"] == URLSET
    assert texts["https://e.com/corrupt.xml.gz"] is None
    # and the inflated frames parse end-to-end
    assert parse_sitemaps(out).count() == 8  # 4 locs x 2 good docs


def test_namespace_prefix_tolerated(spark):
    from article_extractor_spark.sources.sitemap import parse_sitemaps

    pref = f"""<sm:urlset xmlns:sm="{NS}">
      <sm:url><sm:loc>https://p.com/x</sm:loc>
        <sm:lastmod>2023-12-31</sm:lastmod></sm:url>
    </sm:urlset>"""
    got = parse_sitemaps(_df(spark, [("https://p.com/s.xml", pref)])) \
        .collect()
    assert [(r["loc"], r["lastmod"]) for r in got] == [
        ("https://p.com/x", dt.datetime(2023, 12, 31))]


def test_entity_decoding_edge(spark):
    from article_extractor_spark.sources.sitemap import parse_sitemaps

    xml = f"""<urlset xmlns="{NS}">
      <url><loc>https://e.com/?q=a&amp;lt;b&#38;c&#x26;d&apos;e</loc></url>
    </urlset>"""
    got = parse_sitemaps(_df(spark, [("https://e.com/s.xml", xml)])) \
        .collect()
    # &amp;lt; is a literal "&lt;" after ONE decode, never "<"
    assert got[0]["loc"] == "https://e.com/?q=a&lt;b&c&d'e"


def test_randomized_vs_etree_oracle(spark):
    """Generated urlsets (random subsets/order of children, random
    entity-bearing locs) parsed identically to xml.etree."""
    from article_extractor_spark.sources.sitemap import parse_sitemaps

    rng = random.Random(4242)
    docs = []
    for d in range(12):
        entries = []
        for u in range(rng.randint(0, 8)):
            loc = (f"https://h{d}.com/p{u}?a=1&amp;b={rng.randint(0,9)}"
                   if rng.random() < 0.5 else f"https://h{d}.com/p{u}")
            kids = [f"<loc>{loc}</loc>"]
            if rng.random() < 0.6:
                kids.append(f"<lastmod>2024-0{rng.randint(1,9)}-1"
                            f"{rng.randint(0,9)}</lastmod>")
            if rng.random() < 0.4:
                kids.append(f"<priority>0.{rng.randint(0,9)}</priority>")
            rng.shuffle(kids)
            entries.append("<url>" + "".join(kids) + "</url>")
        docs.append((f"https://h{d}.com/sitemap.xml",
                     f'<urlset xmlns="{NS}">' + "".join(entries)
                     + "</urlset>"))

    got = sorted(
        (r["sitemap_url"], r["loc"],
         None if r["lastmod"] is None else r["lastmod"].isoformat(),
         r["priority"])
        for r in parse_sitemaps(_df(spark, docs)).collect())

    exp = []
    for su, xml in docs:
        root = ET.fromstring(xml)
        for url in root.findall(f"{{{NS}}}url"):
            loc = url.find(f"{{{NS}}}loc")
            if loc is None or not (loc.text or "").strip():
                continue
            lm = url.find(f"{{{NS}}}lastmod")
            pr = url.find(f"{{{NS}}}priority")
            exp.append((
                su, loc.text.strip(),
                (dt.datetime.strptime(lm.text.strip(), "%Y-%m-%d")
                 .isoformat()) if lm is not None else None,
                float(pr.text) if pr is not None else None))
    assert got == sorted(exp)
