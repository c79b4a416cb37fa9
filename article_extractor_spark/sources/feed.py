"""RSS 2.0 / Atom 1.0 feed source — the reference's own habitat.

The reference extractor (/root/reference, rijkvp/article-extractor) is
consumed by feed readers: a feed names article URLs, the extractor
fetches and cleans them.  This connector is that first half as a Spark
source: fetched feed bodies (one row per document) parse into typed
per-entry rows that feed the extraction pipeline / crawl frontier,
exactly like sources/sitemap.py feeds discovery.

Scale stance (same as sitemap/cdx): JVM-side parsing only —
``regexp_extract_all`` over ``<item>``/``<entry>`` blocks, per-field
regexp with CDATA + entity decode (shared helpers from
sources/sitemap.py), ``try_to_timestamp`` chains for RFC-822 (RSS
pubDate, weekday prefix stripped first; numeric or named zone) and
RFC-3339 (Atom updated/published) — a zero-shuffle narrow projection.

Atom specifics handled: ``<link href="..."/>`` is an ATTRIBUTE (rel
="alternate" preferred, bare links accepted, rel="self"/"enclosure"
etc. ignored); entry id falls back to the link.  Documents whose root
is neither an RSS channel nor an Atom feed yield zero rows.

Unregistered as a driver query this round (window saturation,
NOTES.md); pytest-oracled in tests/test_feed.py incl. an independent
xml.etree oracle over randomized feeds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from article_extractor_spark.sources.sitemap import (_child,
                                                     _xml_unescape)

_ITEM_BLOCK = r"(?s)<item[\s>].*?</item\s*>|<item/>"
_ENTRY_BLOCK = r"(?s)<(?:\w+:)?entry[\s>].*?</(?:\w+:)?entry\s*>"

# Atom <link ... href="..."> — rel must be absent or "alternate"
_ATOM_ALT_LINK = (
    r'<(?:\w+:)?link(?![^>]*\brel\s*=\s*"(?!alternate")[^"]*")'
    r'[^>]*\bhref\s*=\s*"([^"]*)"')


def _rfc822(c: Column) -> Column:
    """RSS pubDate: optional weekday prefix stripped, then numeric
    (+0200) or named (GMT/UTC) zone; 1- or 2-digit day."""
    bare = F.regexp_replace(c, r"^\s*[A-Za-z]{3},\s*", "")
    return F.coalesce(
        F.try_to_timestamp(bare, F.lit("dd MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(bare, F.lit("dd MMM yyyy HH:mm:ss zzz")),
        F.try_to_timestamp(bare, F.lit("d MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(bare, F.lit("d MMM yyyy HH:mm:ss zzz")))


def _rfc3339(c: Column) -> Column:
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")))


def parse_rss(df: DataFrame, url_col: str = "feed_url",
              xml_col: str = "xml") -> DataFrame:
    """One row per RSS <item>: (feed_url, title, url, guid, published,
    summary).  Items without a <link> are dropped (nothing to fetch);
    guid falls back to the link."""
    blocks = df.select(
        F.col(url_col).alias("feed_url"),
        F.explode(F.regexp_extract_all(
            F.coalesce(F.col(xml_col), F.lit("")),
            F.lit(_ITEM_BLOCK), F.lit(0))).alias("_b"))
    b = F.col("_b")
    link = _xml_unescape(_child(b, "link"))
    return (blocks
            .select("feed_url",
                    _xml_unescape(_child(b, "title")).alias("title"),
                    link.alias("url"),
                    F.coalesce(_xml_unescape(_child(b, "guid")),
                               link).alias("guid"),
                    _rfc822(_child(b, "pubDate")).alias("published"),
                    _xml_unescape(
                        _child(b, "description")).alias("summary"))
            .where(F.col("url").isNotNull()))


def parse_atom(df: DataFrame, url_col: str = "feed_url",
               xml_col: str = "xml") -> DataFrame:
    """One row per Atom <entry>: same shape as parse_rss.  The url is
    the first alternate (or rel-less) <link href>; published falls
    back to <updated>; summary falls back to <content>."""
    blocks = df.select(
        F.col(url_col).alias("feed_url"),
        F.explode(F.regexp_extract_all(
            F.coalesce(F.col(xml_col), F.lit("")),
            F.lit(_ENTRY_BLOCK), F.lit(0))).alias("_b"))
    b = F.col("_b")
    href = F.regexp_extract(b, _ATOM_ALT_LINK, 1)
    link = F.when(href != "", _xml_unescape(href))
    published = F.coalesce(
        _rfc3339(_child(b, "published")),
        _rfc3339(_child(b, "updated")))
    return (blocks
            .select("feed_url",
                    _xml_unescape(_child(b, "title")).alias("title"),
                    link.alias("url"),
                    F.coalesce(_xml_unescape(_child(b, "id")),
                               link).alias("guid"),
                    published.alias("published"),
                    F.coalesce(
                        _xml_unescape(_child(b, "summary")),
                        _xml_unescape(
                            _child(b, "content"))).alias("summary"))
            .where(F.col("url").isNotNull()))


def parse_feeds(df: DataFrame, url_col: str = "feed_url",
                xml_col: str = "xml") -> DataFrame:
    """Format dispatch by root element: RSS channels through parse_rss,
    Atom feeds through parse_atom, anything else zero rows.  One union
    of two narrow projections — still zero shuffles."""
    is_rss = F.coalesce(F.col(xml_col), F.lit("")) \
        .rlike(r"<(?:\w+:)?rss[\s>]|<(?:\w+:)?channel[\s>]")
    is_atom = F.coalesce(F.col(xml_col), F.lit("")) \
        .rlike(r"<(?:\w+:)?feed[\s>]")
    rss = parse_rss(df.where(is_rss), url_col, xml_col)
    atom = parse_atom(df.where(~is_rss & is_atom), url_col, xml_col)
    return rss.unionByName(atom)


def feed_entries(df: DataFrame, url_col: str = "feed_url",
                 xml_col: str = "xml") -> DataFrame:
    """The frontier product: one row per distinct guid across all
    feeds, newest published kept, with the article host — the direct
    input to the crawl scheduler / unseen-keys anti-join.  One guid-
    keyed shuffle (max_by struct), nothing else."""
    parsed = parse_feeds(df, url_col, xml_col)
    pick = F.max(F.struct(
        F.col("published"), F.col("url"), F.col("title"),
        F.col("feed_url"))).alias("_p")
    host = F.lower(F.regexp_extract(
        F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    return (parsed.groupBy("guid").agg(pick)
                  .select("guid", F.col("_p.url").alias("url"),
                          F.col("_p.title").alias("title"),
                          F.col("_p.published").alias("published"),
                          F.col("_p.feed_url").alias("feed_url"))
                  .withColumn("host", host))
