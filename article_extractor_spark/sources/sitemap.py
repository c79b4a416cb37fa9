"""Sitemap source (sitemaps.org XML: urlset + sitemapindex).

The discovery side of the crawl pipeline: robots.txt names sitemaps
(``Sitemap:`` lines already surface via
``operators/weburl.py::parse_robots_txt`` callers), sitemaps name URLs,
and the URL stream feeds ``crawl_schedule`` / the incremental
unseen-keys anti-join.  This connector parses fetched sitemap bodies —
one row per document — into typed per-URL rows.

Scale stance (same as sources/cdx.py): parsing is JVM-side —
``regexp_extract_all`` over ``<url>``/``<sitemap>`` blocks, per-field
regexp, entity decode as a Catalyst expression chain — a zero-shuffle
narrow projection over input splits; no Python in the hot path.  Gzip
sidecars (``sitemap.xml.gz``) are inflated in one Arrow batch step
(``gunzip_bodies``), matching how sources/warc.py treats gzip members.

Subset honestly supported (the machine-generated reality of the
format): default-or-prefixed sitemap namespaces, ``loc``/``lastmod``/
``changefreq``/``priority`` children in any order, CDATA or
entity-encoded locs, W3C datetime lastmod (date-only or full).
Documents whose root is neither urlset nor sitemapindex yield zero
rows rather than failing the job.

No reference-repo analogue (the reference extracts article bodies);
this serves the engine's web-pipeline family.  Unregistered as a
driver query this round (window saturation, NOTES.md) — pytest-oracled
in tests/test_sitemap.py including an independent xml.etree oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a <url> or <sitemap> entry block, namespace-prefix tolerant
_URL_BLOCK = r"(?s)<(?:\w+:)?url[\s>].*?</(?:\w+:)?url>"
_SITEMAP_BLOCK = r"(?s)<(?:\w+:)?sitemap[\s>].*?</(?:\w+:)?sitemap>"


def _child(block: Column, tag: str) -> Column:
    """First <tag> child text of an entry block: CDATA unwrapped,
    surrounding whitespace trimmed; NULL when absent."""
    pat = (rf"(?s)<(?:\w+:)?{tag}\s*>\s*(?:<!\[CDATA\[(.*?)\]\]>|(.*?))"
           rf"\s*</(?:\w+:)?{tag}>")
    cdata = F.regexp_extract(block, pat, 1)
    plain = F.regexp_extract(block, pat, 2)
    out = F.when(cdata != "", cdata).when(plain != "", plain)
    return out  # NULL when the tag is missing or empty


def _xml_unescape(c: Column) -> Column:
    """The five predefined XML entities plus decimal/hex numeric refs
    for them (the forms sitemap generators actually emit).  The
    ampersand forms are decoded LAST in ONE pass so ``&amp;lt;``
    decodes to ``&lt;``, not ``<`` (replacements are never rescanned;
    the non-amp decodes emit single non-& characters, so they cannot
    fabricate an ampersand entity)."""
    for pat, ch in (("&lt;|&#60;|&#[xX]3[cC];", "<"),
                    ("&gt;|&#62;|&#[xX]3[eE];", ">"),
                    ('&quot;|&#34;|&#[xX]22;', '"'),
                    ("&apos;|&#39;|&#[xX]27;", "'")):
        c = F.regexp_replace(c, pat, ch)
    return F.regexp_replace(c, "&amp;|&#38;|&#[xX]26;", "&")


def gunzip_bodies(df: DataFrame, body_col: str = "body",
                  out_col: str = "xml") -> DataFrame:
    """Inflate gzip'd sitemap payloads (binary column) to text; plain
    (non-gzip) binaries pass through decoded as UTF-8.  One Arrow
    batch step (mapInPandas), the sources/warc.py gzip stance."""
    import gzip

    import pandas as pd

    cols = [f.name for f in df.schema.fields]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        if f.name != body_col) + f", {out_col} string"
    keep = [c for c in cols if c != body_col]

    def fn(batches):
        for pdf in batches:
            out = pdf[keep].copy()
            texts = []
            for raw in pdf[body_col]:
                b = bytes(raw) if raw is not None else b""
                if b[:2] == b"\x1f\x8b":
                    try:
                        b = gzip.decompress(b)
                    except (OSError, EOFError):  # truncated -> EOFError
                        texts.append(None)
                        continue
                texts.append(b.decode("utf-8", "replace"))
            out[out_col] = pd.Series(texts, dtype="object")
            yield out

    return df.mapInPandas(fn, schema)


def parse_sitemaps(df: DataFrame, url_col: str = "sitemap_url",
                   xml_col: str = "xml") -> DataFrame:
    """One row per <url> entry across all sitemap documents:
    (sitemap_url, loc, lastmod timestamp, changefreq, priority double).

    ``lastmod`` accepts W3C datetime — date-only becomes midnight UTC;
    zoned datetimes convert to UTC.  Entries without a <loc> are
    dropped (the one required field, sitemaps.org §XML tag defs)."""
    blocks = df.select(
        F.col(url_col).alias("sitemap_url"),
        F.explode(F.regexp_extract_all(
            F.coalesce(F.col(xml_col), F.lit("")),
            F.lit(_URL_BLOCK), F.lit(0))).alias("_b"))
    b = F.col("_b")
    # try_to_timestamp: pattern misses fall through the coalesce chain
    # as NULL instead of raising under Spark 4's default ANSI mode
    lastmod_raw = _child(b, "lastmod")
    lastmod = F.coalesce(
        F.try_to_timestamp(lastmod_raw,
                           F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(lastmod_raw,
                           F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(lastmod_raw, F.lit("yyyy-MM-dd")))
    prio = F.col("_prio").try_cast("double")  # garbage -> NULL, not ANSI error
    out = (blocks
           .withColumn("loc", _xml_unescape(_child(b, "loc")))
           .withColumn("lastmod", lastmod)
           .withColumn("changefreq", _child(b, "changefreq"))
           .withColumn("_prio", _child(b, "priority"))
           .where(F.col("loc").isNotNull())
           .select("sitemap_url", "loc", "lastmod", "changefreq",
                   prio.alias("priority")))
    return out


def parse_sitemap_index(df: DataFrame, url_col: str = "sitemap_url",
                        xml_col: str = "xml") -> DataFrame:
    """One row per child sitemap of <sitemapindex> documents:
    (sitemap_url, child_loc, lastmod).  Drive the fetch loop with
    this: fetch roots -> parse_sitemap_index -> fetch children ->
    parse_sitemaps."""
    blocks = df.select(
        F.col(url_col).alias("sitemap_url"),
        F.explode(F.regexp_extract_all(
            F.coalesce(F.col(xml_col), F.lit("")),
            F.lit(_SITEMAP_BLOCK), F.lit(0))).alias("_b"))
    b = F.col("_b")
    lastmod = F.coalesce(
        F.try_to_timestamp(_child(b, "lastmod"),
                           F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(_child(b, "lastmod"), F.lit("yyyy-MM-dd")))
    return (blocks
            .withColumn("child_loc", _xml_unescape(_child(b, "loc")))
            .withColumn("lastmod", lastmod)
            .where(F.col("child_loc").isNotNull())
            .select("sitemap_url", "child_loc", "lastmod"))


_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"


def _host_of(c: Column) -> Column:
    return F.lower(F.regexp_extract(c, _HOST_RE, 1))


def sitemap_urls_from_robots(robots: DataFrame, host_col: str = "host",
                             content_col: str = "content") -> DataFrame:
    """Discovery glue: the ``Sitemap:`` lines of robots.txt bodies
    (REP extension, case-insensitive, absolute URLs) -> (host,
    sitemap_url) rows.  ``operators/weburl.py::parse_robots_txt``
    handles the allow/disallow groups; this surfaces the sitemap
    pointers the same bodies carry.  Zero-shuffle JVM projection."""
    return (robots.select(
                F.col(host_col).alias("host"),
                F.explode(F.regexp_extract_all(
                    F.coalesce(F.col(content_col), F.lit("")),
                    F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"),
                    F.lit(1))).alias("sitemap_url"))
            .where(F.col("sitemap_url") != ""))


def sitemap_urls(df: DataFrame, url_col: str = "sitemap_url",
                 xml_col: str = "xml",
                 enforce_same_host: bool = True) -> DataFrame:
    """The end product for the frontier: distinct (host, url, lastmod)
    across all parsed sitemaps, latest lastmod kept per url.  With
    ``enforce_same_host`` (sitemaps.org cross-submission rule), a loc
    on a different host than its sitemap is dropped.  One groupBy on
    url — the only shuffle."""
    parsed = parse_sitemaps(df, url_col, xml_col)
    if enforce_same_host:
        parsed = parsed.where(
            _host_of(F.col("loc")) == _host_of(F.col("sitemap_url")))
    return (parsed
            .groupBy(F.col("loc").alias("url"))
            .agg(F.max("lastmod").alias("lastmod"))
            .withColumn("host", _host_of(F.col("url")))
            .select("host", "url", "lastmod"))
