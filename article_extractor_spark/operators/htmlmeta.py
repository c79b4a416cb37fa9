"""HTML-head metadata directives — JVM-side, zero Python.

Two curation signals every web pipeline honors before training on a
page:

* ``<meta name="robots" content="noindex[, nofollow]">`` — the
  publisher said don't index; a compliant corpus drops the page
  (`noindex_filter`).
* ``<link rel="canonical" href=...>`` — the publisher names the
  canonical URL for duplicated content (print views, tracking-param
  variants, m.-mirrors); grouping by it is publisher-declared dedup,
  complementary to content dedup (`canonical_url`, `canonical_dedup`).

Both are bounded-prefix regexp projections over the raw html string
(whole-stage codegen; attribute order and quoting variants handled),
so the cost is one scan with no Python stage and no shuffle beyond the
canonical groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# <meta ... name="robots" ... content="..."> in either attribute order,
# any quoting, any case; the head is taken as the first 4096 chars (the
# WHATWG prescan convention core/charset.py also follows, scaled up)
_META_NAME_FIRST = (
    r'(?i)<meta\s[^>]*name\s*=\s*["\']?robots["\']?\s[^>]*'
    r'content\s*=\s*["\']?([^"\'>]*)')
# content-first order needs the quoted and unquoted forms separately: a
# single optional-quote + lazy-capture pattern truncates a multi-token
# quoted value at its first internal space
_META_CONTENT_FIRST_Q = (
    r'(?i)<meta\s[^>]*content\s*=\s*["\']([^"\'>]*)["\'][^>]*'
    r'name\s*=\s*["\']?robots["\'\s>]')
_META_CONTENT_FIRST_U = (
    r'(?i)<meta\s[^>]*content\s*=\s*([^"\'>\s]+)[^>]*'
    r'name\s*=\s*["\']?robots["\'\s>]')
_CANONICAL = (
    r'(?i)<link\s[^>]*rel\s*=\s*["\']?canonical["\']?\s[^>]*'
    r'href\s*=\s*["\']?([^"\'>\s]+)')
_CANONICAL_HREF_FIRST_Q = (
    r'(?i)<link\s[^>]*href\s*=\s*["\']([^"\'>\s]+)["\'][^>]*'
    r'rel\s*=\s*["\']?canonical["\'\s>]')
_CANONICAL_HREF_FIRST_U = (
    r'(?i)<link\s[^>]*href\s*=\s*([^"\'>\s]+)[^>]*'
    r'rel\s*=\s*["\']?canonical["\'\s>]')


def _head(html_col: str, n: int = 4096):
    return F.substring(F.col(html_col), 1, n)


def robots_directives(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds ``robots_meta`` (the raw content value, lowercased, '' when
    absent), ``noindex`` and ``nofollow`` int flags."""
    head = _head(html_col)
    content = F.lower(F.coalesce(
        F.nullif(F.regexp_extract(head, _META_NAME_FIRST, 1), F.lit("")),
        F.nullif(F.regexp_extract(head, _META_CONTENT_FIRST_Q, 1), F.lit("")),
        F.nullif(F.regexp_extract(head, _META_CONTENT_FIRST_U, 1), F.lit("")),
        F.lit("")))
    return (df.withColumn("robots_meta", content)
            .withColumn("noindex",
                        content.rlike(r"(?:^|[,\s])(?:noindex|none)(?:$|[,\s])")
                        .cast("int"))
            .withColumn("nofollow",
                        content.rlike(r"(?:^|[,\s])(?:nofollow|none)(?:$|[,\s])")
                        .cast("int")))


def noindex_filter(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Drop pages whose robots meta declares noindex (or none) — the
    compliant-corpus gate.  Pages without the tag pass."""
    flagged = robots_directives(df, html_col)
    return flagged.filter(F.col("noindex") == 0) \
        .drop("robots_meta", "noindex", "nofollow")


def canonical_url(df: DataFrame, html_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """Adds ``canonical`` — the declared canonical URL, falling back to
    the page's own url when the tag is absent (self-canonical)."""
    head = _head(html_col)
    decl = F.coalesce(
        F.nullif(F.regexp_extract(head, _CANONICAL, 1), F.lit("")),
        F.nullif(F.regexp_extract(head, _CANONICAL_HREF_FIRST_Q, 1),
                 F.lit("")),
        F.nullif(F.regexp_extract(head, _CANONICAL_HREF_FIRST_U, 1),
                 F.lit("")),
        F.col(url_col))
    return df.withColumn("canonical", decl)


def compliant_outlinks(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """Robots-compliant host edge list: pages whose robots meta declares
    ``nofollow`` (or ``none``) contribute NO outlinks — the publisher
    said their links carry no endorsement, and a compliant link graph
    (PageRank/HITS/anchor-text inputs) honors that.  Composes the frozen
    `linkgraph.extract_outlinks` behind the nofollow gate; same output
    schema (src_host, dst_host, n_links)."""
    from article_extractor_spark.operators.linkgraph import extract_outlinks

    selected = pages.select(url_col, html_col)
    if dict(selected.dtypes)[html_col] == "binary":
        # flag on a decoded view; the original binary column flows on to
        # extract_outlinks (which decodes for itself)
        flagged = robots_directives(
            selected.withColumn("__h", F.decode(F.col(html_col), "UTF-8")),
            "__h")
    else:
        flagged = robots_directives(selected, html_col)
    followable = flagged.filter(F.col("nofollow") == 0).select(
        url_col, html_col)
    return extract_outlinks(followable, url_col=url_col, html_col=html_col)


def canonical_dedup(df: DataFrame, html_col: str = "html",
                    url_col: str = "url") -> DataFrame:
    """One row per canonical URL: the member with the MINIMUM url wins
    (deterministic; swap in a quality column via the same max(struct)
    pattern).  Publisher-declared dedup — one groupBy shuffle on the
    canonical key."""
    with_c = canonical_url(df, html_col, url_col)
    cols = [c for c in with_c.columns if c != "canonical"]
    packed = with_c.select(
        "canonical",
        F.struct(F.col(url_col).alias("__rank"), *cols).alias("__row"))
    best = packed.groupBy("canonical").agg(F.min("__row").alias("__row"))
    return best.select("canonical", *[
        F.col(f"__row.{c}").alias(c) for c in cols])
