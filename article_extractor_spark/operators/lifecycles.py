"""The reference's remaining public lifecycles as Spark operators
(SURVEY.md §3): standalone readability, RSS-fragment cleanup, thumbnail-only
extraction, and multi-page article assembly.

Each is the same Arrow-batched pattern as ``operators/extract.py``; the
multi-page variant uses ``applyInPandas`` (grouped semantics: all pages of
one article must meet in one UDF call, exactly ``parse_offline``'s
``Vec<String>`` input, `/root/reference/src/full_text_parser/mod.rs:30-83`)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType)

READABILITY_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("text", StringType()),
])

CLEANED_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("html", StringType()),
    StructField("thumbnail_url", StringType()),
])

THUMBNAIL_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("thumbnail_url", StringType()),
])

MULTIPAGE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("n_pages", LongType()),
    StructField("title", StringType()),
    StructField("author", StringType()),
    StructField("date", TimestampType()),
    StructField("thumbnail_url", StringType()),
    StructField("text", StringType()),
])


def _to_str(html) -> str | None:
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        return bytes(html).decode("utf-8", "replace")
    return html


def readability_extract(pages: DataFrame) -> DataFrame:
    """`Readability::extract` (readability/mod.rs:25-57): scoring-only path,
    no site configs needed (nothing broadcast)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from article_extractor_spark.core.readability import extract as rd_extract
        from article_extractor_spark.core.urlutil import Url, UrlError

        for pdf in batches:
            out = {"url": pdf["url"].tolist(), "text": []}
            for url_s, html in zip(out["url"], pdf["html"].tolist()):
                html = _to_str(html)
                try:
                    u = Url.parse(url_s)
                except UrlError:
                    u = None
                try:
                    out["text"].append(rd_extract(html, u) if html else None)
                except Exception:
                    out["text"].append(None)
            yield pd.DataFrame(out)

    return pages.select("url", "html").mapInPandas(fn, READABILITY_SCHEMA)


def clean_fragments(df: DataFrame, html_col: str = "html",
                    url_col: str = "url") -> DataFrame:
    """`clean::clean_html_fragment` (clean.rs:35-69) over a fragment column
    (feed-item sanitization)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from article_extractor_spark.core.pipeline import clean_html_fragment

        for pdf in batches:
            urls = pdf[url_col].tolist()
            out = {"url": urls, "html": [], "thumbnail_url": []}
            for url_s, html in zip(urls, pdf[html_col].tolist()):
                html = _to_str(html)
                try:
                    res = clean_html_fragment(html or "", url_s)
                    out["html"].append(res.html)
                    out["thumbnail_url"].append(res.thumbnail)
                except Exception:
                    out["html"].append(None)
                    out["thumbnail_url"].append(None)
            yield pd.DataFrame(out)

    return df.select(F.col(url_col).alias("url"), F.col(html_col)).mapInPandas(
        fn, CLEANED_SCHEMA)


def thumbnails_only(pages: DataFrame) -> DataFrame:
    """`FullTextParser::thumbnail_from_html` (mod.rs:249-256)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from article_extractor_spark.core.dom import parse_html
        from article_extractor_spark.core.fulltext import check_for_thumbnail
        from article_extractor_spark.core.xpath import Context

        for pdf in batches:
            out = {"url": pdf["url"].tolist(), "thumbnail_url": []}
            for html in pdf["html"].tolist():
                html = _to_str(html)
                try:
                    thumb = (check_for_thumbnail(Context(parse_html(html)))
                             if html else None)
                except Exception:
                    thumb = None
                out["thumbnail_url"].append(thumb)
            yield pd.DataFrame(out)

    return pages.select("url", "html").mapInPandas(fn, THUMBNAIL_SCHEMA)


def extract_multipage(pages: DataFrame, config_broadcast=None,
                      url_col: str = "article_url",
                      page_no_col: str = "page_no") -> DataFrame:
    """Multi-page article assembly: rows (article_url, page_no, html) are
    grouped per article and fed to ``parse_offline`` as an ordered page
    list (first page wins metadata; each page contributes body).  Grouped
    ``applyInPandas`` — the shuffle key IS the article url."""
    from article_extractor_spark.operators.extract import broadcast_configs

    spark = pages.sparkSession
    if config_broadcast is None:
        config_broadcast = broadcast_configs(spark)
    entries = config_broadcast

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from article_extractor_spark.core.urlutil import Url, UrlError
        from article_extractor_spark.operators.extract import _get_worker_parser

        parser = _get_worker_parser(entries.value)
        pdf = pdf.sort_values(page_no_col)
        url_s = pdf[url_col].iloc[0]
        htmls = [_to_str(h) for h in pdf["html"].tolist() if h is not None]
        try:
            u = Url.parse(url_s)
        except UrlError:
            u = None
        row = {
            "url": url_s, "n_pages": len(htmls), "title": None,
            "author": None, "date": None, "thumbnail_url": None, "text": None,
        }
        try:
            art = parser.parse_offline(htmls, url=u)
            row.update(
                title=art.title, author=art.author,
                date=(art.date.replace(tzinfo=None) if art.date else None),
                thumbnail_url=art.thumbnail_url, text=art.html,
            )
        except Exception:
            pass
        out = pd.DataFrame([row])
        out["date"] = pd.to_datetime(out["date"], errors="coerce")
        return out

    return (
        pages.select(url_col, page_no_col, "html")
        .groupBy(url_col)
        .applyInPandas(fn, MULTIPAGE_SCHEMA)
    )
