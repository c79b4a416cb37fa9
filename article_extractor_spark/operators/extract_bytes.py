"""Raw-bytes extraction composite: charset sniff -> decode -> extract.

A real Common-Crawl payload is ``binary`` (WARC response bytes), not a
string; the registered extraction path (`operators/extract.py`) takes
``html string`` per the driver input hint.  This module supplies the
missing front step as a composition of two frozen, tested pieces —
``core.charset.decode_html_bytes`` (WHATWG-shaped sniffing, Arrow batch)
and ``operators.extract.extract_articles`` — in a NEW file so no
registered query closure changes.

Plan shape at 100 TB: the decode is one extra Arrow ``mapInPandas``
stage fused ahead of the extraction ``mapInArrow`` on the same
partitioning (no exchange between them: decode is a narrow map, and
``extract_articles`` applies its own hash repartition when asked), so
the cost over string input is one UTF-8 re-encode per page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from article_extractor_spark.core.charset import decode_html_bytes
from article_extractor_spark.operators.extract import extract_articles


def extract_articles_from_bytes(
    pages_bin: DataFrame,
    body_col: str = "body",
    content_type_col: str | None = None,
    config_broadcast=None,
    num_partitions: int | None = None,
    salt_buckets: int = 0,
) -> DataFrame:
    """pages(url, <body_col> binary, [content-type], ...) -> articles.

    Output schema == ``extract_articles``'s (url, title, author, date,
    thumbnail_url, text, part_id, batch_elapsed_ms).  Encoding per page
    follows the WHATWG order BOM > transport header > bounded meta
    prescan > windows-1252; undecodable bytes become U+FFFD rather than
    failing the partition."""
    decoded = decode_html_bytes(
        pages_bin, body_col=body_col,
        content_type_col=content_type_col, out_col="html")
    return extract_articles(
        decoded.select("url", "html"),
        config_broadcast=config_broadcast,
        num_partitions=num_partitions,
        salt_buckets=salt_buckets,
    )
