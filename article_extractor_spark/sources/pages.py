"""Common-Crawl-style pages table (the engine's primary input).

Schema per ``BASELINE.json input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Two constructors:

* :func:`synthesize_pages` — deterministic synthetic pages derived from the
  driver's ``documents`` table entirely with JVM-side expressions (no Python
  UDF, no driver loop; scales to any SF because generation is per-row
  and partition-parallel).
* :func:`fixture_pages` — one row per golden fixture (small; driver-side
  read, used for byte-parity checks through the Spark path).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def synthesize_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pages table derived from ``{sf_dir}/documents.parquet``.

    The HTML template intentionally exercises both extraction paths:
    boilerplate chrome (nav/header/footer/comments/sidebar) that readability
    must strip, an article body whose length varies with ``doc_id`` (some
    rows fall under the 500-char threshold to exercise the retry loop), and
    relative links/images to exercise URL repair.
    """
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    body_text = F.coalesce(F.col("text"), F.lit(""))
    # paragraph multiplier 1..4 as a deterministic function of doc_id
    rep = (F.col("doc_id") % 4 + 1).cast("int")
    para = F.concat(F.lit("<p>"), body_text, F.lit(", extended run.</p>\n"))
    paragraphs = F.concat(
        F.lit('<h2>Section one</h2>\n'),
        F.expr("repeat(concat('<p>', coalesce(text, ''), ', extended run.</p>\\n'), int(doc_id % 4 + 1))"),
        F.lit('<p>Closing remarks, with commas, and more text to score.</p>\n'),
    )
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" - Synthetic News</title>"
              '<meta name="og:image" content="https://img.example.com/photo-'),
        F.col("doc_id").cast("string"),
        F.lit('.jpg"/></head><body>'
              '<nav class="menu sidebar"><a href="/home">home</a>'
              "<a href=\"/about\">about</a></nav>"
              '<header class="banner header">Synthetic News Network</header>'
              '<div id="content" class="article main">'
              "<h1>Headline "),
        F.col("doc_id").cast("string"),
        F.lit("</h1>\n"),
        paragraphs,
        F.lit('<p>Related reading: <a href="story-'),
        F.col("doc_id").cast("string"),
        F.lit('.html">a relative link</a> and <img src="img/'),
        F.col("doc_id").cast("string"),
        F.lit('.png"/> inline.</p></div>'
              '<div class="comments disqus"><p>first!</p><p>nice post</p></div>'
              '<footer class="footer">(c) synthetic</footer>'
              "</body></html>"),
    )
    url = F.concat(
        F.lit("https://"),
        F.coalesce(F.col("source"), F.lit("src0")),
        F.lit(".example.com/articles/"),
        F.col("doc_id").cast("string"),
    )
    return docs.select(
        url.alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        body_text.alias("text"),
        F.coalesce(F.col("lang"), F.lit("en")).alias("lang"),
    )


def synthesize_page_py(doc_id: int, text: str | None, source: str | None) -> tuple[str, str]:
    """Pure-Python twin of :func:`synthesize_pages`' JVM template — returns
    ``(url, html)`` byte-identical to the Spark expressions (pinned by
    ``test_pages_python_twin``).  Lets driver-side code (the
    ``extract_fulltext`` oracle builder) reproduce any page without a
    SparkSession, so the DuckDB oracle can embed expected extraction
    output computed by the pure-Python core."""
    body = text if text is not None else ""
    rep = int(doc_id) % 4 + 1
    did = str(int(doc_id))
    paragraphs = (
        "<h2>Section one</h2>\n"
        + ("<p>" + body + ", extended run.</p>\n") * rep
        + "<p>Closing remarks, with commas, and more text to score.</p>\n"
    )
    html = (
        "<!DOCTYPE html><html><head><title>Doc " + did
        + " - Synthetic News</title>"
        + '<meta name="og:image" content="https://img.example.com/photo-'
        + did + '.jpg"/></head><body>'
        + '<nav class="menu sidebar"><a href="/home">home</a>'
        + '<a href="/about">about</a></nav>'
        + '<header class="banner header">Synthetic News Network</header>'
        + '<div id="content" class="article main">'
        + "<h1>Headline " + did + "</h1>\n"
        + paragraphs
        + '<p>Related reading: <a href="story-' + did
        + '.html">a relative link</a> and <img src="img/' + did
        + '.png"/> inline.</p></div>'
        + '<div class="comments disqus"><p>first!</p><p>nice post</p></div>'
        + '<footer class="footer">(c) synthetic</footer>'
        + "</body></html>"
    )
    url = "https://" + (source or "src0") + ".example.com/articles/" + did
    return url, html


def fixture_pages(spark: SparkSession, fixture_dir: str | None = None) -> DataFrame:
    """One row per readability golden fixture (url = the reference's fake
    base URL + fixture name so rows stay distinct)."""
    if fixture_dir is None:
        fixture_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "tests", "fixtures", "readability",
        )
    rows = []
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    for name in sorted(os.listdir(fixture_dir)):
        src_path = os.path.join(fixture_dir, name, "source.html")
        if not os.path.isfile(src_path):
            continue
        with open(src_path, "rb") as f:
            html = f.read()
        rows.append((f"http://fakehost/test/{name}/", ts, html, "", "en"))
    return spark.createDataFrame(rows, PAGES_SCHEMA)
