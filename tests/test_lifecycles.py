"""Spark lifecycle operators: readability-only, fragment cleanup,
thumbnail-only, multi-page assembly, sinks, skew salting."""

import os

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tests.conftest import read_fixture


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-lifecycle-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_readability_extract_matches_core(spark):
    from article_extractor_spark.core import readability as core_rd
    from article_extractor_spark.core.urlutil import Url
    from article_extractor_spark.operators.lifecycles import readability_extract

    src = read_fixture("readability", "001", "source.html")
    pages = spark.createDataFrame(
        [("http://fakehost/test/base/", bytearray(src.encode()))],
        "url string, html binary")
    row = readability_extract(pages).collect()[0]
    expected = core_rd.extract(src, Url.parse("http://fakehost/test/base/"))
    assert row["text"] == expected


def test_clean_fragments(spark):
    from article_extractor_spark.operators.lifecycles import clean_fragments

    df = spark.createDataFrame(
        [("https://example.com/post/",
          '<p>Hello <a href="/x">link</a></p><img src="a.jpg">')],
        "url string, html string")
    row = clean_fragments(df).collect()[0]
    assert 'href="https://example.com/x"' in row["html"]
    assert row["html"].startswith("<body>")


def test_thumbnails_only(spark):
    from article_extractor_spark.operators.lifecycles import thumbnails_only

    html = b'<html><head><meta name="og:image" content="https://i.example/x.jpg"/></head><body><p>t</p></body></html>'
    pages = spark.createDataFrame(
        [("https://a.example/1", bytearray(html)),
         ("https://a.example/2", bytearray(b"<p>no thumb</p>"))],
        "url string, html binary")
    rows = {r["url"]: r["thumbnail_url"] for r in thumbnails_only(pages).collect()}
    assert rows["https://a.example/1"] == "https://i.example/x.jpg"
    assert rows["https://a.example/2"] is None


def test_multipage_assembly(spark):
    from article_extractor_spark.operators.lifecycles import extract_multipage

    p1 = ('<html><head><title>Two Pager</title></head><body><div id="c">'
          + "<p>First page paragraph, with commas, etc. %s</p>" % ("x" * 200)
          + "</body></html>")
    p2 = ('<html><head><title>WRONG TITLE</title></head><body><div id="c">'
          + "<p>Second page paragraph, also long enough. %s</p>" % ("y" * 200)
          + "</body></html>")
    df = spark.createDataFrame(
        [("https://ex.com/art", 1, bytearray(p1.encode())),
         ("https://ex.com/art", 2, bytearray(p2.encode()))],
        "article_url string, page_no int, html binary")
    rows = extract_multipage(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_pages"] == 2
    assert r["title"] == "Two Pager"      # first page wins metadata
    assert "First page paragraph" in r["text"]
    assert "Second page paragraph" in r["text"]  # both bodies concatenated


def test_save_html_files(spark, tmp_path):
    from article_extractor_spark.sources.sinks import save_html_files

    df = spark.createDataFrame(
        [("A/B Title", "<article><p>x</p></article>"),
         (None, "<article><p>y</p></article>")],
        "title string, text string")
    n = save_html_files(df, str(tmp_path))
    assert n == 2
    assert sorted(os.listdir(tmp_path)) == ["A_B Title.html", "Unknown Title.html"]


def test_save_html_files_distributed(spark, tmp_path):
    """Executor-side writer produces the same files as the driver-side
    one (local[N] shares the filesystem, like a DFS on a cluster)."""
    from article_extractor_spark.sources.sinks import (
        save_html_files, save_html_files_distributed)

    rows = [(f"Doc {i}", f"<article><p>body {i}</p></article>")
            for i in range(20)] + [(None, "<article>untitled</article>"),
                                   ("Skipped", None)]
    df = spark.createDataFrame(rows, "title string, text string")
    a = tmp_path / "driver"
    b = tmp_path / "exec"
    n1 = save_html_files(df, str(a))
    n2 = save_html_files_distributed(df.repartition(4), str(b))
    assert n1 == n2 == 21
    assert sorted(os.listdir(a)) == sorted(os.listdir(b))
    for name in os.listdir(a):
        assert (a / name).read_text() == (b / name).read_text()


def test_salted_repartition_spreads_skew(spark):
    from article_extractor_spark.operators.extract import extract_articles

    # one mega-url re-crawled 64 times (distinct warc_ts, the input_hint
    # schema): without salt all rows land in one partition; the
    # DATA-DERIVED salt (url, warc_ts) spreads them deterministically.
    # NB: byte-identical rows (same url AND same ts) intentionally stay
    # together — a deterministic salt cannot and should not split them
    # (exact dups are dedup's job; rand() salts corrupt on task retry).
    import datetime

    html = b"<html><body><p>tiny</p></body></html>"
    base = datetime.datetime(2026, 1, 1)
    rows = [("https://hot.example.com/a", base + datetime.timedelta(hours=i),
             bytearray(html)) for i in range(64)]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")
    salted = extract_articles(pages, num_partitions=8, salt_buckets=8)
    parts = salted.select("part_id").distinct().count()
    assert parts >= 4  # skewed key spread across partitions

    unsalted = extract_articles(pages, num_partitions=8)
    assert unsalted.select("part_id").distinct().count() == 1


def test_build_session_confs():
    from article_extractor_spark.session import EXTRACTION_CONF

    assert "spark.sql.execution.arrow.maxRecordsPerBatch" in EXTRACTION_CONF
    assert EXTRACTION_CONF["spark.sql.adaptive.enabled"] == "true"
