"""WARC/WET source connector: round-trip build_warc -> read_warc through
Spark, gzip (multi-member) handling, record-type filtering, and an
end-to-end WARC -> extraction run."""

import gzip

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-warc-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


PAGES = [
    ("https://a.example.com/1", "2024-01-01T00:00:01Z",
     b"<html><body><p>alpha page</p></body></html>"),
    ("https://b.example.com/2", "2024-01-01T00:00:02Z",
     b"<html><body><p>beta page</p></body></html>"),
    ("https://c.example.com/3", "2024-01-01T00:00:03Z",
     b"<html><body><p>gamma page</p></body></html>"),
]


def test_warc_roundtrip_plain_and_gzip(spark, tmp_path):
    from article_extractor_spark.sources.warc import build_warc, read_warc

    raw = build_warc(PAGES)
    (tmp_path / "seg-00000.warc").write_bytes(raw)
    # multi-member gzip, one member per record (the Common-Crawl layout)
    from article_extractor_spark.sources.warc import build_warc as bw
    members = b"".join(gzip.compress(bw([p])) for p in PAGES)
    (tmp_path / "seg-00001.warc.gz").write_bytes(members)

    got = read_warc(spark, str(tmp_path)).collect()
    assert len(got) == 6
    by_file = {}
    for r in got:
        by_file.setdefault(r["source_file"].rsplit("/", 1)[-1], []).append(r)
    for rows in by_file.values():
        rows = sorted(rows, key=lambda r: r["url"])
        assert [r["url"] for r in rows] == [p[0] for p in PAGES]
        for r, (url, ts, payload) in zip(rows, PAGES):
            assert bytes(r["html"]) == payload      # HTTP head stripped
            assert r["record_type"] == "response"
            assert r["warc_ts"].isoformat().startswith("2024-01-01T00:00:0")


def test_warc_record_type_filter_and_wet(spark, tmp_path):
    from article_extractor_spark.sources.warc import build_warc, read_warc

    wet = build_warc([(u, ts, b"extracted text " + b) for u, ts, b in PAGES],
                     record_type="conversion", with_http_head=False)
    mixed = build_warc(PAGES) + wet
    (tmp_path / "seg.warc").write_bytes(mixed)

    resp = read_warc(spark, str(tmp_path), record_types=("response",))
    conv = read_warc(spark, str(tmp_path), record_types=("conversion",))
    assert resp.count() == 3 and conv.count() == 3
    assert all(bytes(r["html"]).startswith(b"extracted text")
               for r in conv.collect())


def test_warc_to_extraction_end_to_end(spark, tmp_path):
    """WARC segment -> read_warc -> extract_articles: the full ingest
    path a Common-Crawl job runs."""
    from article_extractor_spark.operators.extract import extract_articles
    from article_extractor_spark.sources.warc import build_warc, read_warc

    html = (b"<!DOCTYPE html><html><head><title>WARC Doc - T</title></head>"
            b"<body><div id='content'><h1>H</h1>" +
            b"<p>Body sentence with plenty of readable words, and commas, "
            b"for scoring purposes in the readability pass.</p>" * 6 +
            b"</div></body></html>")
    warc = build_warc([("https://warc.example.com/art", "2024-01-01T00:00:01Z",
                        html)])
    (tmp_path / "seg.warc").write_bytes(warc)

    pages = read_warc(spark, str(tmp_path))
    arts = extract_articles(pages).collect()
    assert len(arts) == 1
    assert arts[0]["title"] == "WARC Doc"
    assert "readable words" in arts[0]["text"]
