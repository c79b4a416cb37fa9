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


def test_cdx_parse_and_surt(spark):
    """CDX-J lines parse to typed fields; malformed lines yield NULL
    metadata instead of failing; SURT keys strip www. and reverse
    labels; gz files read transparently."""
    import gzip
    import tempfile

    from pyspark.sql import functions as F

    from article_extractor_spark.sources.cdx import (parse_cdx_lines,
                                                     read_cdx, surt_key)

    good = ('com,example,sub)/a/b 20240102030405 '
            '{"url": "https://sub.example.com/a/b", "mime": "text/html", '
            '"status": "200", "digest": "d1", "length": "123", '
            '"offset": "456", "filename": "f.warc.gz"}')
    lines = spark.createDataFrame(
        [(good,), ("truncated-line-no-fields",)], "value string")
    rows = parse_cdx_lines(lines).collect()
    ok = [r for r in rows if r["urlkey"] == "com,example,sub)/a/b"][0]
    assert str(ok["capture_ts"]).startswith("2024-01-02 03:04:05")
    assert ok["url"] == "https://sub.example.com/a/b"
    assert ok["length"] == 123 and ok["offset"] == 456
    bad = [r for r in rows if r["urlkey"] != "com,example,sub)/a/b"][0]
    assert bad["url"] is None and bad["capture_ts"] is None

    surt = spark.createDataFrame(
        [("https://www.Example.COM/x?q=1",), ("https://a.b.c.org",)],
        "url string").select(surt_key(F.col("url")).alias("k")).collect()
    assert surt[0]["k"] == "com,example)/x"
    assert surt[1]["k"] == "org,c,b,a)/"

    with tempfile.TemporaryDirectory() as d:
        with gzip.open(f"{d}/part.cdx.gz", "wt") as f:
            f.write(good + "\n")
        assert read_cdx(spark, d).count() == 1


def test_cdx_plans_warc_read(spark, tmp_path):
    """Index-driven archive selection (the 100 TB read-planning path):
    build a WARC + its CDX-J index, select urls from the INDEX only,
    then semi-join the WARC read on the selected urls — extracted
    records equal the index plan exactly."""
    import json

    from pyspark.sql import functions as F

    from article_extractor_spark.sources.cdx import (parse_cdx_lines,
                                                     surt_key)
    from article_extractor_spark.sources.warc import build_warc, read_warc

    (tmp_path / "seg-00000.warc").write_bytes(build_warc(PAGES))
    cdx_lines = []
    for url, ts, payload in PAGES:
        key_row = spark.range(1).select(
            surt_key(F.lit(url)).alias("k")).collect()[0]
        meta = {"url": url, "mime": "text/html", "status": "200",
                "digest": "d", "length": str(len(payload)),
                "offset": "0", "filename": "seg-00000.warc"}
        ts14 = ts.replace("-", "").replace(":", "")[:14].replace("T", "")
        cdx_lines.append(f"{key_row['k']} {ts14} {json.dumps(meta)}")
    idx = parse_cdx_lines(
        spark.createDataFrame([(l,) for l in cdx_lines], "value string"))

    # plan from the index alone: hosts a/b only, via the SURT key prefix
    plan = idx.where(F.col("urlkey").rlike("^com,example,[ab]\\)")) \
              .select("url")
    got = (read_warc(spark, str(tmp_path))
           .join(plan, "url", "left_semi").collect())
    assert sorted(r["url"] for r in got) == [
        "https://a.example.com/1", "https://b.example.com/2"]


def test_parse_warc_header_terminator_precedence():
    """r6 perf fix regression pin: the LF-only header-terminator probe is
    bounded by the CRLF match, and every terminator combination still
    parses identically — CRLF-only records (no \\n\\n anywhere), LF-only
    records, and a mixed stream where an EARLIER \\n\\n must beat a later
    CRLFCRLF."""
    from article_extractor_spark.sources.warc import parse_warc_records

    def rec(url, body, sep, line_end):
        head = (f"WARC/1.0{line_end}WARC-Type: response{line_end}"
                f"WARC-Target-URI: {url}{line_end}"
                f"Content-Length: {len(body)}{line_end}").encode()
        return head + sep + body + b"\r\n\r\n"

    # CRLF-only stream (the O(records x bytes) case before the fix)
    crlf = b"".join(rec(f"http://a.test/{i}", b"B%d" % i, b"\r\n", "\r\n")
                    for i in range(50))
    got = list(parse_warc_records(crlf))
    assert len(got) == 50
    assert all(body == b"B%d" % i for i, (_, body, _) in enumerate(got))

    # LF-only headers still parse (the hdr_end == -1 fallback)
    lf = rec("http://a.test/lf", b"LFBODY", b"\n", "\n")
    (h, body, off), = list(parse_warc_records(lf))
    assert h["warc-target-uri"] == "http://a.test/lf" and body == b"LFBODY"

    # an \n\n INSIDE the header region (earlier than the CRLFCRLF) wins,
    # exactly as before the bounded probe: build a record whose header
    # lines end in LF but whose body begins with \r\n\r\n noise
    tricky = (b"WARC/1.0\nWARC-Type: response\n"
              b"WARC-Target-URI: http://a.test/t\n"
              b"Content-Length: 4\n\n" + b"XYZW" + b"\r\n\r\n")
    (h2, body2, _), = list(parse_warc_records(tricky))
    assert body2 == b"XYZW"
