"""WARC-with-HTTP-head reader: status/Content-Type extraction, the
status gate, and header-charset precedence through extraction."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-warc-http-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def http_block(status, ctype, payload: bytes,
               reason: str = "Whatever") -> bytes:
    return (f"HTTP/1.1 {status} {reason}\r\nServer: t\r\n"
            f"Content-Type: {ctype}\r\n\r\n").encode() + payload


def warc_bytes(records):
    """records: (url, body bytes) — raw WARC with pre-built bodies."""
    out = bytearray()
    for url, body in records:
        head = (f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
                f"Content-Length: {len(body)}\r\n").encode()
        out += head + b"\r\n" + body + b"\r\n\r\n"
    return bytes(out)


def test_split_http_head():
    from article_extractor_spark.sources.warc_http import split_http_head

    s, c, p = split_http_head(http_block(200, "text/html; charset=utf-8",
                                         b"<html>x</html>"))
    assert (s, c, p) == (200, "text/html; charset=utf-8", b"<html>x</html>")
    s, c, p = split_http_head(b"no http head here")
    assert (s, c) == (None, None) and p == b"no http head here"


def test_reader_and_status_gate(spark, tmp_path):
    from article_extractor_spark.sources.warc_http import (ok_responses,
                                                           read_warc_http)

    records = [
        ("http://h.test/ok", http_block(200, "text/html", b"<html>ok</html>")),
        ("http://h.test/gone", http_block(404, "text/html",
                                          b"<html>nope</html>")),
        ("http://h.test/moved", http_block(301, "text/html", b"")),
        ("http://h.test/raw", b"<html>headless</html>"),
    ]
    seg = tmp_path / "s.warc"
    seg.write_bytes(warc_bytes(records))
    pages = read_warc_http(spark, str(seg))
    got = {r["url"]: (r["status"], r["content_type"])
           for r in pages.collect()}
    assert got["http://h.test/ok"] == (200, "text/html")
    assert got["http://h.test/gone"][0] == 404
    assert got["http://h.test/raw"] == (None, None)
    kept = {r["url"] for r in ok_responses(pages).collect()}
    assert kept == {"http://h.test/ok", "http://h.test/raw"}


def test_header_charset_beats_meta(spark, tmp_path):
    """WHATWG precedence end-to-end: a cp1252 body whose META lies
    (claims utf-8) but whose HTTP header tells the truth decodes
    correctly ONLY when the header reaches the charset sniffer."""
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)
    from article_extractor_spark.sources.warc_http import read_warc_http

    body_text = "café ’curly’ words " * 40
    html = ("<html><head><meta charset=\"utf-8\"><title>T</title></head>"
            f"<body><article><p>{body_text}</p><p>{body_text}</p>"
            "</article></body></html>").encode("cp1252")
    records = [("http://c.test/p",
                http_block(200, "text/html; charset=windows-1252", html))]
    seg = tmp_path / "s.warc"
    seg.write_bytes(warc_bytes(records))
    pages = read_warc_http(spark, str(seg))

    with_header = extract_articles_from_bytes(
        pages, body_col="html",
        content_type_col="content_type").collect()[0]["text"]
    assert "café" in with_header and "’curly’" in with_header

    without_header = extract_articles_from_bytes(
        pages, body_col="html").collect()[0]["text"]
    # the lying meta wins without the header: mojibake
    assert "café" not in without_header


def test_bare_lf_head_with_crlf_in_payload():
    """An LF-terminated HTTP head followed by a payload containing
    \r\n\r\n must split at the FIRST separator (the LF-LF), not deep
    inside the payload."""
    from article_extractor_spark.sources.warc_http import split_http_head

    payload = b"<html><body>pre\r\n\r\npost</body></html>"
    body = (b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n") + payload
    s, c, p = split_http_head(body)
    assert (s, c) == (200, "text/html")
    assert p == payload
