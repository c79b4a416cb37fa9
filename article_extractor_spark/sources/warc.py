"""WARC / WET source connector — the ingest format of Common-Crawl-style
corpora (the north-rule input is "Common-Crawl-style web pages"; real crawls
land as WARC segments, so the engine reads them natively).

Scale shape: WARC.gz segments are NOT splittable (gzip members), so the
standard distributed layout is one file = one task — ``binaryFile`` rows
fan out across executors and each file parses inside a single
``mapInPandas`` batch, nothing crosses the driver.  A crawl's thousands of
~1 GB segments give natural full-cluster parallelism; per-file memory is
bounded by the segment size exactly as in every production CC reader.

Record parsing follows the WARC/1.0 spec (ISO 28500): header block of
``Name: value`` lines, ``Content-Length`` octets of block, CRLF CRLF
between records.  ``response`` records carry an HTTP response whose body
is the page payload; ``conversion`` records (WET) carry extracted text.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType, TimestampType)

WARC_PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("record_type", StringType()),
    StructField("source_file", StringType()),
    StructField("record_offset", LongType()),
])


def parse_warc_records(data: bytes):
    """Yield (headers dict lower-cased, body bytes, offset) per WARC record.
    Tolerates both CRLF and LF header endings and trailing garbage."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos:pos + 2] in (b"\r\n", b"\n\n") or \
                (pos < n and data[pos:pos + 1] == b"\n"):
            pos += 2 if data[pos:pos + 2] == b"\r\n" else 1
        start = pos
        if not data[pos:pos + 5] == b"WARC/":
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep_len = 4
        # bound the LF-only probe by the CRLF hit: only an EARLIER \n\n
        # can win, and the unbounded find scanned to EOF per record —
        # O(records x segment bytes) on CRLF segments (56s for a 57k-
        # record read at sf1.0, measured)
        alt = (data.find(b"\n\n", pos) if hdr_end == -1
               else data.find(b"\n\n", pos, hdr_end + 2))
        if hdr_end == -1 or (alt != -1 and alt < hdr_end):
            hdr_end, sep_len = alt, 2
        if hdr_end == -1:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].decode("utf-8", "replace").splitlines()[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = hdr_end + sep_len
        body = data[body_start:body_start + length]
        yield headers, body, start
        pos = body_start + length


def http_payload(body: bytes) -> bytes:
    """Strip the HTTP response head from a WARC response block (payload
    starts after the first blank line); WET/conversion blocks pass
    through unchanged."""
    if body[:5] in (b"HTTP/",):
        for sep in (b"\r\n\r\n", b"\n\n"):
            i = body.find(sep)
            if i != -1:
                return body[i + len(sep):]
    return body


def _records_to_rows(name: str, data: bytes, record_types: tuple[str, ...]):
    if name.endswith(".gz") or data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # multi-member OK (CC convention)
    for headers, body, offset in parse_warc_records(data):
        rtype = headers.get("warc-type", "")
        if rtype not in record_types:
            continue
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        yield url, ts, http_payload(body), rtype, name, offset


def read_warc(spark: SparkSession, path: str,
              record_types: tuple[str, ...] = ("response",),
              num_partitions: int | None = None) -> DataFrame:
    """WARC/WET segments -> pages DataFrame (url, warc_ts, html, ...).

    ``record_types=('response',)`` for raw WARC crawl output;
    ``('conversion',)`` for WET extracted-text segments."""
    files = spark.read.format("binaryFile").load(path)
    if num_partitions:
        files = files.repartition(num_partitions, F.xxhash64("path"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "html", "record_type",
                                    "source_file", "record_offset")}
            for name, content in zip(pdf["path"], pdf["content"]):
                for url, ts, payload, rtype, src, off in _records_to_rows(
                        name, bytes(content), record_types):
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    rows["html"].append(payload)
                    rows["record_type"].append(rtype)
                    rows["source_file"].append(src)
                    rows["record_offset"].append(off)
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(
                out["warc_ts"], errors="coerce", utc=True
            ).dt.tz_localize(None)
            out["record_offset"] = out["record_offset"].astype("int64")
            yield out

    return files.select("path", "content").mapInPandas(parse, WARC_PAGES_SCHEMA)


def build_warc(records: list[tuple[str, str, bytes]],
               record_type: str = "response",
               with_http_head: bool = True) -> bytes:
    """Serialize (url, iso_ts, payload) triples into a minimal WARC/1.0
    byte stream — the test/writer twin of :func:`parse_warc_records`."""
    out = io.BytesIO()
    for url, ts, payload in records:
        if with_http_head and record_type == "response":
            body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + payload)
        else:
            body = payload
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {record_type}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(body)}\r\n"
        ).encode()
        out.write(head + b"\r\n" + body + b"\r\n\r\n")
    return out.getvalue()
