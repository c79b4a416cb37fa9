"""WARC reading WITH the HTTP response head — status + Content-Type.

`sources/warc.py::read_warc` strips the HTTP head (`http_payload`) and
keeps only the payload; real pipelines need two things it discards:

* the STATUS CODE — a compliant corpus keeps 200s and drops 404/410
  soft-error pages and 3xx bodies;
* the transport ``Content-Type`` charset, which the WHATWG encoding
  precedence ranks ABOVE the in-document meta tag (`core/charset.py`
  implements that order but the plain reader can never supply the
  header).

This module composes the frozen low-level pieces (`parse_warc_records`,
the same binaryFile layout) in a NEW file, emitting
(url, warc_ts, status, content_type, html binary, ...) so
``extract_articles_from_bytes(..., content_type_col='content_type')``
honors the header charset end-to-end.
"""

from __future__ import annotations

import gzip
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                               StringType, StructField, StructType,
                               TimestampType)

WARC_HTTP_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("status", IntegerType()),
    StructField("content_type", StringType()),
    StructField("html", BinaryType()),
    StructField("source_file", StringType()),
    StructField("record_offset", LongType()),
])


def split_http_head(body: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, payload).  Non-HTTP blocks (WET) come back
    as (None, None, body)."""
    if body[:5] != b"HTTP/":
        return None, None, body
    # take whichever separator occurs FIRST: a bare-LF head followed by
    # a payload containing \r\n\r\n must split at the LF-LF, not deep
    # inside the payload (the parse_warc_records convention)
    crlf = body.find(b"\r\n\r\n")
    lf = body.find(b"\n\n")
    candidates = [(i, sep) for i, sep in
                  ((crlf, b"\r\n\r\n"), (lf, b"\n\n")) if i != -1]
    if not candidates:
        return None, None, body
    i, sep = min(candidates)
    head, payload = body[:i], body[i + len(sep):]
    lines = head.decode("latin-1").splitlines()
    status = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            if k.strip().lower() == "content-type":
                ctype = v.strip()
                break
    return status, ctype, payload


def read_warc_http(spark: SparkSession, path: str,
                   num_partitions: int | None = None) -> DataFrame:
    """WARC response segments -> (url, warc_ts, status, content_type,
    html binary, source_file, record_offset)."""
    from article_extractor_spark.sources.warc import parse_warc_records

    files = spark.read.format("binaryFile").load(path)
    if num_partitions:
        files = files.repartition(num_partitions, F.xxhash64("path"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "status",
                                    "content_type", "html",
                                    "source_file", "record_offset")}
            for name, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if name.endswith(".gz") or data[:2] == b"\x1f\x8b":
                    data = gzip.decompress(data)
                for headers, body, offset in parse_warc_records(data):
                    if headers.get("warc-type", "") != "response":
                        continue
                    status, ctype, payload = split_http_head(body)
                    rows["url"].append(headers.get("warc-target-uri"))
                    rows["warc_ts"].append(headers.get("warc-date"))
                    rows["status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["html"].append(payload)
                    rows["source_file"].append(name)
                    rows["record_offset"].append(offset)
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(
                out["warc_ts"], errors="coerce", utc=True
            ).dt.tz_localize(None)
            out["status"] = out["status"].astype("Int32")
            out["record_offset"] = out["record_offset"].astype("int64")
            yield out

    return files.select("path", "content").mapInPandas(
        parse, WARC_HTTP_SCHEMA)


def ok_responses(pages: DataFrame) -> DataFrame:
    """Keep HTTP 200s (and headless records, e.g. synthesized fixtures
    without an HTTP head) — the compliant-corpus status gate."""
    return pages.filter(F.col("status").isNull() | (F.col("status") == 200))
