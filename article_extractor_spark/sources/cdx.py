"""CDX-J crawl-index source (the Common-Crawl index sidecar format).

A CDX-J line is ``<urlkey> <timestamp14> <json>`` — a SURT-style URL key,
a 14-digit capture timestamp, and a JSON blob with the capture metadata
(url, mime, status, digest, length, offset, filename).  The index is how
a 100 TB pipeline PLANS its WARC reads (select records by url/host/time
BEFORE touching the archives), so the connector parses it into a
DataFrame joinable against `sources/warc.py` reads.

Everything is JVM-side (`split`/`from_json`/`to_timestamp`): parsing is
a zero-shuffle projection that scales with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CDX_JSON_SCHEMA = ("url string, mime string, status string, digest string, "
                   "length string, offset string, filename string")

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def surt_key(url: Column) -> Column:
    """SURT-style URL key: lowercase host, ``www.`` stripped, labels
    reversed and comma-joined, then ``)`` and the path —
    ``https://sub.Example.com/a/b`` → ``com,example,sub)/a/b``."""
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _HOST_RE, 1)), r"^www\.", "")
    path = F.regexp_extract(url, _PATH_RE, 1)
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"[.]")), ","),
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
    )


def parse_cdx_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse CDX-J lines into typed columns.

    ``lines`` is any DataFrame with one raw line per row (e.g.
    ``spark.read.text(path)``).  Malformed lines (fewer than 3 fields or
    unparseable JSON) yield NULL metadata columns rather than failing the
    job — index files on object stores do carry truncated tails."""
    c = F.col(line_col)
    parsed = lines.select(
        F.substring_index(c, " ", 1).alias("urlkey"),
        F.try_element_at(F.split(c, " ", 3), F.lit(2)).alias("_ts14"),
        F.try_element_at(F.split(c, " ", 3), F.lit(3)).alias("_json"),
    ).select(
        "urlkey",
        F.to_timestamp(F.col("_ts14"), "yyyyMMddHHmmss").alias("capture_ts"),
        F.from_json(F.col("_json"), CDX_JSON_SCHEMA).alias("_m"),
    )
    return parsed.select(
        "urlkey", "capture_ts",
        F.col("_m.url").alias("url"),
        F.col("_m.mime").alias("mime"),
        F.col("_m.status").alias("status"),
        F.col("_m.digest").alias("digest"),
        F.col("_m.length").cast("bigint").alias("length"),
        F.col("_m.offset").cast("bigint").alias("offset"),
        F.col("_m.filename").alias("filename"),
    )


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Read CDX-J files (plain or .gz — Spark's text source decompresses
    by extension) into the parsed schema."""
    return parse_cdx_lines(spark.read.text(path), "value")
