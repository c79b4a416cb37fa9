"""CDX-J index WRITER — the sidecar a crawl publishes next to its WARCs.

`sources/cdx.py` reads the Common-Crawl index format; this produces it
from the engine's own WARC reads, closing the index loop: write WARC
segments (`build_warc`/crawler), index them here, and a later 100 TB
job plans its record reads from the index without touching the
archives.  Line format mirrors the reader exactly (``<urlkey>
<timestamp14> <json>``), built entirely JVM-side — surt key (reused
from the frozen reader module), ``date_format`` timestamp,
``to_json(struct(...))`` blob with url/digest/length/offset/filename —
then written as text files partitioned however the caller arranged the
rows.  Round-trip parity with `read_cdx` is pinned by
tests/test_cdx_sink.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdx_lines(pages: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts", payload_col: str = "html",
              file_col: str = "source_file",
              offset_col: str = "record_offset",
              status_col: str | None = None,
              mime_col: str | None = None) -> DataFrame:
    """pages (read_warc shape) -> one ``value: string`` CDX-J line per
    record: surt urlkey, 14-digit timestamp, JSON blob with url, md5
    digest + length of the payload, archive filename and record offset.

    ``status_col``/``mime_col`` name real columns when the input carries
    them (the `read_warc_http` shape: 'status', 'content_type') — index
    consumers select records by them, so stamping literals onto an
    unfiltered mixed frame would misplan reads; the literal defaults are
    only right for already-gated text/html frames.

    Line-format safety: records with a NULL url are dropped (nothing to
    key); NULL timestamps emit the epoch stamp rather than letting
    ``concat_ws`` silently skip the field and shift the space-delimited
    columns; spaces inside the urlkey (unescaped-space URLs) are
    percent-escaped so the key stays one token."""
    from article_extractor_spark.sources.cdx import surt_key

    status = (F.col(status_col).cast("string") if status_col
              else F.lit("200"))
    mime = F.col(mime_col) if mime_col else F.lit("text/html")
    blob = F.to_json(F.struct(
        F.col(url_col).alias("url"),
        mime.alias("mime"),
        status.alias("status"),
        F.md5(F.col(payload_col)).alias("digest"),
        F.octet_length(F.col(payload_col)).cast("string").alias("length"),
        F.col(offset_col).cast("string").alias("offset"),
        F.element_at(F.split(F.col(file_col), "/"), -1).alias("filename"),
    ))
    key = F.regexp_replace(surt_key(F.col(url_col)), " ", "%20")
    ts14 = F.coalesce(F.date_format(F.col(ts_col), "yyyyMMddHHmmss"),
                      F.lit("19700101000000"))
    return (pages.where(F.col(url_col).isNotNull())
            .select(F.concat_ws(" ", key, ts14, blob).alias("value")))


def write_cdx(pages: DataFrame, directory: str, **cols) -> None:
    """Write the index as text part-files under ``directory`` (readable
    back with ``read_cdx``).  Partitioning = the input's."""
    cdx_lines(pages, **cols).write.mode("overwrite").text(directory)
