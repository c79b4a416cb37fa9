"""Structured Streaming ingest of raw WARC segments.

The incremental twin of ``scripts/run_warc_job.py``: a crawl drops
``.warc`` segments into a directory continuously; this watches the
directory with a files-source ``readStream`` (format ``binaryFile`` —
one file per row, exactly the batch reader's distributed layout), parses
records and runs the fused charset+extraction per micro-batch with the
SAME batch functions (stateless per row, so any trigger composes), and
appends to a parquet articles table with Spark's checkpointLocation for
exactly-once file-sink semantics.  A kill-and-restart replays nothing
and loses nothing — pinned by tests/test_streaming_warc.py, the
dedup_stream/extract_stream posture.

100 TB shape: identical to the batch job per micro-batch; state is only
the file-source log (files seen), no watermark needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_warc_stream(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int = 8) -> DataFrame:
    """Streaming (url, warc_ts, html binary, ...) rows from a watched
    directory of WARC segments — the batch ``read_warc`` parse applied
    per micro-batch."""
    from article_extractor_spark.sources.warc import WARC_PAGES_SCHEMA

    files = (spark.readStream.format("binaryFile")
             # the binaryFile source's fixed schema, required explicitly
             # for streaming sources
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary")
             .option("maxFilesPerTrigger", max_files_per_trigger)
             .option("pathGlobFilter", "*.warc*")
             .load(input_dir))
    # This mirrors read_warc's internal parse closure rather than
    # sharing it: the batch module sits inside registered driver-query
    # closures this round, so restructuring it to expose the closure
    # would invalidate their verification hashes.  Sync is guarded by
    # tests/test_streaming_warc.py's batch-parity assertion (identical
    # segments must extract to identical text through both paths).
    import pandas as pd
    from typing import Iterator

    from article_extractor_spark.sources.warc import _records_to_rows

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "html", "record_type",
                                    "source_file", "record_offset")}
            for name, content in zip(pdf["path"], pdf["content"]):
                for url, ts, payload, rtype, src, off in _records_to_rows(
                        name, bytes(content), ("response",)):
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

    return files.select("path", "content").mapInPandas(
        parse, WARC_PAGES_SCHEMA)


def start_warc_extraction_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    *,
    available_now: bool = True,
    config_broadcast=None,
    max_files_per_trigger: int = 8,
):
    """readStream(WARC segments) -> fused charset+extract ->
    writeStream(parquet, exactly-once).  ``available_now=True`` drains
    the backlog and stops."""
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)

    pages = read_warc_stream(spark, input_dir, max_files_per_trigger)
    arts = extract_articles_from_bytes(
        pages, body_col="html", config_broadcast=config_broadcast)
    writer = (
        arts.writeStream.format("parquet")
        .option("path", os.path.join(output_dir, "articles"))
        .option("checkpointLocation",
                os.path.join(output_dir, "_stream_checkpoint"))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_warc_to_wet_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    *,
    available_now: bool = True,
    config_broadcast=None,
    max_files_per_trigger: int = 8,
):
    """Streaming twin of the full production job's text branch: WARC
    segments in, WET conversion segments out, continuously.

    ``foreachBatch`` hands each micro-batch to the batch WET writer with
    a per-batch file prefix, so segments from different micro-batches
    never collide and each lands atomically (the writer's temp+rename).
    Exactly-once comes from the file-source checkpoint: a replayed batch
    re-writes the SAME ``wave-<epoch>-*`` segment names idempotently."""
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)
    from article_extractor_spark.sources.wet_sink import write_wet_segments

    pages = read_warc_stream(spark, input_dir, max_files_per_trigger)
    arts = extract_articles_from_bytes(
        pages, body_col="html", config_broadcast=config_broadcast)

    wet_dir = os.path.join(output_dir, "wet")

    def sink(batch_df, epoch_id: int) -> None:
        write_wet_segments(batch_df, wet_dir,
                           prefix=f"wave-{epoch_id:06d}")

    writer = (
        arts.writeStream.foreachBatch(sink)
        .option("checkpointLocation",
                os.path.join(output_dir, "_wet_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
