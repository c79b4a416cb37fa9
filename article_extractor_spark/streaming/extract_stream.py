"""Structured Streaming extraction.

The reference is batch-only (its fork removed crawling; SURVEY.md §2.9),
but a crawl pipeline naturally lands pages continuously, so the engine also
exposes the extraction operator as a streaming transform: files-source
``readStream`` → the same Arrow-vectorized extraction (stateless per row,
so it composes with any trigger) → parquet/console sink with Spark's own
checkpointLocation for exactly-once file-sink semantics.

This complements (does not replace) the batch bucketed checkpoint/resume in
``plans/checkpoint.py``, which exists for deterministic re-runs over static
tables."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from article_extractor_spark.sources.pages import PAGES_SCHEMA


def read_page_stream(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def extract_stream(pages_stream: DataFrame, config_broadcast=None) -> DataFrame:
    """Apply the extraction operator to a streaming pages DataFrame.
    Stateless mapInPandas — no watermark needed; each micro-batch is
    independently Arrow-batched."""
    from article_extractor_spark.operators.extract import extract_articles

    return extract_articles(pages_stream, config_broadcast=config_broadcast)


def start_extraction_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    *,
    available_now: bool = True,
    config_broadcast=None,
    max_files_per_trigger: int = 8,
):
    """readStream(pages parquet) -> extract -> writeStream(parquet).

    ``available_now=True`` drains the current backlog and stops (the batch-
    equivalent trigger); otherwise runs continuously per micro-batch."""
    arts = extract_stream(
        read_page_stream(spark, input_dir, max_files_per_trigger),
        config_broadcast)
    writer = (
        arts.writeStream.format("parquet")
        .option("path", os.path.join(output_dir, "articles"))
        .option("checkpointLocation", os.path.join(output_dir, "_stream_checkpoint"))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
