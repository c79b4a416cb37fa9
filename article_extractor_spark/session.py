"""Recommended SparkSession configuration for the extraction engine.

These are the settings the 100 TB sizing notes in SURVEY.md §4 call for;
`build_session` is a convenience for local runs, and `EXTRACTION_CONF`
documents what to pass to spark-submit on a real cluster."""

from __future__ import annotations

from pyspark.sql import SparkSession

EXTRACTION_CONF = {
    # HTML rows are 100KB-1MB: bound Arrow batches by rows so a batch stays
    # well under executor memory at p99 page size
    "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
    # AQE: runtime coalescing + skew-join splitting for the dedup joins
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # deterministic timestamps end to end
    "spark.sql.session.timeZone": "UTC",
    # parquet scans of page tables: keep split sizes moderate so html-heavy
    # row groups don't produce multi-GB tasks
    "spark.sql.files.maxPartitionBytes": "128m",
}


def build_session(master: str = "local[*]", app_name: str = "article-extractor-spark",
                  shuffle_partitions: int | None = None, **extra) -> SparkSession:
    b = SparkSession.builder.master(master).appName(app_name)
    for k, v in EXTRACTION_CONF.items():
        b = b.config(k, v)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in extra.items():
        b = b.config(k, str(v))
    return b.getOrCreate()
