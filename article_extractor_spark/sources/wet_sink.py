"""WET segment writer — the other half of the Common-Crawl round trip.

`sources/warc.py` READS WET ("conversion" records); this module WRITES
them, which is exactly the production job the reference's extraction
logic feeds in a crawl pipeline: raw WARC responses in, extracted-text
WET segments out.  Executor-side: each partition serializes its own
``<prefix>-NNNNN.warc.wet`` segment via the shared `build_warc`
serializer (conversion records, UTF-8 text payloads) and lands it with
write-to-temp + atomic rename, so a retried task can never leave a torn
segment — the last rename wins whole.  Nothing crosses the driver; on a
real cluster the directory is a shared/distributed filesystem, and at
100 TB the segment count = the partition count you chose upstream
(repartition the articles frame to size segments).

A written directory reads straight back with
``read_warc(spark, dir, record_types=('conversion',))`` — parity is
pinned by tests/test_wet_sink.py, including the non-ASCII path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_wet_segments(articles: DataFrame, directory: str,
                       prefix: str = "segment",
                       url_col: str = "url", text_col: str = "text",
                       ts_col: str | None = None) -> int:
    """articles(url, text[, ts]) -> one WET file per non-empty partition.

    Rows with NULL text are skipped (no extraction result — same rule as
    the reference's ``save_html`` skipping article-less results).
    Timestamps default to epoch when ``ts_col`` is absent so output is
    byte-deterministic for a given partitioning.  Returns the number of
    records written (accumulator — counted inside the single pass)."""
    from article_extractor_spark.sources.warc import build_warc

    os.makedirs(directory, exist_ok=True)
    sc = articles.sparkSession.sparkContext
    written = sc.accumulator(0)

    cols = [F.col(url_col).alias("url"), F.col(text_col).alias("text")]
    if ts_col:
        cols.append(F.date_format(F.col(ts_col),
                                  "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"))
    else:
        cols.append(F.lit("1970-01-01T00:00:00Z").alias("ts"))
    slim = articles.select(*cols).where(F.col("text").isNotNull())

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId()
        records = [(r["url"], r["ts"], r["text"].encode("utf-8"))
                   for r in rows]
        if not records:
            return
        data = build_warc(records, record_type="conversion")
        final = os.path.join(directory, f"{prefix}-{pid:05d}.warc.wet")
        # taskAttemptId is GLOBALLY unique across the app — a pid is only
        # per-host, so two speculative attempts of the same partition on
        # different executors could collide on a shared filesystem and
        # interleave into the very torn file the rename scheme prevents
        tmp = final + f".tmp-{tc.taskAttemptId()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, final)
        written.add(len(records))

    slim.foreachPartition(write_partition)
    return written.value
