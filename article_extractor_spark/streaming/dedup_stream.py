"""Streaming exact dedup: first-seen-wins URL (or content-hash) dedup in
the ingestion stream itself, so duplicates never reach the extraction
stage or the sink.

``dropDuplicates`` on a streaming DataFrame keeps per-key state across
micro-batches (exactly-once with the sink checkpoint); the watermark
bounds that state — a key unseen for longer than the delay is evicted,
which is the right trade for crawl streams (re-crawls of the same url
arrive close together; a months-later re-crawl is a legitimate new
version).  State size = distinct keys within the watermark horizon, not
the full corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(pages_stream: DataFrame,
                 keys: tuple[str, ...] = ("url",),
                 ts_col: str = "warc_ts",
                 watermark_delay: str = "1 hour") -> DataFrame:
    """First occurrence per key within the watermark horizon passes;
    later duplicates are dropped.  Composable before
    ``extract_stream`` (stateless map) in the same query."""
    return (
        pages_stream.withWatermark(ts_col, watermark_delay)
        .dropDuplicates([*keys])
    )
