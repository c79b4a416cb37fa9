"""Distributed article extraction over a pages DataFrame.

Architecture (SURVEY.md §1/§4): the DOM never leaves a row, so extraction is
an Arrow-batched ``mapInPandas`` over ``(url, html)`` with the parsed
rule-base shipped once per executor via ``SparkContext.broadcast``.  Spark
primitives around the UDF core:

* explicit hash partitioning on ``xxhash64(url)`` with optional salting so
  one mega-host cannot serialize a partition,
* column pruning before the UDF (only url+html cross the Arrow boundary;
  Catalyst pushes the projection into the scan),
* per-partition lineage columns (partition id, batch elapsed) carried on
  each row and aggregated into a metrics table without a second pass.

The per-document semantics are exactly
``FullTextParser::parse_offline`` (`/root/reference/src/full_text_parser/
mod.rs:30-83`) via the pure-Python core."""

from __future__ import annotations

import os
import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType)

OUTPUT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("title", StringType()),
    StructField("author", StringType()),
    StructField("date", TimestampType()),
    StructField("thumbnail_url", StringType()),
    StructField("text", StringType()),           # serialized article HTML
    StructField("part_id", LongType()),          # lineage: partition id
    StructField("batch_elapsed_ms", LongType()),  # lineage: per-batch cost
])

# Arrow batches carry ~100KB-1MB HTML blobs; cap rows/batch so a batch stays
# well under executor memory even at p99 page sizes (north-rule scale note).
DEFAULT_ARROW_BATCH = "256"

_BROADCAST_CACHE = {}


def _get_worker_parser(config_entries):
    """Rebuild a FullTextParser once per Python worker from broadcast data."""
    from article_extractor_spark.core.config import ConfigCollection
    from article_extractor_spark.core.fulltext import FullTextParser

    key = id(config_entries)
    p = _BROADCAST_CACHE.get(key)
    if p is None:
        coll = ConfigCollection.__new__(ConfigCollection)
        coll.entries = config_entries
        coll.user_entries = {}
        p = FullTextParser(coll)
        _BROADCAST_CACHE.clear()
        _BROADCAST_CACHE[key] = p
    return p


def broadcast_configs(spark: SparkSession, config_dir: str | None = None):
    """Parse the 1,901 site configs once on the driver, broadcast the dict."""
    from article_extractor_spark.core.config import ConfigCollection

    coll = ConfigCollection(directory=config_dir)
    return spark.sparkContext.broadcast(coll.entries)


def _extract_rows(urls, htmls, parser):
    """Shared per-batch extraction loop: python lists in, column lists out."""
    from article_extractor_spark.core.urlutil import Url, UrlError

    n = len(urls)
    titles = [None] * n
    authors = [None] * n
    dates = [None] * n
    thumbs = [None] * n
    texts = [None] * n
    for i, (url_s, html) in enumerate(zip(urls, htmls)):
        if html is None:
            continue
        if isinstance(html, (bytes, bytearray, memoryview)):
            html = bytes(html).decode("utf-8", "replace")
        try:
            u = Url.parse(url_s)
        except UrlError:
            u = None
        try:
            art = parser.parse_offline([html], url=u)
        except Exception:
            continue  # hard-failed document: emit row with null fields
        titles[i] = art.title
        authors[i] = art.author
        dates[i] = art.date.replace(tzinfo=None) if art.date is not None else None
        thumbs[i] = art.thumbnail_url
        texts[i] = art.html
    return titles, authors, dates, thumbs, texts


def _extract_batches_arrow(batches, config_entries):
    """Arrow-native batch loop (mapInArrow): no pandas materialization on
    either side of the exchange — the html column goes Arrow buffer ->
    python list, results go python lists -> Arrow arrays."""
    import pyarrow as pa
    from pyspark import TaskContext

    parser = _get_worker_parser(config_entries)
    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1

    for rb in batches:
        t0 = time.monotonic()
        urls = rb.column(rb.schema.get_field_index("url")).to_pylist()
        htmls = rb.column(rb.schema.get_field_index("html")).to_pylist()
        titles, authors, dates, thumbs, texts = _extract_rows(urls, htmls, parser)
        elapsed_ms = int((time.monotonic() - t0) * 1000)
        n = len(urls)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(titles, pa.string()),
                pa.array(authors, pa.string()),
                pa.array(dates, pa.timestamp("us")),
                pa.array(thumbs, pa.string()),
                pa.array(texts, pa.string()),
                pa.array([pid] * n, pa.int64()),
                pa.array([elapsed_ms] * n, pa.int64()),
            ],
            names=["url", "title", "author", "date", "thumbnail_url", "text",
                   "part_id", "batch_elapsed_ms"],
        )


def _extract_batches(batches: Iterator[pd.DataFrame], config_entries):
    """pandas batch loop (mapInPandas fallback; same row semantics)."""
    from pyspark import TaskContext

    parser = _get_worker_parser(config_entries)
    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1

    for pdf in batches:
        t0 = time.monotonic()
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        titles, authors, dates, thumbs, texts = _extract_rows(urls, htmls, parser)
        elapsed_ms = int((time.monotonic() - t0) * 1000)
        res = pd.DataFrame({
            "url": urls, "title": titles, "author": authors, "date": dates,
            "thumbnail_url": thumbs, "text": texts,
        })
        res["date"] = pd.to_datetime(res["date"], errors="coerce")
        res["part_id"] = pid
        res["batch_elapsed_ms"] = elapsed_ms
        yield res


def extract_articles(
    pages: DataFrame,
    config_broadcast=None,
    num_partitions: int | None = None,
    salt_buckets: int = 0,
    use_arrow: bool = True,
) -> DataFrame:
    """pages(url, html, ...) -> articles(url, title, author, date,
    thumbnail_url, text, part_id, batch_elapsed_ms).

    ``num_partitions`` triggers an explicit repartition on ``xxhash64(url)``
    (plus a salt column when ``salt_buckets > 0`` — useful when url keys are
    themselves skewed, e.g. many rows per url in re-crawls)."""
    spark = pages.sparkSession
    if config_broadcast is None:
        config_broadcast = broadcast_configs(spark)
    entries = config_broadcast

    projected = pages.select("url", "html")  # column pruning before Arrow
    if num_partitions:
        key = F.xxhash64(F.col("url"))
        if salt_buckets > 0:
            # Deterministic salt: derived purely from row DATA, never from
            # rand()/partition position — a rand-based repartition key can
            # duplicate or drop rows when an upstream task is retried after
            # the exchange partially materialized.  Re-crawl skew (many rows
            # per url) is spread by the fetch timestamp when the source has
            # one (input_hint schema: warc_ts), else by the payload hash.
            tiebreak = (
                F.col("warc_ts") if "warc_ts" in pages.columns else F.col("html")
            )
            salt = F.pmod(F.xxhash64(F.col("url"), tiebreak),
                          F.lit(salt_buckets))
            if "warc_ts" in pages.columns:
                projected = pages.select("url", "html", "warc_ts")
            key = F.xxhash64(F.col("url"), salt)
        projected = projected.repartition(num_partitions, key)
        if salt_buckets > 0 and "warc_ts" in pages.columns:
            projected = projected.select("url", "html")

    if use_arrow:
        def fn_arrow(batches):
            return _extract_batches_arrow(batches, entries.value)

        return projected.mapInArrow(fn_arrow, OUTPUT_SCHEMA)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _extract_batches(batches, entries.value)

    return projected.mapInPandas(fn, OUTPUT_SCHEMA)


def lineage_metrics(articles: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage rows (FIXTURES.md §5): partition id, doc count,
    order-insensitive checksum, elapsed — a pure DataFrame aggregation, no
    second extraction pass."""
    return articles.groupBy(F.col("part_id").alias("partition_id")).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.sum(F.octet_length(F.coalesce(F.col("text"), F.lit("")))).alias("sum_bytes"),
        F.expr("bit_xor(xxhash64(url, coalesce(text, '')))").alias("checksum"),
        F.max("batch_elapsed_ms").alias("elapsed_ms"),
    ).withColumn("run_id", F.lit(run_id))


def run_extraction_smoke(sf_dir: str = "/root/testdata/sf0.001") -> None:
    """Verify-skill hook: spin up local Spark, extract a small table, print."""
    from article_extractor_spark.sources.pages import synthesize_pages

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("extract-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", DEFAULT_ARROW_BATCH)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    pages = synthesize_pages(spark, sf_dir)
    arts = extract_articles(pages, num_partitions=8)
    arts.cache()
    n = arts.count()
    arts.select("url", "title", "thumbnail_url").show(5, truncate=60)
    lineage_metrics(arts, "smoke").show(10, truncate=False)
    print(f"extracted {n} documents")
