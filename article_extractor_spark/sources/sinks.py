"""Output sinks.

* :func:`write_articles` — the main table sink (parquet dirs here; swap
  ``.format("iceberg")`` on a cluster with an Iceberg catalog), partitioned
  by content bucket for pruned downstream reads.
* :func:`save_html_files` — per-article HTML files named by title, the
  equivalent of the reference's ``Article::save_html``
  (`/root/reference/src/article.rs:17-36`); driver-side `foreachPartition`
  writer for small result sets (debug/export use, not the scale path)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_articles(articles: DataFrame, path: str, num_buckets: int = 64,
                   mode: str = "overwrite") -> None:
    bucketed = articles.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(num_buckets)).cast("int"))
    (bucketed.write.mode(mode).partitionBy("bucket").parquet(path))


def save_html_files(articles: DataFrame, directory: str) -> int:
    """Write each article's html to `<title>.html` (slashes replaced, like
    article.rs:21-24; untitled articles become 'Unknown Title.html')."""
    os.makedirs(directory, exist_ok=True)
    rows = articles.select("title", F.col("text").alias("html")).collect()
    n = 0
    for row in rows:
        if row["html"] is None:
            continue
        file_name = (row["title"] or "Unknown Title").replace("/", "_") + ".html"
        with open(os.path.join(directory, file_name), "w", encoding="utf-8") as f:
            f.write(row["html"])
        n += 1
    return n
