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
    article.rs:21-24; untitled articles become 'Unknown Title.html').
    Driver-side collect — debug/export convenience for SMALL result sets;
    use :func:`save_html_files_distributed` for anything big."""
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


def save_html_files_distributed(articles: DataFrame, directory: str) -> int:
    """Executor-side variant of :func:`save_html_files`: each partition
    writes its own files via ``foreachPartition`` — nothing crosses the
    driver, so it scales to the full corpus (the directory must be a
    shared/distributed filesystem on a real cluster).  Same naming rule;
    duplicate titles last-write-win exactly like the reference's repeated
    ``save_html`` calls, but each file lands via write-to-temp + atomic
    rename, so concurrent same-title writers from different partitions
    can never interleave into a torn file — the last rename wins whole.
    Returns the number of files written, counted inside the single
    writer pass via an accumulator (no second lineage execution, so the
    count always agrees with the files written even for nondeterministic
    upstreams)."""
    os.makedirs(directory, exist_ok=True)
    sc = articles.sparkSession.sparkContext
    written = sc.accumulator(0)

    def write_partition(rows) -> None:
        import os as _os
        import uuid as _uuid

        for row in rows:
            if row["html"] is None:
                continue
            name = (row["title"] or "Unknown Title").replace("/", "_") + ".html"
            final = _os.path.join(directory, name)
            tmp = final + "." + _uuid.uuid4().hex[:12] + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(row["html"])
            _os.replace(tmp, final)  # atomic on POSIX: whole-file last-write-wins
            written.add(1)

    articles.select("title", F.col("text").alias("html")).foreachPartition(
        write_partition)
    return written.value
