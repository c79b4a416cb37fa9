"""Bucketed checkpoint/resume for the extraction job (north rule: exact
resume with per-partition lineage + metrics).

Data-deterministic bucketing: ``bucket = pmod(xxhash64(url), num_buckets)``
— a pure function of the data, not of the physical partitioning, so a
restarted job (even at a different parallelism) resumes exactly.  Completed
buckets are recorded in a checkpoint table; resume anti-joins the input
against it (broadcast — the checkpoint side is tiny).

Format note: written as parquet directories here (the sandbox has no
Iceberg runtime jar); the layout (append-only data keyed by bucket +
idempotent checkpoint append) is exactly an Iceberg partitioned-append and
ports 1:1 by swapping ``.parquet`` for ``.format("iceberg")``."""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHECKPOINT_SCHEMA = "bucket int, run_id string, completed_at timestamp"


def with_bucket(pages: DataFrame, num_buckets: int) -> DataFrame:
    return pages.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(num_buckets)).cast("int")
    )


def completed_buckets(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Distinct buckets recorded in the checkpoint table, or empty if none.

    Reads through Spark's Hadoop filesystem layer so resume works for ANY
    URI the job can write to (s3a://, hdfs://, local) — an os.path probe
    silently returns empty for remote paths, turning the advertised exact
    resume into a full reprocess.

    Only a missing path means "no completed buckets"; any other failure
    (permissions, corrupt footer, transient FS error) re-raises — silently
    treating it as empty would degrade exact resume to a full reprocess
    and append duplicate lineage/checkpoint rows for re-done buckets."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(checkpoint_dir).select("bucket").distinct()
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return spark.createDataFrame([], "bucket int")
        raise


def mark_completed(spark: SparkSession, checkpoint_dir: str, buckets: list[int],
                   run_id: str) -> None:
    import datetime

    now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    df = spark.createDataFrame(
        [(int(b), run_id, now) for b in buckets], CHECKPOINT_SCHEMA
    )
    df.coalesce(1).write.mode("append").parquet(checkpoint_dir)


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame,
    output_dir: str,
    *,
    num_buckets: int = 16,
    buckets_per_wave: int | None = None,
    run_id: str | None = None,
    config_broadcast=None,
    partitions_per_bucket: int = 1,
) -> dict:
    """Checkpointed extraction: pages -> output_dir/{articles,lineage,_checkpoint}.

    Processes buckets in waves; each wave appends its articles (partitioned
    by bucket), its lineage rows, and only then checkpoints the wave's
    buckets — a crash replays at most one (idempotent: rewriting a bucket's
    partition directory overwrites by dynamic partition overwrite).
    Returns a summary dict."""
    from article_extractor_spark.operators.extract import (broadcast_configs,
                                                           extract_articles,
                                                           lineage_metrics)

    run_id = run_id or uuid.uuid4().hex[:12]
    articles_dir = os.path.join(output_dir, "articles")
    lineage_dir = os.path.join(output_dir, "lineage")
    checkpoint_dir = os.path.join(output_dir, "_checkpoint")

    if config_broadcast is None:
        config_broadcast = broadcast_configs(spark)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    bucketed = with_bucket(pages, num_buckets)
    done = {r.bucket for r in completed_buckets(spark, checkpoint_dir).collect()}
    todo = [b for b in range(num_buckets) if b not in done]
    if buckets_per_wave is None:
        buckets_per_wave = max(1, len(todo))

    t0 = time.monotonic()
    docs_total = 0
    for wave_start in range(0, len(todo), buckets_per_wave):
        wave = todo[wave_start : wave_start + buckets_per_wave]
        wave_pages = bucketed.where(F.col("bucket").isin(wave))
        arts = extract_articles(
            wave_pages.select("url", "html"),
            config_broadcast=config_broadcast,
            num_partitions=len(wave) * partitions_per_bucket,
        )
        arts = with_bucket(arts, num_buckets)
        arts.write.mode("overwrite").partitionBy("bucket").parquet(articles_dir)
        # lineage after the data write, keyed to this run
        lineage = lineage_metrics(spark.read.parquet(articles_dir).where(
            F.col("bucket").isin(wave)), run_id)
        lineage.write.mode("append").parquet(lineage_dir)
        mark_completed(spark, checkpoint_dir, wave, run_id)
    elapsed = time.monotonic() - t0

    out = spark.read.parquet(articles_dir)
    docs_total = out.count()
    # throughput counts only the buckets THIS run processed — on a resume,
    # docs completed by earlier runs are in articles_dir but cost this run
    # no time, so including them would inflate docs_per_sec
    docs_this_run = (
        out.where(F.col("bucket").isin(todo)).count() if todo else 0
    )
    return {
        "run_id": run_id,
        "buckets_processed": len(todo),
        "buckets_skipped": len(done),
        "docs_total": docs_total,
        "docs_this_run": docs_this_run,
        "elapsed_sec": round(elapsed, 3),
        "docs_per_sec": (
            round(docs_this_run / elapsed, 1) if todo and elapsed > 0.001 else None
        ),
    }
