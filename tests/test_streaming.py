"""Streaming extraction: drain a parquet-file backlog with availableNow and
check exactly-once append semantics across a second batch of files."""

import os

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-stream-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_stream_extraction_available_now(spark, tmp_path):
    from article_extractor_spark.sources.pages import synthesize_pages
    from article_extractor_spark.streaming.extract_stream import \
        start_extraction_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(60).cache()
    pages.limit(40).write.mode("append").parquet(in_dir)

    q = start_extraction_stream(spark, in_dir, out_dir)
    q.awaitTermination(300)
    got = spark.read.parquet(os.path.join(out_dir, "articles"))
    assert got.count() == 40
    assert got.where(F.col("title").isNull()).count() == 0

    # second wave of files: only the delta is processed (stream checkpoint)
    pages.subtract(pages.limit(40)).write.mode("append").parquet(in_dir)
    q2 = start_extraction_stream(spark, in_dir, out_dir)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(os.path.join(out_dir, "articles"))
    assert got2.count() == 60
    assert got2.select("url").distinct().count() == 60
    pages.unpersist()
