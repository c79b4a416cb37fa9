"""Streaming WARC ingest: drain a segment backlog with availableNow,
exactly-once across a second wave, and batch-parity of extracted text."""

import os

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-warc-stream-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _page(i):
    body = f"streaming article {i} body words " * 40
    return (f"<html><head><title>S{i}</title></head><body><article>"
            f"<p>{body}</p><p>{body}</p></article></body></html>").encode()


def _segment(ids):
    from article_extractor_spark.sources.warc import build_warc

    return build_warc([(f"http://s.test/{i}", "2024-01-01T00:00:00Z",
                        _page(i)) for i in ids])


def test_warc_stream_exactly_once_and_batch_parity(spark, tmp_path):
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)
    from article_extractor_spark.sources.warc import read_warc
    from article_extractor_spark.streaming.warc_stream import (
        start_warc_extraction_stream)

    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    in_dir.mkdir()
    (in_dir / "seg-0.warc").write_bytes(_segment(range(0, 10)))
    (in_dir / "seg-1.warc").write_bytes(_segment(range(10, 20)))

    q = start_warc_extraction_stream(spark, str(in_dir), out_dir)
    q.awaitTermination(300)
    got = spark.read.parquet(os.path.join(out_dir, "articles"))
    assert got.count() == 20

    # second wave: only the new segment is processed
    (in_dir / "seg-2.warc").write_bytes(_segment(range(20, 25)))
    q2 = start_warc_extraction_stream(spark, str(in_dir), out_dir)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(os.path.join(out_dir, "articles"))
    assert got2.count() == 25
    assert got2.select("url").distinct().count() == 25

    # text parity with the batch path over the same segments
    want = {r["url"]: r["text"] for r in extract_articles_from_bytes(
        read_warc(spark, str(in_dir)), body_col="html").collect()}
    stream_got = {r["url"]: r["text"] for r in got2.collect()}
    assert stream_got == want


def test_warc_to_wet_stream(spark, tmp_path):
    """Streaming WET production: segments in waves, conversion records
    out, exactly-once across a second drain, read back via read_warc."""
    import os

    from article_extractor_spark.sources.warc import read_warc
    from article_extractor_spark.streaming.warc_stream import (
        start_warc_to_wet_stream)

    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    in_dir.mkdir()
    (in_dir / "seg-0.warc").write_bytes(_segment(range(0, 8)))

    q = start_warc_to_wet_stream(spark, str(in_dir), out_dir)
    q.awaitTermination(300)
    wet = os.path.join(out_dir, "wet")
    back = read_warc(spark, wet, record_types=("conversion",))
    assert back.count() == 8

    (in_dir / "seg-1.warc").write_bytes(_segment(range(8, 13)))
    q2 = start_warc_to_wet_stream(spark, str(in_dir), out_dir)
    q2.awaitTermination(300)
    back2 = read_warc(spark, wet, record_types=("conversion",))
    assert back2.count() == 13
    assert back2.select("url").distinct().count() == 13
    files = sorted(os.listdir(wet))
    assert all(f.startswith("wave-") and ".tmp" not in f for f in files)
