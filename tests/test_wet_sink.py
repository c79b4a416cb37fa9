"""WET writer: read-back parity through read_warc, null skipping,
atomicity naming, and the full WARC->extract->WET production loop."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-wet-sink-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_roundtrip_through_read_warc(spark, tmp_path):
    from article_extractor_spark.sources.warc import read_warc
    from article_extractor_spark.sources.wet_sink import write_wet_segments

    rows = [(f"http://w.test/{i}", f"doc {i} text with unicode café №{i}")
            for i in range(50)] + [("http://w.test/null", None)]
    df = spark.createDataFrame(rows, "url string, text string").repartition(4)
    out = tmp_path / "wet"
    n = write_wet_segments(df, str(out))
    assert n == 50

    files = sorted(p.name for p in out.iterdir())
    assert all(f.startswith("segment-") and f.endswith(".warc.wet")
               for f in files)
    assert not any(".tmp" in f for f in files)

    back = read_warc(spark, str(out), record_types=("conversion",))
    got = {r["url"]: bytes(r["html"]).decode("utf-8")
           for r in back.collect()}
    want = {u: t for u, t in rows if t is not None}
    assert got == want


def test_timestamps_preserved(spark, tmp_path):
    from article_extractor_spark.sources.warc import read_warc
    from article_extractor_spark.sources.wet_sink import write_wet_segments
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("http://t.test/1", "text one", "2024-03-04 05:06:07")],
        "url string, text string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = tmp_path / "wet"
    assert write_wet_segments(df, str(out), ts_col="ts") == 1
    back = read_warc(spark, str(out), record_types=("conversion",)).collect()
    assert str(back[0]["warc_ts"]) == "2024-03-04 05:06:07"


def test_warc_to_wet_production_loop(spark, tmp_path):
    """The CC production job in miniature: WARC responses -> routed
    extraction -> WET segments -> read back, text matching the direct
    extraction output byte-for-byte."""
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)
    from article_extractor_spark.sources.warc import (build_warc, read_warc)
    from article_extractor_spark.sources.wet_sink import write_wet_segments

    def page(i):
        body = f"article number {i} body words " * 40
        return (f"<html><head><title>T{i}</title></head><body><article>"
                f"<p>{body}</p><p>{body}</p></article></body></html>"
                ).encode()

    records = [(f"http://p.test/{i}", "2024-01-01T00:00:00Z", page(i))
               for i in range(12)]
    seg = tmp_path / "in.warc"
    seg.write_bytes(build_warc(records))

    arts = extract_articles_from_bytes(
        read_warc(spark, str(seg)), body_col="html").localCheckpoint()
    want = {r["url"]: r["text"] for r in arts.collect()}

    out = tmp_path / "wet"
    n = write_wet_segments(arts, str(out), ts_col=None)
    assert n == 12
    back = read_warc(spark, str(out), record_types=("conversion",))
    got = {r["url"]: bytes(r["html"]).decode("utf-8") for r in back.collect()}
    assert got == want
