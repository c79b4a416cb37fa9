"""CDX-J writer: round-trip parity through the frozen reader, digest
correctness, and index->WARC planning joins."""

import hashlib

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-cdx-sink-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _warc_dir(spark, tmp_path, n=20):
    from article_extractor_spark.sources.warc import build_warc

    recs = [(f"http://sub.Example.com/a/{i}", "2024-03-04T05:06:07Z",
             f"<html><body><p>{'doc %d words ' % i * 30}</p></body></html>"
             .encode()) for i in range(n)]
    seg = tmp_path / "seg.warc"
    seg.write_bytes(build_warc(recs))
    return str(tmp_path), recs


def test_roundtrip_through_reader(spark, tmp_path):
    from article_extractor_spark.sources.cdx import read_cdx
    from article_extractor_spark.sources.cdx_sink import write_cdx
    from article_extractor_spark.sources.warc import read_warc

    d, recs = _warc_dir(spark, tmp_path)
    pages = read_warc(spark, d).localCheckpoint()
    out = str(tmp_path / "cdx")
    write_cdx(pages, out)

    idx = read_cdx(spark, out)
    rows = {r["url"]: r for r in idx.collect()}
    assert len(rows) == 20
    got = rows["http://sub.Example.com/a/3"]
    assert got["urlkey"].startswith("com,example,sub)/a/3")
    assert str(got["capture_ts"]) == "2024-03-04 05:06:07"
    # digest matches the actual payload md5
    payload = {r["url"]: bytes(r["html"])
               for r in pages.collect()}["http://sub.Example.com/a/3"]
    assert got["digest"] == hashlib.md5(payload).hexdigest()
    assert int(got["length"]) == len(payload)
    assert got["filename"] == "seg.warc"


def test_index_plans_record_reads(spark, tmp_path):
    """The 100 TB usage: select records from the index, join back to the
    archive rows by (filename, offset) — every planned record resolves."""
    from article_extractor_spark.sources.cdx import read_cdx
    from article_extractor_spark.sources.cdx_sink import write_cdx
    from article_extractor_spark.sources.warc import read_warc
    from pyspark.sql import functions as F

    d, _ = _warc_dir(spark, tmp_path)
    pages = read_warc(spark, d).localCheckpoint()
    out = str(tmp_path / "cdx")
    write_cdx(pages, out)

    idx = read_cdx(spark, out)
    wanted = idx.filter(F.col("urlkey").startswith("com,example,sub)/a/1"))
    planned = wanted.select(
        "filename", F.col("offset").cast("long").alias("record_offset"))
    archive = pages.withColumn(
        "filename", F.element_at(F.split("source_file", "/"), -1))
    hit = planned.join(archive, ["filename", "record_offset"])
    assert hit.count() == wanted.count() > 0


def test_null_ts_space_url_and_real_status(spark):
    """Line-format safety: NULL warc_ts emits the epoch stamp (fields
    never shift), spaces in urlkeys are escaped, and status/mime columns
    from the HTTP-head shape are honored when named."""
    from article_extractor_spark.sources.cdx import read_cdx
    from article_extractor_spark.sources.cdx_sink import write_cdx
    from pyspark.sql import functions as F

    rows = [
        ("http://n.test/a b.html", None, b"<html>1</html>", "f.warc", 0,
         404, "image/jpeg"),
        (None, "2024-01-01 00:00:00", b"x", "f.warc", 10, 200, "text/html"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary, source_file string,"
        " record_offset long, status int, content_type string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = str(spark.conf.get("spark.local.dir", "/tmp")) + "/cdx_null_test"
    write_cdx(df, out, status_col="status", mime_col="content_type")
    got = read_cdx(spark, out).collect()
    assert len(got) == 1  # the null-url record is dropped
    r = got[0]
    assert r["urlkey"].startswith("test,n)/a%20b.html")
    assert str(r["capture_ts"]) == "1970-01-01 00:00:00"
    assert r["status"] == "404" and r["mime"] == "image/jpeg"
