"""Bloom-filtered parquet writes: the filter bytes actually land, data
round-trips, point lookups stay correct, and plain reads are unaffected."""

import glob
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-bloomwrite-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _dirsize(d):
    return sum(os.path.getsize(f) for f in glob.glob(os.path.join(d, "*.parquet")))


def test_bloom_bytes_land_and_lookups_correct(spark, tmp_path):
    from article_extractor_spark.plans.bloomwrite import write_with_bloom

    df = spark.range(20000).selectExpr(
        "id", "concat('http://h', id % 97, '.test/p', id) AS url")
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    df.write.mode("overwrite").parquet(plain)
    write_with_bloom(df, bloomed, {"url": 20000})

    # the filter bitsets occupy real bytes in every file
    assert _dirsize(bloomed) > _dirsize(plain)
    n_files = len(glob.glob(os.path.join(bloomed, "*.parquet")))
    assert (_dirsize(bloomed) - _dirsize(plain)) >= 1024 * n_files

    back = spark.read.parquet(bloomed)
    assert back.count() == 20000
    # point lookups (the pruning consumer shape) return exact rows
    hit = back.filter(F.col("url") == "http://h5.test/p102").collect()
    assert len(hit) == 1 and hit[0]["id"] == 102
    assert back.filter(F.col("url") == "http://absent.test/x").count() == 0


def test_bloom_prunes_at_read_time(spark, tmp_path):
    """The filters are CONSULTED by the scan: a point lookup on the
    bloomed layout reads ~one row group, the plain layout reads the
    whole table (hash-scattered urls give min/max nothing to exclude)."""
    from article_extractor_spark.plans.bloomwrite import write_with_bloom
    from article_extractor_spark.plans.layout import scan_output_rows

    n = 200_000
    df = spark.range(n).selectExpr("id", "md5(cast(id AS string)) AS url")
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    df.repartition(8).write.mode("overwrite").parquet(plain)
    write_with_bloom(df.repartition(8), bloomed, {"url": n // 8})

    target = df.filter("id = 12345").collect()[0]["url"]
    rows_plain = scan_output_rows(
        spark.read.parquet(plain).filter(F.col("url") == target))
    rows_bloomed = scan_output_rows(
        spark.read.parquet(bloomed).filter(F.col("url") == target))
    assert rows_plain >= n * 0.9
    assert rows_bloomed <= n // 4          # most groups bloom-excluded
    assert rows_bloomed * 4 <= rows_plain
    # identical answers
    assert spark.read.parquet(bloomed).filter(
        F.col("url") == target).count() == 1


def test_multiple_bloom_columns_and_dictionary_skip(spark, tmp_path):
    from article_extractor_spark.plans.bloomwrite import write_with_bloom

    df = spark.range(5000).selectExpr(
        "id", "concat('u', id) AS url",
        "md5(cast(id AS string)) AS digest",
        "concat('h', id % 50) AS host")
    one, two, three = (str(tmp_path / "one"), str(tmp_path / "two"),
                       str(tmp_path / "three"))
    write_with_bloom(df, one, {"url": 5000})
    # a second HIGH-cardinality column adds a second filter's bytes
    write_with_bloom(df, two, {"url": 5000, "digest": 5000})
    assert _dirsize(two) > _dirsize(one)
    # a fully dictionary-encoded column gets NO filter (parquet-mr skips
    # it — the dictionary already answers membership); request is a no-op
    write_with_bloom(df, three, {"url": 5000, "host": 64})
    assert _dirsize(three) == _dirsize(one)
    assert spark.read.parquet(two).count() == 5000
