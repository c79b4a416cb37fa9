"""Range-sorted layout: measured row-group pruning vs an unclustered
write of the same data, using the scan's own metrics."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-layout-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_range_sorted_prunes_row_groups(spark, tmp_path):
    from article_extractor_spark.plans.layout import (scan_output_rows,
                                                      write_range_sorted)

    n = 200_000
    df = spark.range(n).selectExpr(
        "id", "xxhash64(id) AS scrambled")
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    write_range_sorted(df, clustered, "id", n_files=8)
    # same rows, layout scrambled by the hash -> min/max spans everything
    (df.repartition(8, F.col("scrambled"))
       .write.mode("overwrite").parquet(scattered))

    pred = "id BETWEEN 100000 AND 101000"  # 0.5% selectivity
    rows_clustered = scan_output_rows(
        spark.read.parquet(clustered).filter(pred))
    rows_scattered = scan_output_rows(
        spark.read.parquet(scattered).filter(pred))

    assert rows_scattered >= n * 0.6       # scrambled layout reads most
    assert rows_clustered <= n * 0.2       # clustered skips most groups
    assert rows_clustered * 4 < rows_scattered

    # correctness identical either way
    a = spark.read.parquet(clustered).filter(pred).count()
    b = spark.read.parquet(scattered).filter(pred).count()
    assert a == b == 1001


def test_scan_metric_reports_full_reads(spark, tmp_path):
    from article_extractor_spark.plans.layout import (scan_output_rows,
                                                      write_range_sorted)

    df = spark.range(10_000).selectExpr("id")
    p = str(tmp_path / "t")
    write_range_sorted(df, p, "id", n_files=2)
    assert scan_output_rows(spark.read.parquet(p)) == 10_000
