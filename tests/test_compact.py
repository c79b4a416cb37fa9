"""Small-file compaction (plans/compact.py): rows survive bit-for-bit
(count + order-independent checksum), the file population actually
shrinks toward the target size, the physical plan has NO exchange
(the whole point — layout fixed without shuffling the table), and the
manifest-level FFD planner is deterministic and size-bounded."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-compact-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture()
def small_files(spark, tmp_path):
    src = str(tmp_path / "src")
    (spark.range(20_000)
          .select(F.col("id"),
                  F.concat(F.lit("payload-"), F.col("id")).alias("s"),
                  (F.col("id") % 7).alias("k"))
          .repartition(64)  # 64 tiny files
          .write.parquet(src))
    return src


def test_compact_preserves_rows_and_shrinks(spark, small_files,
                                            tmp_path):
    from article_extractor_spark.plans.compact import (
        compact_parquet, compaction_stats, table_checksum)

    dst = str(tmp_path / "dst")
    before = compaction_stats(small_files)
    assert before["n_files"] == 64
    target = max(before["bytes"] // 4, 64 * 1024)
    report = compact_parquet(spark, small_files, dst,
                             target_bytes=target,
                             open_cost_bytes=1024)
    after = report["after"]
    assert report["rows"] == 20_000
    assert after["n_files"] < before["n_files"]
    assert after["bytes"] > 0
    # verification is part of the op, but assert independently too
    assert table_checksum(spark.read.parquet(small_files)) == \
        table_checksum(spark.read.parquet(dst))
    # conf restored
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") \
        != str(target)


def test_compact_plan_has_no_exchange(spark, small_files, tmp_path):
    target = 1 << 30
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))
    try:
        plan = spark.read.parquet(small_files) \
            ._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert "Exchange" not in plan


def test_checksum_is_order_and_layout_independent(spark, small_files,
                                                  tmp_path):
    from article_extractor_spark.plans.compact import table_checksum

    df = spark.read.parquet(small_files)
    a = table_checksum(df)
    b = table_checksum(df.repartition(3))
    c = table_checksum(df.orderBy(F.col("id").desc()))
    assert a == b == c
    # and it detects a lost row
    d = table_checksum(df.where("id <> 12345"))
    assert d != a


def test_compact_verification_failure_raises(spark, small_files,
                                             tmp_path, monkeypatch):
    import article_extractor_spark.plans.compact as C

    real = C.table_checksum
    calls = []

    def evil(df):
        calls.append(1)
        n, x, s = real(df)
        return (n, x, s if len(calls) == 1 else (s or 0) + 1)

    monkeypatch.setattr(C, "table_checksum", evil)
    with pytest.raises(ValueError, match="verification failed"):
        C.compact_parquet(spark, small_files, str(tmp_path / "d2"),
                          target_bytes=1 << 20)


def test_ffd_planner_bounded_and_deterministic(spark, small_files):
    from article_extractor_spark.plans.compact import (
        _data_files, plan_compaction)

    files = _data_files(small_files)
    target = max(s for _, s in files) * 4
    plan = plan_compaction(small_files, target)
    again = plan_compaction(small_files, target)
    assert plan == again
    covered = sorted(f for _, g, _ in plan for f in g)
    assert covered == sorted(f for f, _ in files)  # exact partition
    for _, group, total in plan:
        assert total == sum(dict(files)[f] for f in group)
        if len(group) > 1:  # multi-file bins respect the target
            assert total <= target
