"""Training-shard writer: deterministic placement, verified manifest,
tamper detection, token accounting."""

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-shards-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def docs(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 17 + 1).alias("n_tokens"))


def test_write_verify_roundtrip(spark, tmp_path):
    from article_extractor_spark.plans.shards import (verify_shards,
                                                      write_training_shards)

    d = str(tmp_path / "shards")
    m = write_training_shards(docs(spark), d, n_shards=8,
                              key_col="doc_id", token_col="n_tokens")
    assert m["total_rows"] == 300
    assert m["total_tokens"] == sum(i % 17 + 1 for i in range(300))
    assert len(m["shards"]) <= 8
    assert os.path.exists(os.path.join(d, "_manifest.json"))
    assert verify_shards(spark, d)["ok"]
    # every row present exactly once across shards
    back = spark.read.parquet(d)
    assert back.count() == 300
    assert back.select("doc_id").distinct().count() == 300


def test_deterministic_placement(spark, tmp_path):
    from article_extractor_spark.plans.shards import write_training_shards

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_training_shards(docs(spark), d1, 8, "doc_id")
    m2 = write_training_shards(docs(spark), d2, 8, "doc_id")
    assert m1["shards"] == m2["shards"]  # identical checksums per shard
    a = {(r["doc_id"], r["shard"])
         for r in spark.read.parquet(d1).collect()}
    b = {(r["doc_id"], r["shard"])
         for r in spark.read.parquet(d2).collect()}
    assert a == b


def test_tamper_detection(spark, tmp_path):
    from article_extractor_spark.plans.shards import (verify_shards,
                                                      write_training_shards)

    d = str(tmp_path / "shards")
    write_training_shards(docs(spark), d, 4, "doc_id")
    # delete one shard's files
    victim = next(p for p in os.listdir(d) if p.startswith("shard="))
    for f in os.listdir(os.path.join(d, victim)):
        os.remove(os.path.join(d, victim, f))
    os.rmdir(os.path.join(d, victim))
    res = verify_shards(spark, d)
    assert not res["ok"]
    assert res["mismatched_shards"] == [int(victim.split("=")[1])]


def test_manifest_readable_plain_json(spark, tmp_path):
    from article_extractor_spark.plans.shards import write_training_shards

    d = str(tmp_path / "shards")
    write_training_shards(docs(spark, 50), d, 2, "doc_id",
                          token_col="n_tokens")
    with open(os.path.join(d, "_manifest.json")) as f:
        m = json.load(f)
    assert m["n_shards"] == 2 and m["key_col"] == "doc_id"
    assert sum(e["rows"] for e in m["shards"]) == 50
