"""Verified training-shard writer — the last-mile artifact.

A training job consumes N fixed shards plus a manifest it can trust:
per-shard row counts, token totals, and content checksums, written only
AFTER verifying them against what actually landed on disk.  Shard
assignment is a pure function of the key (``pmod(xxhash64(key), n)``)
so re-runs place every row identically — no rand(), the repo-wide
determinism rule.

Verification reuses `plans/compact.py`'s order/layout-independent
table checksum (per-row xxhash64 folded by bit_xor + decimal mod-sum):
the manifest records per-shard checksums computed FROM THE WRITTEN
FILES, and the writer refuses to produce a manifest when the written
union does not checksum-match the source.  `verify_shards` replays the
check against a manifest later (bit-rot / tamper detection).

100 TB shape: one hash exchange on the shard key, one parquet write
partitioned by shard, one read-back aggregation (count + checksum +
token sum per shard in a single pass).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"  # underscore: Spark file listings skip it


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def _write_text(spark: SparkSession, path: str, content: str) -> None:
    """Write through the Hadoop FileSystem API so the manifest lands
    wherever the shards did (local, hdfs://, s3a://) — a driver-local
    ``open()`` would fail after the expensive shard write on any
    non-local directory."""
    fs, jpath = _hadoop_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    """Read back through the Hadoop FileSystem too.  Not sc.textFile —
    Hadoop's hidden-file filter skips `_`-prefixed paths (the very
    convention the manifest name relies on); and not a raw buffer read —
    py4j cannot copy a Java-side array fill back into Python.  commons-io
    (shipped with Hadoop) drains the stream JVM-side into a String."""
    fs, jpath = _hadoop_path(spark, path)
    stream = fs.open(jpath)
    try:
        return spark.sparkContext._jvm.org.apache.commons.io.IOUtils \
            .toString(stream, "UTF-8")
    finally:
        stream.close()


def _per_shard_stats(df: DataFrame, token_col: str | None):
    cols = [c for c in sorted(df.columns) if c != "shard"]
    h = F.xxhash64(*[F.col(c) for c in cols])
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(h).alias("xor_checksum"),
        F.sum(F.pmod(h, F.lit(2 ** 31)).cast("decimal(38,0)"))
        .alias("modsum_checksum"),
    ]
    if token_col:
        aggs.append(F.sum(F.col(token_col)).alias("tokens"))
    return df.groupBy("shard").agg(*aggs)


def write_training_shards(df: DataFrame, directory: str, n_shards: int,
                          key_col: str, token_col: str | None = None
                          ) -> dict:
    """Write ``df`` into ``n_shards`` parquet shards under ``directory``
    (layout ``shard=K/``), verify the written bytes against the source,
    and emit ``manifest.json``.  Returns the manifest dict.  Raises
    ``ValueError`` when the read-back does not match the source —
    in that case no manifest is written."""
    spark = df.sparkSession
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
        .cast("int"))
    (sharded.repartition(n_shards, F.col("shard"))
     .write.mode("overwrite").partitionBy("shard").parquet(directory))

    src_stats = {r["shard"]: r for r in
                 _per_shard_stats(sharded, token_col).collect()}
    written = spark.read.parquet(directory)
    got_stats = {r["shard"]: r for r in
                 _per_shard_stats(written, token_col).collect()}

    if set(src_stats) != set(got_stats):
        raise ValueError("shard set mismatch after write")
    shards = []
    for k in sorted(src_stats):
        s, g = src_stats[k], got_stats[k]
        for field in ("rows", "xor_checksum", "modsum_checksum"):
            if s[field] != g[field]:
                raise ValueError(
                    f"shard {k} {field} mismatch: wrote {g[field]}, "
                    f"source had {s[field]}")
        entry = {"shard": int(k), "rows": int(g["rows"]),
                 "xor_checksum": int(g["xor_checksum"]),
                 "modsum_checksum": str(g["modsum_checksum"])}
        if token_col:
            entry["tokens"] = int(g["tokens"]) if g["tokens"] is not None \
                else 0
        shards.append(entry)
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "token_col": token_col,
        "total_rows": sum(e["rows"] for e in shards),
        "shards": shards,
    }
    if token_col:
        manifest["total_tokens"] = sum(e["tokens"] for e in shards)
    _write_text(spark, os.path.join(directory, MANIFEST),
                json.dumps(manifest, indent=1, sort_keys=True))
    return manifest


def verify_shards(spark: SparkSession, directory: str) -> dict:
    """Re-checksum the shard directory against its manifest; returns
    {'ok': bool, 'mismatched_shards': [...]} without raising, so a
    maintenance job can report."""
    manifest = json.loads(
        _read_text(spark, os.path.join(directory, MANIFEST)))
    written = spark.read.parquet(directory)
    got = {r["shard"]: r for r in
           _per_shard_stats(written, manifest.get("token_col")).collect()}
    bad = []
    for e in manifest["shards"]:
        g = got.get(e["shard"])
        if (g is None or int(g["rows"]) != e["rows"]
                or int(g["xor_checksum"]) != e["xor_checksum"]
                or str(g["modsum_checksum"]) != e["modsum_checksum"]):
            bad.append(e["shard"])
    extra = sorted(set(got) - {e["shard"] for e in manifest["shards"]})
    return {"ok": not bad and not extra,
            "mismatched_shards": bad, "unexpected_shards": extra}
