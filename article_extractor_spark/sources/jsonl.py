"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
LLM training-data interchange (every public corpus release ships as
.jsonl/.jsonl.gz shards).

Read and write are the built-in Spark json datasource (splittable,
predicate/column pruning, .gz transparent), wrapped so the schema is
explicit — inferring schemas at 100 TB means a full pre-scan, so the
contract here is schema-first.  The in-row helpers (``docs_to_jsonl`` /
``jsonl_to_docs``) run the same serialization through ``to_json`` /
``from_json`` as pure JVM projections for roundtrip verification without
touching a filesystem.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_JSON_SCHEMA = ("doc_id bigint, text string, "
                   "meta struct<lang: string, source: string>, "
                   "stats array<bigint>")


def write_jsonl(df: DataFrame, path: str, compress: bool = False) -> None:
    """Write a DataFrame as JSONL shards (one file per partition — the
    natural 100 TB layout; .gz optional)."""
    w = df.write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-first JSONL read (no inference scan); corrupt lines land in
    ``_corrupt_record`` instead of failing the job (PERMISSIVE — at
    crawl scale some damaged lines are a certainty)."""
    return (spark.read.schema(schema + ", _corrupt_record string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path))


def docs_to_jsonl(docs: DataFrame) -> DataFrame:
    """(doc_id, line) — each document serialized to one JSON line with a
    nested meta struct and a stats array (exercises non-flat shapes)."""
    return docs.select(
        F.col("doc_id"),
        F.to_json(F.struct(
            F.col("doc_id"),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.struct(F.col("lang"), F.col("source")).alias("meta"),
            F.array(F.col("n_chars"),
                    F.length(F.coalesce(F.col("text"), F.lit("")))
                    .cast("bigint")).alias("stats"),
        )).alias("line"))


def jsonl_to_docs(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse JSON lines back to typed columns (from_json, zero shuffle)."""
    parsed = lines.select(
        F.from_json(F.col(line_col), DOC_JSON_SCHEMA).alias("j"))
    return parsed.select(
        F.col("j.doc_id").alias("doc_id"),
        F.col("j.text").alias("text"),
        F.col("j.meta.lang").alias("lang"),
        F.col("j.meta.source").alias("source"),
        F.element_at("j.stats", 1).alias("n_chars"),
        F.element_at("j.stats", 2).alias("text_len"),
    )
