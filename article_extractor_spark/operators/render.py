"""Markdown rendering operator: cleaned-article HTML -> Markdown.

The training-data surface the reference stops short of: the reference
pipeline emits cleaned HTML (`Article::html`,
/root/reference/src/article.rs) — modern LLM corpora store Markdown.
This operator renders the extraction output (or any HTML column)
through the deterministic renderer in ``core/markdown.py``.

100 TB shape: a pure per-row projection — zero shuffle, no state; the
Python work runs in Arrow batches (pandas_udf), ~tens of µs per
document on cleaned article HTML.  Compose after ``extract_articles``
in the same stage: Catalyst pipelines both UDFs into one pass over the
pages scan, so Markdown output costs no extra scan or exchange."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def _md_udf(html: pd.Series) -> pd.Series:
    from article_extractor_spark.core.markdown import html_to_markdown

    return html.map(lambda h: html_to_markdown(h) if h else "")


def markdown_render(df: DataFrame, html_col: str = "text",
                    out_col: str = "markdown") -> DataFrame:
    """Add ``out_col``: the Markdown rendering of ``html_col``.

    NULL/empty HTML renders '' (sentinel, never NULL) so downstream
    hashing is total."""
    return df.withColumn(out_col, _md_udf(F.col(html_col)))


def markdown_stats(df: DataFrame, html_col: str = "text",
                   id_col: str = "url") -> DataFrame:
    """Render + verifiable projection: (id, md_md5, md_bytes, n_lines,
    n_heading_lines, n_list_lines) — the shape the driver oracle pins.
    All counts computed JVM-side over the rendered column."""
    md = markdown_render(df, html_col=html_col, out_col="_md")
    lines = F.when(F.col("_md") == "", F.array()).otherwise(
        F.split(F.col("_md"), "\n"))
    return (md
            .withColumn("_lines", lines)
            .select(
                F.col(id_col),
                F.md5(F.encode(F.col("_md"), "UTF-8")).alias("md_md5"),
                F.octet_length("_md").alias("md_bytes"),
                F.size("_lines").alias("n_lines"),
                F.size(F.filter(
                    "_lines", lambda x: x.rlike("^#{1,6} "))
                ).alias("n_heading_lines"),
                F.size(F.filter(
                    "_lines",
                    lambda x: x.rlike("^ *(- |[0-9]+\\. )"))
                ).alias("n_list_lines"),
            ))
