"""Content-type routing for raw crawl payloads — entirely JVM-side.

A real WARC segment mixes HTML pages with images and other assets; the
pipeline fans out by payload type (HTML -> extraction, images -> decode/
phash dedup, rest -> passthrough).  Detection here is the same magic-
byte sniff as `media_ext.sniff_format` but expressed as Catalyst binary
comparisons on ``substring(content, ...)`` — zero Python, so the
routing column costs one projection inside whole-stage codegen and the
downstream filters push straight onto it.

100 TB shape: sniff + three filters on one cached/checkpointed scan;
no shuffle is introduced by routing itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def payload_format(content_col: str = "content"):
    """Catalyst expression: 'gif' | 'png' | 'jpeg' | 'html' | 'other'.

    HTML detection is a bounded prefix heuristic (first 256 bytes,
    latin-1-safe cast, case-insensitive '<html' / '<!doctype' / common
    top-level tags) — binary payloads never reach the cast because the
    magic branches match first."""
    c = F.col(content_col)
    prefix = F.expr(
        f"lower(decode(substring({content_col}, 1, 256), 'ISO-8859-1'))")
    return (
        F.when(F.expr(f"substring({content_col}, 1, 6)")
               .isin(F.lit(b"GIF87a"), F.lit(b"GIF89a")), "gif")
        .when(F.expr(f"substring({content_col}, 1, 8)")
              == F.lit(b"\x89PNG\r\n\x1a\n"), "png")
        .when(F.expr(f"substring({content_col}, 1, 2)")
              == F.lit(b"\xFF\xD8"), "jpeg")
        .when(prefix.contains("<html") | prefix.contains("<!doctype")
              | prefix.contains("<head") | prefix.contains("<body"), "html")
        .otherwise("other")
    )


def sniff_payloads(df: DataFrame,
                   content_col: str = "content") -> DataFrame:
    """Adds a ``format`` column via :func:`payload_format`."""
    return df.withColumn("format", payload_format(content_col))


def route_payloads(df: DataFrame, content_col: str = "content"
                   ) -> dict[str, DataFrame]:
    """{'html': ..., 'image': ..., 'other': ...} — three filtered views
    of ONE sniffed frame (cache/localCheckpoint the input upstream when
    all branches are consumed)."""
    sniffed = sniff_payloads(df, content_col)
    return {
        "html": sniffed.filter(F.col("format") == "html"),
        "image": sniffed.filter(F.col("format").isin("gif", "png", "jpeg")),
        "other": sniffed.filter(F.col("format") == "other"),
    }
