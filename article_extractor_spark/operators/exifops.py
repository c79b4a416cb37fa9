"""EXIF metadata operators over binary image columns.

The privacy pass a multimodal crawl pipeline runs before training:
measure what metadata ships with crawled JPEGs (camera, timestamps,
GPS) and scrub it losslessly.  One Arrow ``mapInPandas`` each, zero
shuffles; per-row failures degrade to error rows (crawl batches always
contain malformed members).  `scrub_exif` preserves the entropy-coded
scan verbatim, so decoded pixels are bit-identical — pinned by
tests/test_exif.py against the real JPEG codec.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField,
                               StructType)

EXIF_STATS_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("has_exif", IntegerType()),
    StructField("has_gps", IntegerType()),
    StructField("make", StringType()),
    StructField("model", StringType()),
    StructField("orientation", IntegerType()),
    StructField("datetime", StringType()),
    StructField("gps_lat", DoubleType()),
    StructField("gps_lon", DoubleType()),
    StructField("error", StringType()),
])

SCRUBBED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("content", BinaryType()),
    StructField("bytes_removed", IntegerType()),
])


def exif_stats(media: DataFrame, id_col: str = "media_id",
               content_col: str = "content") -> DataFrame:
    """Per image: EXIF presence, GPS presence, and the common fields."""
    from article_extractor_spark.core.exif import ExifError, parse_exif

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                b = bytes(raw) if raw is not None else b""
                try:
                    e = parse_exif(b)
                    rows.append((
                        int(mid), int(bool(e)),
                        int("gps_lat" in e or "gps_lon" in e),
                        e.get("make"), e.get("model"),
                        e.get("orientation"), e.get("datetime"),
                        e.get("gps_lat"), e.get("gps_lon"), None))
                except ExifError as exc:
                    rows.append((int(mid), None, None, None, None, None,
                                 None, None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "has_exif", "has_gps", "make", "model",
                "orientation", "datetime", "gps_lat", "gps_lon", "error"])

    return media.select(id_col, content_col).mapInPandas(
        fn, EXIF_STATS_SCHEMA)


def scrub_exif(media: DataFrame, id_col: str = "media_id",
               content_col: str = "content") -> DataFrame:
    """Lossless EXIF removal: APP1(Exif) segments dropped, every other
    byte (incl. the entropy-coded scan) verbatim.  Non-JPEG and
    unwalkable payloads pass through unchanged (bytes_removed 0)."""
    from article_extractor_spark.core.exif import strip_exif

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                b = bytes(raw) if raw is not None else b""
                out = strip_exif(b)
                rows.append((int(mid), out, len(b) - len(out)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "content", "bytes_removed"])

    return media.select(id_col, content_col).mapInPandas(
        fn, SCRUBBED_SCHEMA)


def scrub_media_metadata(media: DataFrame, id_col: str = "media_id",
                         content_col: str = "content") -> DataFrame:
    """Format-routed metadata scrub: JPEG EXIF, PNG text/time/eXIf
    chunks, GIF comment/plain-text/XMP extensions — pixels untouched in
    every format (`core/mediameta.py`); unknown formats pass through."""
    from article_extractor_spark.core.mediameta import strip_media_metadata

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                b = bytes(raw) if raw is not None else b""
                out = strip_media_metadata(b)
                rows.append((int(mid), out, len(b) - len(out)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "content", "bytes_removed"])

    return media.select(id_col, content_col).mapInPandas(
        fn, SCRUBBED_SCHEMA)
