"""Any-image decode routing: GIF + PNG + JPEG through one entry point.

Closes the queued routing item from NOTES.md ("route GIF payloads in
``decode_image_real``") WITHOUT touching the frozen ``multimodal`` /
``core.gif`` closures: this module composes them from the outside.
``decode_image_any`` sniffs the container magic and dispatches to the
pure-stdlib codecs (``core/gif.py``, ``core/png.py``, ``core/jpeg.py``),
falling back to :func:`multimodal.decode_image_real`'s PIL seam for
anything else.  ``image_stats_any`` is the Arrow ``mapInPandas``
operator over it — same batch shape as the registered ``media_*``
family, plus a deterministic pixel checksum so tests can pin decoded
CONTENT, not just dimensions.

No reference-repo analogue (rijkvp/article-extractor is HTML-only);
this belongs to the training-data-pipeline surface the builder brief
adds on top.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                               StringType, StructField, StructType)

GIF_MAGICS = (b"GIF87a", b"GIF89a")

ANY_DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("format", StringType()),      # gif | png | jpeg | other
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("pixel_md5", StringType()),   # md5 over concatenated RGB/gray frames
    StructField("error", StringType()),       # decode failure, null when ok
])


def sniff_format(content: bytes) -> str:
    if content[:6] in GIF_MAGICS:
        return "gif"
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if content[:2] == b"\xFF\xD8":
        return "jpeg"
    return "other"


def decode_image_any(content: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, n_frames, pixel_bytes).

    GIF decodes with the full animation-compositing codec (all frames,
    RGB); PNG/JPEG via the existing real path (single frame); other
    formats raise through ``decode_image_real``'s PIL seam (PIL absent
    -> NotImplementedError, malformed -> ValueError)."""
    fmt = sniff_format(content)
    if fmt == "gif":
        from article_extractor_spark.core.gif import decode_gif

        g = decode_gif(content)
        return (g["width"], g["height"], g["n_frames"],
                b"".join(g["frames"]))
    if fmt == "png":
        from article_extractor_spark.core.png import decode_png

        w, h, _ch, px = decode_png(content)
        return w, h, 1, px
    if fmt == "jpeg":
        from article_extractor_spark.core.jpeg import decode_jpeg

        try:
            w, h, _nc, px = decode_jpeg(content)
            return w, h, 1, px
        except ValueError:
            pass  # exotic JPEG: fall through to the PIL seam below
    # Delegate dimensions to the existing seam (PIL or NotImplementedError);
    # pixel bytes are not recoverable without a real decode, so hash the
    # container — still deterministic per payload.
    from article_extractor_spark.operators.multimodal import decode_image_real

    w, h, n = decode_image_real(content)
    return w, h, n, content


def resize_pixels(px: bytes, src_w: int, src_h: int,
                  dst_w: int, dst_h: int, channels: int = 3) -> bytes:
    """Exact nearest-neighbor resample: output pixel (x, y) = source
    pixel (x*src_w//dst_w, y*src_h//dst_h) — integer-deterministic, the
    formula the tests oracle directly."""
    import numpy as np

    arr = np.frombuffer(px, dtype=np.uint8).reshape(src_h, src_w, channels)
    ys = (np.arange(dst_h) * src_h) // dst_h
    xs = (np.arange(dst_w) * src_w) // dst_w
    return arr[ys][:, xs].tobytes()


def resize_images_any(media: DataFrame, max_side: int,
                      id_col: str = "media_id",
                      content_col: str = "content") -> DataFrame:
    """REAL pixel resize (`resize_media`'s planning made concrete):
    decode any supported image, aspect-preserving nearest-neighbor
    downscale to ``max_side`` (never upscale — the resize_media rule),
    re-encode as PNG.  Animations resize their FIRST frame (thumbnail
    semantics).  One Arrow pass; malformed members degrade to error
    rows."""
    import struct
    import zlib

    from article_extractor_spark.core.png import encode_png

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
        StructField("error", StringType()),
    ])

    def out_dims(w: int, h: int) -> tuple[int, int]:
        longest = max(w, h)
        scale = min(1_000_000, (1_000_000 * max_side) // longest)
        return max(1, (w * scale) // 1_000_000), \
            max(1, (h * scale) // 1_000_000)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                b = bytes(raw) if raw is not None else b""
                try:
                    w, h, n, px = decode_image_any(b)
                    # per-frame channels: animations concatenate frames
                    ch = len(px) // (w * h * n) if w * h * n else 0
                    if ch not in (1, 3):
                        raise ValueError(f"unsupported channel count {ch}")
                    dw, dh = out_dims(w, h)
                    small = resize_pixels(px[:w * h * ch], w, h, dw, dh, ch)
                    if ch == 1:  # PNG encoder wants RGB; expand gray
                        small = bytes(v for v in small for _ in range(3))
                    rows.append((int(mid), dw, dh,
                                 encode_png(dw, dh, small), None))
                except (ValueError, NotImplementedError, IndexError,
                        zlib.error, struct.error, EOFError) as exc:
                    rows.append((int(mid), None, None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "content", "error"])

    return media.select(id_col, content_col).mapInPandas(fn, schema)


def image_stats_any(media: DataFrame,
                    id_col: str = "media_id",
                    content_col: str = "content") -> DataFrame:
    """One Arrow pass: decode every payload via :func:`decode_image_any`,
    emit dimensions + frame count + pixel checksum; per-row failures
    land in ``error`` instead of killing the task (a 100 TB crawl batch
    always contains malformed members)."""

    import struct
    import zlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                b = bytes(raw) if raw is not None else b""
                fmt = sniff_format(b)
                try:
                    w, h, n, px = decode_image_any(b)
                    rows.append((int(mid), fmt, w, h, n,
                                 hashlib.md5(px).hexdigest(), None))
                # ValueError covers the codecs' typed errors; corrupt
                # PNG deflate raises zlib.error and a truncated JPEG
                # header raises struct.error — all degrade to error
                # rows, never a task failure
                except (ValueError, NotImplementedError, IndexError,
                        zlib.error, struct.error, EOFError) as exc:
                    rows.append((int(mid), fmt, None, None, None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "format", "width", "height", "n_frames",
                "pixel_md5", "error"])

    return media.select(id_col, content_col).mapInPandas(
        fn, ANY_DECODED_SCHEMA)
