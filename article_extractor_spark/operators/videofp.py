"""Video fingerprinting + near-dup over real YUV4MPEG2 bytes.

Completes the near-dup family across modalities (text: minhash/simhash/
suffix arrays; image: phash banding; audio: energy deltas; video: this):
a temporal fingerprint from frame-BRIGHTNESS deltas — bit f is 1 when
frame f+1's luma-plane sum exceeds frame f's, an exact integer compare
on really-decoded Y4M planes (Y plane sums; chroma ignored, matching
perceptual-hash practice).  Like the audio twin it is bit-deterministic,
and invariant under any transform that preserves the frame-brightness
ORDER (uniform brightness scaling, spatial rescale to the same aspect
sums, chroma-only edits).  Near-dup matching reuses the hash-agnostic
Hamming-banded LSH (`imagededup.phash_near_dups`) with its pigeonhole
no-false-negative guarantee.

For clips longer than ``n_bits+1`` frames the fingerprint covers the
first ``n_bits`` transitions; a per-scene variant at scale would window
the stream and fingerprint each window (same operator, exploded input).

100 TB shape: one Arrow decode pass (zero shuffles) then the band-keyed
equi-join.  New module outside every frozen query closure; no
reference-repo analogue (HTML-only).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

VIDEO_FP_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("fingerprint", LongType()),
    StructField("error", StringType()),
])


def y4m_brightness_fingerprint(content: bytes,
                               n_bits: int = 32
                               ) -> tuple[int, int, int, int]:
    """(width, height, n_frames, fingerprint) for Y4M bytes.  Bit f set
    iff sum(Y plane of frame f+1) > sum(Y plane of frame f) — frames in
    one stream share dimensions, so raw sums compare exactly."""
    import numpy as np

    from article_extractor_spark.core.y4m import decode_y4m

    width, height, _fps, _cs, frames = decode_y4m(content)
    # exact int64 luma sums (max 255 * 2^32 px << 2^63)
    sums = [int(np.frombuffer(y, dtype=np.uint8).sum(dtype=np.int64))
            for (y, _cb, _cr) in frames]
    bits = 0
    for f in range(min(n_bits, len(frames) - 1)):
        if sums[f + 1] > sums[f]:
            bits |= 1 << f
    if bits >= 1 << 63:  # n_bits=64 can set bit 63: wrap to signed int64
        bits -= 1 << 64  # (the banding LSH handles negative longs)
    return width, height, len(frames), bits


def video_fingerprint(media: DataFrame, id_col: str = "media_id",
                      content_col: str = "content",
                      n_bits: int = 32) -> DataFrame:
    """One Arrow pass: Y4M bytes -> (media_id, dims, n_frames,
    fingerprint); malformed members degrade to error rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                b = bytes(raw) if raw is not None else b""
                try:
                    w, h, nf, fp = y4m_brightness_fingerprint(b, n_bits)
                    rows.append((int(mid), w, h, nf, fp, None))
                except (ValueError, IndexError) as exc:
                    rows.append((int(mid), None, None, None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "n_frames", "fingerprint",
                "error"])

    return media.select(id_col, content_col).mapInPandas(fn, VIDEO_FP_SCHEMA)


def video_near_dups(fingerprints: DataFrame, max_hamming: int = 3,
                    n_bits: int = 32,
                    bucket_cap: int | None = None) -> DataFrame:
    """All fingerprint pairs within the Hamming budget via the generic
    banded LSH."""
    from article_extractor_spark.operators.imagededup import phash_near_dups

    return phash_near_dups(
        fingerprints.filter("error IS NULL"),
        hash_col="fingerprint", id_col="media_id", bits=n_bits,
        max_hamming=max_hamming, bucket_cap=bucket_cap,
        materialize=True)  # fingerprinting is an Arrow decode pass
