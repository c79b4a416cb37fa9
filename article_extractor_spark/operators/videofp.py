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


def resample_y4m(content: bytes, target_fps: tuple[int, int]) -> bytes:
    """Exact temporal nearest-neighbor resample for Y4M: output frame j
    shows the input frame at the same timestamp — index =
    ``j * src_num * dst_den // (src_den * dst_num)`` (pure integer
    rational math, no floats).  Output duration matches the input's
    (``n_out = ceil(n_src * dst_fps / src_fps)``); planes are copied
    verbatim, so picked frames are bit-identical."""
    from article_extractor_spark.core.y4m import decode_y4m, encode_y4m

    width, height, (sn, sd), cs, frames = decode_y4m(content)
    dn, dd = target_fps
    if dn <= 0 or dd <= 0:
        raise ValueError("target fps must be positive")
    if sn <= 0 or sd <= 0:
        # decode_y4m accepts an F0:1 header; the ceil-division below
        # would raise ZeroDivisionError, uncaught by resample_video's
        # (ValueError, IndexError) error-row contract
        raise ValueError("source fps must be positive")
    n_src = len(frames)
    # duration = n_src * sd / sn seconds; n_out = ceil(duration * dn/dd)
    n_out = -(-(n_src * sd * dn) // (sn * dd)) if n_src else 0
    out = []
    for j in range(n_out):
        idx = (j * sn * dd) // (sd * dn)
        out.append(frames[min(idx, n_src - 1)])
    return encode_y4m(width, height, out, fps=(dn, dd), colourspace=cs)


def resample_video(media: DataFrame, target_fps: tuple[int, int],
                   id_col: str = "media_id",
                   content_col: str = "content") -> DataFrame:
    """One Arrow pass: Y4M bytes -> fps-normalized Y4M bytes (the
    uniform-frame-rate step before temporal fingerprinting); malformed
    members degrade to error rows."""
    from pyspark.sql.types import BinaryType

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("content", BinaryType()),
        StructField("error", StringType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                b = bytes(raw) if raw is not None else b""
                try:
                    out = resample_y4m(b, target_fps)
                    from article_extractor_spark.core.y4m import decode_y4m

                    nf = len(decode_y4m(out)[4])
                    rows.append((int(mid), nf, out, None))
                except (ValueError, IndexError) as exc:
                    rows.append((int(mid), None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_frames", "content", "error"])

    return media.select(id_col, content_col).mapInPandas(fn, schema)


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
