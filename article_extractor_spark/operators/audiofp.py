"""Audio fingerprinting + near-dup over real PCM WAV bytes.

The audio twin of the image phash path: a Haitsma–Kalker-shaped
fingerprint built from frame-energy DELTAS — bit f is 1 when frame f+1
carries more energy per sample than frame f, decided by an exact integer
cross-multiplication (``ssq[f+1]*n[f] > ssq[f]*n[f+1]``) so the
fingerprint is bit-deterministic and, like the image aHash, invariant
under uniform amplitude scaling (scaling by c multiplies every ssq by
c², preserving strict order).  Near-dup matching reuses the generic
Hamming-banded LSH from `operators/imagededup.py` — the banding operator
is hash-agnostic (any long-typed bit string), so the pigeonhole
no-false-negative guarantee carries over unchanged.

100 TB shape: one Arrow ``mapInPandas`` decode+fingerprint pass (zero
shuffles), then the band-keyed equi-join.  New module outside every
frozen query closure.  No reference-repo analogue (HTML-only).
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

FP_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_samples", LongType()),
    StructField("n_frames", IntegerType()),
    StructField("fingerprint", LongType()),
    StructField("error", StringType()),
])


def wav_energy_fingerprint(content: bytes, frame_len: int = 256,
                           n_bits: int = 32) -> tuple[int, int, int]:
    """(n_samples, n_frames, fingerprint) for 16-bit mono PCM WAV bytes.

    Frames shorter than ``frame_len`` (the tail) still contribute — the
    cross-multiplication compares per-sample energy, so unequal frame
    lengths are handled exactly.  Clips with fewer than n_bits+1 frames
    zero-pad the high bits (deterministic)."""
    import numpy as np

    with wave.open(io.BytesIO(content), "rb") as r:
        if r.getsampwidth() != 2 or r.getnchannels() != 1:
            raise ValueError("need 16-bit mono PCM")
        n = r.getnframes()
        raw = r.readframes(n)
    # Vectorized exact-integer fold: int64 never overflows here —
    # max ssq = 32768^2 * frame_len <~ 5.5e11, and the cross product
    # ssq * frame_len <~ 2.9e14, both far under 2^63.
    samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    nf = (n + frame_len - 1) // frame_len if n else 0
    padded = np.zeros(nf * frame_len, dtype=np.int64)
    padded[:n] = samples
    ssq = (padded * padded).reshape(nf, frame_len).sum(axis=1)
    ln = np.full(nf, frame_len, dtype=np.int64)
    if n % frame_len:
        ln[-1] = n % frame_len  # zero-pad doesn't change ssq; length must
    k = min(n_bits, nf - 1)
    bits = 0
    if k > 0:
        rise = ssq[1:k + 1] * ln[:k] > ssq[:k] * ln[1:k + 1]
        for f in np.nonzero(rise)[0]:
            bits |= 1 << int(f)
    if bits >= 1 << 63:  # n_bits=64 can set bit 63: wrap to signed int64
        bits -= 1 << 64  # (the banding LSH handles negative longs)
    return n, nf, bits


def audio_fingerprint(media: DataFrame, id_col: str = "media_id",
                      content_col: str = "content", frame_len: int = 256,
                      n_bits: int = 32) -> DataFrame:
    """One Arrow pass: WAV bytes -> (media_id, n_samples, n_frames,
    fingerprint).  Malformed members degrade to error rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                b = bytes(raw) if raw is not None else b""
                try:
                    n, nf, fp = wav_energy_fingerprint(b, frame_len, n_bits)
                    rows.append((int(mid), n, nf, fp, None))
                except (ValueError, EOFError, wave.Error, struct.error) as exc:
                    rows.append((int(mid), None, None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_samples", "n_frames", "fingerprint", "error"])

    return media.select(id_col, content_col).mapInPandas(fn, FP_SCHEMA)


def resample_wav(content: bytes, target_rate: int) -> bytes:
    """Exact nearest-neighbor sample-rate conversion for 16-bit mono PCM
    WAV: output sample i = input sample ``i * src_rate // dst_rate`` —
    integer-deterministic (the image-resize formula in one dimension).
    Output length = ``n_src * dst_rate // src_rate``."""
    import numpy as np

    with wave.open(io.BytesIO(content), "rb") as r:
        if r.getsampwidth() != 2 or r.getnchannels() != 1:
            raise ValueError("need 16-bit mono PCM")
        src_rate = r.getframerate()
        n = r.getnframes()
        raw = r.readframes(n)
    if src_rate <= 0:
        # wave.open accepts a header with rate 0; dividing by it below
        # would raise ZeroDivisionError, which resample_audio's error
        # contract (ValueError family -> error row) does not cover
        raise ValueError("source sample rate must be positive")
    if target_rate <= 0:
        raise ValueError("target_rate must be positive")
    samples = np.frombuffer(raw, dtype="<i2")
    n_out = (n * target_rate) // src_rate
    idx = (np.arange(n_out, dtype=np.int64) * src_rate) // target_rate
    out = samples[idx].astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(target_rate)
        w.writeframes(out)
    return buf.getvalue()


def resample_audio(media: DataFrame, target_rate: int,
                   id_col: str = "media_id",
                   content_col: str = "content") -> DataFrame:
    """One Arrow pass: WAV bytes -> rate-normalized WAV bytes (the
    uniform-sample-rate step before fingerprinting or feature
    extraction); malformed members degrade to error rows."""
    from pyspark.sql.types import BinaryType

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("content", BinaryType()),
        StructField("error", StringType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                b = bytes(raw) if raw is not None else b""
                try:
                    out = resample_wav(b, target_rate)
                    with wave.open(io.BytesIO(out), "rb") as r:
                        n = r.getnframes()
                    rows.append((int(mid), n, out, None))
                except (ValueError, EOFError, wave.Error,
                        struct.error) as exc:
                    rows.append((int(mid), None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_samples", "content", "error"])

    return media.select(id_col, content_col).mapInPandas(fn, schema)


def audio_near_dups(fingerprints: DataFrame, max_hamming: int = 3,
                    n_bits: int = 32,
                    bucket_cap: int | None = None) -> DataFrame:
    """All fingerprint pairs within the Hamming budget, via the generic
    banded LSH (`imagededup.phash_near_dups` — hash-agnostic)."""
    from article_extractor_spark.operators.imagededup import phash_near_dups

    return phash_near_dups(
        fingerprints.filter("error IS NULL"),
        hash_col="fingerprint", id_col="media_id", bits=n_bits,
        max_hamming=max_hamming, bucket_cap=bucket_cap,
        materialize=True)  # fingerprinting is an Arrow decode pass
