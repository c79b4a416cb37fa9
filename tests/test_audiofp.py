"""Energy-delta audio fingerprint: exactness, amplitude invariance,
and Hamming near-dup through the generic banded LSH."""

import io
import itertools
import random
import struct
import wave

import pytest

from article_extractor_spark.operators.audiofp import (
    audio_fingerprint, audio_near_dups, wav_energy_fingerprint)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-audiofp-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def wav_bytes(samples, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def ref_fingerprint(samples, frame_len, n_bits):
    frames = [samples[i:i + frame_len]
              for i in range(0, len(samples), frame_len)]
    ssq = [sum(s * s for s in fr) for fr in frames]
    bits = 0
    for f in range(min(n_bits, len(frames) - 1)):
        if ssq[f + 1] * len(frames[f]) > ssq[f] * len(frames[f + 1]):
            bits |= 1 << f
    return bits


def test_fingerprint_matches_reference_fold():
    rng = random.Random(7)
    samples = [rng.randint(-8000, 8000) for _ in range(2000)]
    n, nf, fp = wav_energy_fingerprint(wav_bytes(samples), 256, 32)
    assert n == 2000 and nf == 8  # 7 tail samples short of a 9th? 2000/256 -> 8 frames (last short)
    assert fp == ref_fingerprint(samples, 256, 32)


def test_amplitude_scaling_invariance():
    rng = random.Random(11)
    samples = [rng.randint(-4000, 4000) for _ in range(3000)]
    scaled = [s * 3 for s in samples]  # stays within int16 range
    _, _, fp1 = wav_energy_fingerprint(wav_bytes(samples))
    _, _, fp2 = wav_energy_fingerprint(wav_bytes(scaled))
    assert fp1 == fp2


def test_tail_frame_cross_multiplication_exact():
    # 300 samples: one full 256-frame + a 44-sample tail; per-sample
    # energy decides the bit, not raw ssq
    quiet_full = [10] * 256        # per-sample energy 100
    loud_tail = [1000] * 44        # per-sample energy 10^6
    _, nf, fp = wav_energy_fingerprint(wav_bytes(quiet_full + loud_tail))
    assert nf == 2 and fp == 1
    loud_full = [1000] * 256
    quiet_tail = [10] * 44
    _, _, fp2 = wav_energy_fingerprint(wav_bytes(loud_full + quiet_tail))
    assert fp2 == 0


def test_64bit_fingerprint_wraps_to_signed():
    """n_bits=64 can set bit 63; the fingerprint must wrap to a signed
    int64 (the banded LSH handles negative longs) instead of overflowing
    Arrow's int64 conversion."""
    # alternating loud(even)/quiet(odd) frames: bit f set iff f is odd
    # (the transition into an even frame rises), so bit 63 is set
    frames = []
    for f in range(70):
        frames.extend([4000 if f % 2 == 0 else 10] * 64)
    n, nf, fp = wav_energy_fingerprint(wav_bytes(frames), frame_len=64,
                                       n_bits=64)
    assert nf == 70
    assert -(1 << 63) <= fp < (1 << 63)
    assert fp < 0  # bit 63 set -> wrapped negative


def test_stereo_rejected():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 1, 2, 3, 4))
    with pytest.raises(ValueError):
        wav_energy_fingerprint(buf.getvalue())


def test_distributed_fingerprint_and_near_dups(spark):
    rng = random.Random(3)
    base = [rng.randint(-6000, 6000) for _ in range(4000)]
    # clone: tiny noise in ONE frame's samples -> few bits flip;
    # unrelated: independent signal
    clone = list(base)
    for i in range(256, 280):
        clone[i] += 5
    other = [rng.randint(-6000, 6000) for _ in range(4000)]
    rows = [(1, wav_bytes(base)), (2, wav_bytes(clone)),
            (3, wav_bytes(other)), (4, b"not a wav")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    fps = audio_fingerprint(df)
    got = {r["media_id"]: r for r in fps.collect()}
    assert got[4]["error"] is not None
    assert got[1]["fingerprint"] == ref_fingerprint(base, 256, 32)

    # brute-force oracle over the valid members at the chosen budget
    valid = {m: got[m]["fingerprint"] for m in (1, 2, 3)}
    d12 = bin(valid[1] ^ valid[2]).count("1")
    assert d12 <= 2  # noise confined to one frame flips at most 2 delta bits
    budget = max(d12, 1)
    want = set()
    for a, b in itertools.combinations(sorted(valid), 2):
        if bin(valid[a] ^ valid[b]).count("1") <= budget:
            want.add((a, b))
    pairs = {(r["id_a"], r["id_b"]) for r in
             audio_near_dups(fps, max_hamming=budget).collect()}
    assert (1, 2) in pairs and pairs == want


def test_resample_formula_and_identity():
    """Nearest-neighbor resample: exact index formula, identity at the
    same rate, halving keeps every other sample."""
    from article_extractor_spark.operators.audiofp import resample_wav

    samples = list(range(-500, 500, 7))
    src = wav_bytes(samples, rate=8000)
    same = resample_wav(src, 8000)
    import io as _io
    import wave as _wave

    def read(b):
        with _wave.open(_io.BytesIO(b), "rb") as r:
            return (r.getframerate(),
                    struct.unpack(f"<{r.getnframes()}h",
                                  r.readframes(r.getnframes())))

    assert read(same) == (8000, tuple(samples))
    rate, got = read(resample_wav(src, 4000))
    assert rate == 4000
    assert got == tuple(samples[i * 2] for i in range(len(samples) // 2))
    rate, up = read(resample_wav(src, 16000))
    assert rate == 16000 and len(up) == len(samples) * 2
    assert up[:4] == (samples[0], samples[0], samples[1], samples[1])


def test_resample_distributed_then_fingerprint(spark):
    """The normalize-then-fingerprint chain: mixed-rate clips resample
    to one rate and fingerprint without error rows."""
    from article_extractor_spark.operators.audiofp import (audio_fingerprint,
                                                           resample_audio)
    from pyspark.sql import functions as F

    rng = random.Random(31)
    rows = [(i, wav_bytes([rng.randint(-5000, 5000)
                           for _ in range(1000 + i * 100)],
                          rate=8000 * (1 + i % 3)))
            for i in range(12)] + [(99, b"junk")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    norm = resample_audio(df, 8000)
    ok = norm.filter("error IS NULL")
    assert ok.count() == 12
    assert norm.filter("error IS NOT NULL").count() == 1
    fps = audio_fingerprint(ok.select("media_id", "content"))
    assert fps.filter("error IS NULL").count() == 12


def test_zero_sample_rate_raises_valueerror_not_zerodivision():
    """ADVICE r5: a WAV header with frame rate 0 (accepted by wave's
    reader) must raise ValueError — resample_audio's error-row contract
    catches ValueError, not ZeroDivisionError."""
    import struct

    import pytest

    from article_extractor_spark.operators.audiofp import resample_wav

    # hand-build a minimal 16-bit mono PCM WAV with sample rate 0
    # (wave.open WRITER forbids rate 0, so build the bytes directly)
    n = 4
    data = struct.pack("<%dh" % n, *([0] * n))
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 2, 16)
           + b"data" + struct.pack("<I", len(data)) + data)
    with pytest.raises(ValueError):
        resample_wav(hdr, 8000)
