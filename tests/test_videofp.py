"""Video brightness-delta fingerprint over real Y4M: fold parity,
brightness-order invariance, distributed near-dup vs brute force."""

import itertools
import random

import pytest

from article_extractor_spark.core.y4m import encode_y4m
from article_extractor_spark.operators.videofp import (
    video_fingerprint, video_near_dups, y4m_brightness_fingerprint)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-videofp-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def clip(levels, w=4, h=4):
    """C444 clip with constant-luma frames at the given levels."""
    frames = [(bytes([lv]) * (w * h), bytes(w * h), bytes(w * h))
              for lv in levels]
    return encode_y4m(w, h, frames)


def ref_fp(levels, n_bits=32):
    bits = 0
    for f in range(min(n_bits, len(levels) - 1)):
        if levels[f + 1] > levels[f]:
            bits |= 1 << f
    return bits


def test_fingerprint_matches_fold():
    rng = random.Random(5)
    levels = [rng.randint(0, 255) for _ in range(20)]
    w, h, nf, fp = y4m_brightness_fingerprint(clip(levels))
    assert (w, h, nf) == (4, 4, 20)
    assert fp == ref_fp(levels)


def test_brightness_order_invariance():
    levels = [10, 30, 20, 40, 5, 200]
    halved = [lv // 2 for lv in levels]  # order preserved
    assert y4m_brightness_fingerprint(clip(levels))[3] == \
        y4m_brightness_fingerprint(clip(halved))[3]


def test_chroma_edits_invisible():
    levels = [10, 50, 20]
    w, h = 4, 4
    plain = [(bytes([lv]) * (w * h), bytes(w * h), bytes(w * h))
             for lv in levels]
    recolored = [(y, bytes([200]) * (w * h), bytes([90]) * (w * h))
                 for (y, _cb, _cr) in plain]
    assert y4m_brightness_fingerprint(encode_y4m(w, h, plain))[3] == \
        y4m_brightness_fingerprint(encode_y4m(w, h, recolored))[3]


def test_c420_subsampled_clip():
    w, h = 6, 4
    cw, ch = 3, 2
    frames = [(bytes([lv]) * (w * h), bytes(cw * ch), bytes(cw * ch))
              for lv in (5, 100, 50)]
    data = encode_y4m(w, h, frames, colourspace="C420jpeg")
    gw, gh, nf, fp = y4m_brightness_fingerprint(data)
    assert (gw, gh, nf) == (6, 4, 3) and fp == ref_fp([5, 100, 50])


def test_distributed_near_dups(spark):
    rng = random.Random(9)
    base = [rng.randint(0, 255) for _ in range(33)]
    near = list(base)
    near[10] = 255 - near[10]  # perturbs at most 2 delta bits
    other = [rng.randint(0, 255) for _ in range(33)]
    rows = [(1, clip(base)), (2, clip(near)), (3, clip(other)),
            (4, b"not video")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    fps = video_fingerprint(df)
    got = {r["media_id"]: r for r in fps.collect()}
    assert got[4]["error"] is not None
    assert got[1]["fingerprint"] == ref_fp(base)

    valid = {m: got[m]["fingerprint"] for m in (1, 2, 3)}
    d12 = bin(valid[1] ^ valid[2]).count("1")
    assert d12 <= 2
    budget = max(d12, 1)
    want = {tuple(sorted((a, b)))
            for a, b in itertools.combinations(valid, 2)
            if bin(valid[a] ^ valid[b]).count("1") <= budget}
    pairs = {(r["id_a"], r["id_b"]) for r in
             video_near_dups(fps, max_hamming=budget).collect()}
    assert (1, 2) in pairs and pairs == want


def test_temporal_resample_exact():
    """Rational-exact frame selection: halving fps keeps every other
    frame bit-identical; doubling duplicates; identity is a no-op on
    frame content; duration preserved."""
    from article_extractor_spark.core.y4m import decode_y4m
    from article_extractor_spark.operators.videofp import resample_y4m

    levels = list(range(0, 240, 10))  # 24 distinct frames
    src = clip(levels)  # encoded at default 25:1 fps

    def frames_of(b):
        return decode_y4m(b)[4]

    same = resample_y4m(src, (25, 1))
    assert frames_of(same) == frames_of(src)

    half = resample_y4m(src, (25, 2))  # 12.5 fps: every other frame
    got = frames_of(half)
    want = [frames_of(src)[(j * 25 * 2) // 25] for j in range(len(got))]
    assert got == want and len(got) == 12

    dbl = resample_y4m(src, (50, 1))
    gd = frames_of(dbl)
    assert len(gd) == 48
    assert gd[0] == gd[1] == frames_of(src)[0]
    assert gd[2] == gd[3] == frames_of(src)[1]


def test_resample_distributed_then_fingerprint(spark):
    from article_extractor_spark.operators.videofp import (resample_video,
                                                           video_fingerprint)

    rng = random.Random(41)
    rows = [(i, clip([rng.randint(0, 255) for _ in range(20 + i)]))
            for i in range(8)] + [(99, b"junk")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    norm = resample_video(df, (10, 1))
    ok = norm.filter("error IS NULL")
    assert ok.count() == 8
    assert norm.filter("error IS NOT NULL").count() == 1
    fps = video_fingerprint(ok.select("media_id", "content"))
    assert fps.filter("error IS NULL").count() == 8


def test_zero_fps_header_raises_valueerror_not_zerodivision():
    """ADVICE r5: an F0:1 Y4M header (fps numerator 0) must raise
    ValueError from resample_y4m — resample_video's error-row contract
    catches (ValueError, IndexError), not ZeroDivisionError."""
    import pytest

    from article_extractor_spark.operators.videofp import resample_y4m

    w, h = 4, 2
    frame = b"FRAME\n" + bytes(w * h) + bytes(w * h) + bytes(w * h)
    y4m = (b"YUV4MPEG2 W4 H2 F0:1 C444\n" + frame)
    with pytest.raises(ValueError):
        resample_y4m(y4m, (5, 1))
