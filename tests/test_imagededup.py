"""Hamming-banded phash near-dup LSH: brute-force oracles + the
pigeonhole no-false-negative property on random corpora."""

import itertools
import random

import pytest

from article_extractor_spark.operators.imagededup import (
    phash_bands, phash_dup_clusters, phash_near_dups, phash_survivors)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-imagededup-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def brute_pairs(rows, max_hamming):
    out = set()
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        if bin(ha ^ hb).count("1") <= max_hamming:
            a, b = sorted((ia, ib))
            out.add((a, b))
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "media_id long, phash long")


def test_bands_partition_the_bits(spark):
    rows = [(1, 0xBEEF), (2, 0x0001)]
    got = phash_bands(_df(spark, rows), bits=16, bands=4).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["id"], {})[r["band"]] = r["band_value"]
    # reassembling the bands reproduces the hash
    for mid, h in rows:
        assert sum(v << (4 * b) for b, v in by_id[mid].items()) == h
    assert all(len(v) == 4 for v in by_id.values())


def test_near_dups_match_brute_force(spark):
    rows = [
        (1, 0b1010101010101010),
        (2, 0b1010101010101011),  # d=1 from 1
        (3, 0b1010101010101000),  # d=2 from 1, d=2 from 2... (bits 0,1)
        (4, 0b0101010101010101),  # far from all
        (5, 0b1010101010101010),  # exact dup of 1
    ]
    got = {(r["id_a"], r["id_b"]) for r in
           phash_near_dups(_df(spark, rows), max_hamming=2).collect()}
    assert got == brute_pairs([(i, h) for i, h in rows], 2)


def test_reported_hamming_exact(spark):
    rows = [(1, 0xF0F0), (2, 0xF0F1), (3, 0xF0F0)]
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           phash_near_dups(_df(spark, rows), max_hamming=4).collect()}
    assert got[(1, 3)] == 0 and got[(1, 2)] == 1 and got[(2, 3)] == 1


def test_random_corpus_no_false_negatives(spark):
    rng = random.Random(42)
    rows = [(i, rng.getrandbits(16)) for i in range(200)]
    for d in (1, 2, 3):
        got = {(r["id_a"], r["id_b"]) for r in
               phash_near_dups(_df(spark, rows), max_hamming=d).collect()}
        assert got == brute_pairs(rows, d), f"mismatch at max_hamming={d}"


def test_bucket_cap_bounds_skew(spark):
    # 50 identical hashes form one huge bucket; cap excludes them but the
    # small cluster survives
    rows = [(i, 0xAAAA) for i in range(50)] + [(100, 0x1234), (101, 0x1235)]
    got = {(r["id_a"], r["id_b"]) for r in
           phash_near_dups(_df(spark, rows), max_hamming=1,
                           bucket_cap=10).collect()}
    assert got == {(100, 101)}


def test_full_64bit_hashes(spark):
    """64-bit fingerprints (negative longs = high bit set) band correctly,
    including the width>=64 single-band case where a mask literal would
    overflow a signed long."""
    rows = [(1, -1), (2, -1), (3, 12345), (4, -2)]
    for d in (0, 1):
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
               phash_near_dups(_df(spark, rows), bits=64,
                               max_hamming=d).collect()}
        to64 = lambda h: h & ((1 << 64) - 1)
        want = {}
        for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
            dist = bin(to64(ha) ^ to64(hb)).count("1")
            if dist <= d:
                want[tuple(sorted((ia, ib)))] = dist
        assert got == want


def test_dup_clusters_min_label(spark):
    # chain 1-2-3 (transitive via pairs), pair 10-11, singleton 20
    rows = [(1, 0x0000), (2, 0x0001), (3, 0x0003),
            (10, 0xFF00), (11, 0xFF01), (20, 0x5555)]
    got = {r["id"]: r["cluster_id"] for r in
           phash_dup_clusters(_df(spark, rows), max_hamming=1).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}  # 20 not in any pair


def test_long_chain_converges(spark):
    """A transitive chain longer than the old 10-iteration bound must
    still collapse to one cluster (default max_iterations=50)."""
    # ids 0..24 in a chain: consecutive hashes differ by exactly 1 bit
    rows, h = [], 0
    for i in range(25):
        rows.append((i, h))
        h ^= 1 << (i % 16)
    got = {r["id"]: r["cluster_id"] for r in
           phash_dup_clusters(_df(spark, rows), max_hamming=1).collect()}
    assert set(got.values()) == {0} and len(got) == 25


def test_survivors_keep_one_per_cluster(spark):
    """Media-dedup composite: chain 1-2-3 keeps only 1, pair 10-11
    keeps 10, singleton 20 always survives."""
    rows = [(1, 0x0000), (2, 0x0001), (3, 0x0003),
            (10, 0xFF00), (11, 0xFF01), (20, 0x5555)]
    kept = {r["media_id"] for r in
            phash_survivors(_df(spark, rows), max_hamming=1).collect()}
    assert kept == {1, 10, 20}


def test_plan_has_no_cartesian_join(spark):
    """The LSH meets candidates on a (band, band_value) equi-join —
    the physical plan must never degenerate to a cartesian/nested-loop
    product (the all-pairs shape banding exists to avoid)."""
    rows = [(i, i * 2654435761 % (1 << 16)) for i in range(100)]
    pairs = phash_near_dups(_df(spark, rows), max_hamming=2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "Join" in plan  # it IS a join, on the band keys


def test_end_to_end_from_decoded_pixels(spark):
    """phash computed from really-decoded GIF pixels feeds the LSH: an
    exact re-encode of the same frame is hamming-0 from the original."""
    import pandas as pd

    from article_extractor_spark.core.gif import encode_gif
    from article_extractor_spark.operators.media_ext import decode_image_any

    pal = [(0, 0, 0), (255, 255, 255)]
    # image A: left half black, right half white; B: same; C: inverted
    w, h = 8, 8
    a = bytes(1 if x >= 4 else 0 for y in range(h) for x in range(w))
    c = bytes(1 - px for px in a)
    payloads = [(1, encode_gif(w, h, [a], pal)),
                (2, encode_gif(w, h, [a], pal)),
                (3, encode_gif(w, h, [c], pal))]

    def ahash16(px_rgb, w, h):
        # same exact-integer 4x4 aHash rule as multimodal.image_phash
        gray = [sum(px_rgb[3 * i:3 * i + 3]) for i in range(w * h)]
        total = sum(gray)
        bits = 0
        for cy in range(4):
            for cx in range(4):
                cell = [gray[y * w + x]
                        for y in range(cy * 2, cy * 2 + 2)
                        for x in range(cx * 2, cx * 2 + 2)]
                if sum(cell) * w * h > total * len(cell):
                    bits |= 1 << (cy * 4 + cx)
        return bits

    rows = []
    for mid, data in payloads:
        dw, dh, _n, px = decode_image_any(data)
        rows.append((mid, ahash16(px, dw, dh)))
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           phash_near_dups(_df(spark, rows), max_hamming=0).collect()}
    assert got == {(1, 2): 0}  # the inverted image is not a near-dup
