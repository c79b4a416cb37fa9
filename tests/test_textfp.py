"""SimHash near-dup via the shared Hamming LSH: brute-force parity on
the real fingerprint operator's output, and semantic behavior (edited
near-copies pair up, unrelated docs don't)."""

import itertools

import pytest

from article_extractor_spark.operators.textfp import (simhash_dup_clusters,
                                                      simhash_near_dups)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-textfp-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "sailors watch from the harbour wall and discuss the weather "
        "patterns of the northern atlantic in considerable detail")


def corpus():
    edited = BASE.replace("weather", "climate")
    shuffled = " ".join(reversed(BASE.split()))  # same bag of words
    other = ("completely different subject matter entirely about spark "
             "physical plans catalyst optimizer exchanges partitions "
             "broadcast joins and adaptive query execution features")
    return [(1, BASE), (2, edited), (3, shuffled), (4, other),
            (5, BASE)]


def test_near_dups_match_brute_force_on_real_fingerprints(spark):
    from article_extractor_spark.operators.dedup import simhash

    docs = spark.createDataFrame(corpus(), "doc_id long, text string")
    fps = {r["doc_id"]: r["simhash"]
           for r in simhash(docs, bits=32).collect()}
    for d in (0, 2, 4):
        want = {tuple(sorted((a, b)))
                for a, b in itertools.combinations(fps, 2)
                if bin(fps[a] ^ fps[b]).count("1") <= d}
        got = {(r["id_a"], r["id_b"]) for r in
               simhash_near_dups(docs, max_hamming=d).collect()}
        assert got == want, f"d={d}"


def test_semantics_editions_pair_identicals_cluster(spark):
    docs = spark.createDataFrame(corpus(), "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_near_dups(docs, max_hamming=3).collect()}
    # identical docs at distance 0; bag-of-words shuffle is simhash-blind
    assert pairs[(1, 5)] == 0 and pairs[(1, 3)] == 0
    # one-word edit stays within a small budget; the unrelated doc is out
    assert (1, 2) in pairs
    assert not any(4 in p for p in pairs)

    cl = {r["id"]: r["cluster_id"] for r in
          simhash_dup_clusters(docs, max_hamming=3).collect()}
    assert cl[1] == cl[2] == cl[3] == cl[5] == 1
    assert 4 not in cl  # no pair, no cluster row
