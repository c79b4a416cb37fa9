"""SimHash near-duplicate detection — the Manku/Jain/Sarma (WWW 2007)
web-dedup shape, composed from two frozen, tested pieces: per-document
SimHash fingerprints (`dedup.simhash`, zero-shuffle in-row fold) and
the hash-agnostic Hamming-banded LSH (`imagededup.phash_near_dups`,
pigeonhole no-false-negative banding + exact ``bit_count`` verify).

`dedup_simhash` (the registered query) stops at the fingerprint; this
module supplies the pairing step Manku et al. run at Google scale:
documents within Hamming distance d of each other's fingerprints are
near-duplicates.  Their paper uses permuted-table probing; banding is
the join-friendly equivalent with the same guarantee (d+1 disjoint
bands => an agreeing band exists for every true pair).

New file outside every frozen query closure.  100 TB shape: fingerprint
pass is shuffle-free, pairing is one band-keyed equi-join whose cost
tracks true near-dup mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", bits: int = 32,
                      max_hamming: int = 3,
                      bucket_cap: int | None = None) -> DataFrame:
    """(id_a, id_b, hamming) for every document pair whose SimHash
    fingerprints differ in at most ``max_hamming`` bits."""
    from article_extractor_spark.operators.dedup import simhash
    from article_extractor_spark.operators.imagededup import phash_near_dups

    fps = simhash(docs, text_col=text_col, id_col=id_col, bits=bits)
    return phash_near_dups(fps, hash_col="simhash", id_col=id_col,
                           bits=bits, max_hamming=max_hamming,
                           bucket_cap=bucket_cap)


def simhash_dup_clusters(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", bits: int = 32,
                         max_hamming: int = 3,
                         max_iterations: int = 50) -> DataFrame:
    """(id, cluster_id) over the simhash near-dup graph (min-label
    propagation, same scheme as the image path)."""
    from article_extractor_spark.operators.dedup import simhash
    from article_extractor_spark.operators.imagededup import (
        phash_dup_clusters)

    fps = simhash(docs, text_col=text_col, id_col=id_col, bits=bits)
    return phash_dup_clusters(fps, hash_col="simhash", id_col=id_col,
                              bits=bits, max_hamming=max_hamming,
                              max_iterations=max_iterations)
