"""Image near-duplicate detection: Hamming-banded LSH over perceptual hashes.

`multimodal.image_phash` emits the per-image dedup key (an exact-integer
average-hash); its docstring promises "exact groupBy, or hamming-bucketed
LSH at scale" — this module supplies the second half as a real operator,
in a NEW file so no frozen query closure changes.

The pigeonhole construction: split a B-bit hash into ``bands`` disjoint
bit-bands.  Two hashes within Hamming distance ``d`` differ in at most
``d`` bands, so with ``bands >= d+1`` they MUST agree exactly on at
least one band — banding therefore has zero false negatives, exactly
like MinHash-LSH banding for Jaccard (`dedup.py`).  Candidates meet on
a band-keyed equi-join (never an all-pairs cross), then one JVM-side
``bit_count(a ^ b)`` verifies the true distance.  100 TB shape: one
shuffle on (band, value), candidate volume tracks real near-dup mass;
skewed buckets (e.g. the all-black thumbnail) can be capped like the
MinHash path — capping trades recall for a bound and is off by default
because it breaks the no-false-negative guarantee.

No reference-repo analogue (rijkvp/article-extractor is HTML-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phash_bands(hashes: DataFrame, hash_col: str = "phash",
                id_col: str = "media_id", bits: int = 16,
                bands: int = 4) -> DataFrame:
    """(id, hash) -> (id, hash, band, band_value); pure JVM bit slicing.
    When ``bits`` is not divisible by ``bands`` the low bands are one bit
    wider (widths differ by at most 1) — the pigeonhole guarantee only
    needs the bands to be disjoint and cover every bit.  ONE scan of the
    input: the band values are built as an in-row array and posexploded
    (a per-band union would replay the upstream — typically a real
    decode — ``bands`` times per side of the self-join)."""
    if not 1 <= bands <= bits:
        raise ValueError(f"need 1 <= bands <= bits, got {bands}/{bits}")
    base, extra = divmod(bits, bands)
    h = F.col(hash_col).cast("long")
    vals = []
    offset = 0
    for b in range(bands):
        width = base + (1 if b < extra else 0)
        if width >= 64:  # 2^64-1 overflows a signed long literal
            vals.append(h)
        else:
            vals.append(F.shiftright(h, offset)
                        .bitwiseAND(F.lit((1 << width) - 1)))
        offset += width
    return (hashes.select(F.col(id_col).alias("id"), h.alias("h"),
                          F.posexplode(F.array(*vals))
                          .alias("band", "band_value")))


def phash_near_dups(hashes: DataFrame, hash_col: str = "phash",
                    id_col: str = "media_id", bits: int = 16,
                    max_hamming: int = 2, bands: int | None = None,
                    bucket_cap: int | None = None,
                    materialize: bool = False) -> DataFrame:
    """All pairs (id_a < id_b) with hamming(hash_a, hash_b) <= max_hamming.

    ``bands`` defaults to ``max_hamming + 1`` — the smallest count with
    the pigeonhole no-false-negative guarantee.  ``bucket_cap`` (optional)
    drops band-buckets larger than the cap before the self-join: a skew
    bound for degenerate corpora, documented recall trade.
    ``materialize=True`` localCheckpoints the input projection first —
    set it when ``hashes`` is produced by an expensive stage (a real
    decode/fingerprint Arrow pass), which the self-join would otherwise
    replay once per side; leave False for cheap scans."""
    if bands is None:
        bands = max_hamming + 1
    if materialize:
        hashes = hashes.select(id_col, hash_col).localCheckpoint()
    banded = phash_bands(hashes, hash_col, id_col, bits, bands)
    if bucket_cap is not None:
        counts = banded.groupBy("band", "band_value").agg(
            F.count(F.lit(1)).alias("_n"))
        banded = (banded.join(F.broadcast(counts.filter(
            F.col("_n") <= bucket_cap)), ["band", "band_value"])
            .drop("_n"))
    left = banded.select("band", "band_value",
                         F.col("id").alias("id_a"), F.col("h").alias("h_a"))
    right = banded.select("band", "band_value",
                          F.col("id").alias("id_b"), F.col("h").alias("h_b"))
    pairs = (left.join(right, ["band", "band_value"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "h_a", "h_b")
             .distinct())   # a pair can agree on several bands
    return (pairs
            .withColumn("hamming", F.expr("bit_count(h_a ^ h_b)"))
            .filter(F.col("hamming") <= F.lit(max_hamming))
            .select("id_a", "id_b", "hamming"))


def phash_survivors(hashes: DataFrame, hash_col: str = "phash",
                    id_col: str = "media_id", bits: int = 16,
                    max_hamming: int = 2,
                    max_iterations: int = 50) -> DataFrame:
    """One row per KEPT id: the minimum-id representative of every
    near-dup cluster plus every unclustered id — the media twin of
    `dedup_keep_best`'s survivor selection (deterministic lowest-id
    rule; a quality column can replace the min by reusing the
    max(struct) pattern).  Anti-join shape: losers = clustered ids
    that are not their cluster's label."""
    clusters = phash_dup_clusters(hashes, hash_col, id_col, bits,
                                  max_hamming, max_iterations)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")) \
        .select(F.col("id").alias(id_col))
    return hashes.select(id_col).distinct().join(
        losers, id_col, "left_anti")


def phash_dup_clusters(hashes: DataFrame, hash_col: str = "phash",
                       id_col: str = "media_id", bits: int = 16,
                       max_hamming: int = 2,
                       max_iterations: int = 50) -> DataFrame:
    """(id, cluster_id) for every image in some near-dup pair, cluster_id =
    min member id via iterated label propagation on the near-dup graph
    (same min-label scheme as `dedup.dup_clusters`; ``max_iterations``
    bounds graphs whose diameter exceeds it — raise for long transitive
    chains, matching dedup_clusters' default of 50)."""
    edges = phash_near_dups(hashes, hash_col, id_col, bits, max_hamming)
    undirected = (edges.selectExpr("id_a AS src", "id_b AS dst")
                  .unionByName(edges.selectExpr("id_b AS src", "id_a AS dst"))
                  .localCheckpoint())  # break lineage before the self-joins
    labels = (undirected.select(F.col("src").alias("node")).distinct()
              .withColumn("cluster_id", F.col("node")))
    for _ in range(max_iterations):
        neigh = (undirected
                 .join(labels, undirected.dst == labels.node)
                 .select(F.col("src").alias("node"), F.col("cluster_id")))
        new = (labels.select("node", "cluster_id").unionByName(neigh)
               .groupBy("node").agg(F.min("cluster_id").alias("cluster_id")))
        new = new.localCheckpoint()  # cut the iterative lineage
        changed = (new.withColumnRenamed("cluster_id", "new_cl")
                   .join(labels, "node")
                   .filter(F.col("new_cl") != F.col("cluster_id")).count())
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("node").alias("id"), "cluster_id")
