"""Semantic deduplication over an embedding column (SemDeDup).

Own module (not :mod:`dedup`) deliberately: the verification-currency
manifest hashes each query's transitive module closure, so adding an
operator to ``dedup.py`` would spuriously invalidate all 17
dedup-dependent queries at once — more than the driver's 50-key window
can re-verify in one round.  A new operator in a new module invalidates
only itself.

No reference analogue (the reference is HTML-only); part of the
LLM-training-data operator surface alongside minhash/simhash dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from article_extractor_spark.operators.dedup import embedding_near_dups


def semantic_dedup(emb: DataFrame, num_centroids: int = 8, n_iter: int = 1,
                   threshold: float = 0.5, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): k-means-cluster the
    embedding space, compare vectors ONLY within their own cluster, and
    drop every vector that has a lower-id semantic near-duplicate
    (cosine >= threshold) in the same cluster.  Returns the surviving
    (id, centroid_id) rows — the deterministic "keep the lowest id of
    each near-dup pair" pruning rule, so the output is reproducible and
    SQL-oracleable (no dependence on the paper's random keep choice).

    Scale shape: the O(n^2) cosine comparison is confined to the
    block-diagonal of the cluster assignment — at a real deployment k
    grows with the corpus (k ~ n / target_cluster_size) so per-cluster
    pair counts stay bounded; assignment itself is a broadcast-argmax
    join (similarity.kmeans: only the k x dims centroid table crosses
    the driver) and the prune is one anti-join against the pair table.
    """
    from article_extractor_spark.operators.similarity import kmeans

    assign = kmeans(emb, num_centroids=num_centroids, n_iter=n_iter,
                    id_col=id_col, vec_col=vec_col)
    # cache: the assigned table feeds three consumers (pair a-side,
    # b-side, survivor anti-join) — without it the broadcast-argmax
    # assignment lineage (a full embedding scan) replays per consumer
    blocked = emb.select(id_col, vec_col).join(
        assign.select(id_col, "centroid_id"), id_col).cache()
    # the O(n²/k) within-cluster cosine work otherwise lands on exactly
    # k join tasks; when k is below the session's task slots, split each
    # cluster's triangle into chunk-pairs until the task count covers
    # the slots (s stays 1 the moment k >= slots — any at-scale k)
    slots = emb.sparkSession.sparkContext.defaultParallelism
    s = 1
    while num_centroids * s * (s + 1) // 2 < slots and s < 64:
        s += 1
    pairs = embedding_near_dups(blocked, id_col=id_col, vec_col=vec_col,
                                threshold=threshold,
                                block_col="centroid_id", n_chunks=s)
    drops = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return (blocked.join(drops, id_col, "left_anti")
            .select(F.col(id_col), F.col("centroid_id")))
