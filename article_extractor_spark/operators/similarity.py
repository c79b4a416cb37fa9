"""Similarity search over an embedding column (array<float>).

* :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set, JVM-side ``zip_with``/``aggregate`` dot products, one window
  per query.  This is the correctness baseline.
* :func:`lsh_topk` — random-hyperplane LSH: deterministic hash-derived
  planes bucket vectors by sign bits; candidates share the query's bucket
  (± optional hamming-1 probes).  The scale path: the self-join becomes an
  equi-join on bucket instead of a cartesian."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def _norm(c: str):
    return F.sqrt(F.aggregate(
        F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "q_id", qvec_col: str = "q_vec") -> DataFrame:
    """(q_id, vec_id, cosine, rank<=k); queries broadcast (small dim table)."""
    base = emb.select(
        F.col(id_col), F.col(vec_col).alias("v"), _norm(vec_col).alias("nv"))
    q = queries.select(
        F.col(qid_col), F.col(qvec_col).alias("qv"), _norm(qvec_col).alias("nq"))
    scored = (
        base.join(F.broadcast(q))
        .where(F.col(id_col) != F.col(qid_col))
        .withColumn("cosine", F.round(_dot("v", "qv") / (F.col("nv") * F.col("nq")), 4))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )


def hyperplane_bucket(emb: DataFrame, num_planes: int = 8,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-bit bucket id per vector.  Plane p's weight for dimension d is
    hash-derived ±1 (deterministic, no stored model):
    sign(md5(p:d) lowest bit).

    Entirely a single per-row projection — plane sums are computed with a
    two-arg ``transform`` (element, index) folded by ``aggregate`` over the
    embedding array.  Zero shuffle and zero row blowup; the earlier
    posexplode+groupBy formulation multiplied the row count by |dims|
    (768× at embedding scale) and forced a full exchange for a value that
    is a pure per-row function."""
    plane_sums = []
    for p in range(num_planes):
        weighted = F.expr(
            f"transform({vec_col}, (x, d) -> CAST(x AS DOUBLE) * "
            f"(CASE WHEN cast(conv(substr(md5(concat('{p}', ':', d)), 1, 15), 16, 10) as bigint) % 2 = 0 "
            f"THEN 1.0D ELSE -1.0D END))"
        )
        plane_sums.append(
            F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
            .alias(f"p{p}")
        )
    sums = emb.select(F.col(id_col), *plane_sums)
    bucket = None
    for p in range(num_planes):
        term = F.when(F.col(f"p{p}") > 0, F.lit(1 << p)).otherwise(0)
        bucket = term if bucket is None else bucket + term
    return sums.select(F.col(id_col), bucket.cast("int").alias("bucket"))


def ivf_assign(emb: DataFrame, num_centroids: int = 8,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization with deterministic seed centroids (the first
    ``num_centroids`` vectors by id): every vector is assigned to its
    nearest centroid by cosine.  At scale the seed set would come from a
    k-means pass; the inverted-list structure and probe logic are the
    same."""
    cents = emb.orderBy(id_col).limit(num_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec"),
        _norm(vec_col).alias("cn"))
    scored = (
        emb.select(F.col(id_col), F.col(vec_col).alias("v"), _norm(vec_col).alias("nv"))
        .join(F.broadcast(cents))
        .withColumn("sim", F.round(_dot("v", "cvec") / (F.col("nv") * F.col("cn")), 6))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(id_col, "centroid_id", F.col("sim").alias("centroid_sim"))
    )


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             num_centroids: int = 8, n_probes: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "q_id", qvec_col: str = "q_vec") -> DataFrame:
    """IVF ANN: score only vectors whose inverted list (centroid) is among
    the query's ``n_probes`` nearest centroids."""
    assign = ivf_assign(emb, num_centroids, id_col, vec_col)
    cents = emb.orderBy(id_col).limit(num_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec"),
        _norm(vec_col).alias("cn"))
    qscored = (
        queries.select(F.col(qid_col), F.col(qvec_col).alias("qv"),
                       _norm(qvec_col).alias("nq"))
        .join(F.broadcast(cents))
        .withColumn("sim", F.round(_dot("qv", "cvec") / (F.col("nq") * F.col("cn")), 6))
    )
    wq = Window.partitionBy(qid_col).orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc())
    probes = (
        qscored.withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= n_probes)
        .select(qid_col, "centroid_id", "qv", "nq")
    )
    base = emb.join(assign.select(id_col, "centroid_id"), id_col).select(
        F.col(id_col), F.col("centroid_id"), F.col(vec_col).alias("v"),
        _norm(vec_col).alias("nv"))
    scored = (
        base.join(F.broadcast(probes), "centroid_id")
        .where(F.col(id_col) != F.col(qid_col))
        .withColumn("cosine", F.round(_dot("v", "qv") / (F.col("nv") * F.col("nq")), 4))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             num_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", qid_col: str = "q_id",
             qvec_col: str = "q_vec") -> DataFrame:
    """ANN top-k: score only vectors in the query's hyperplane bucket."""
    buckets = hyperplane_bucket(emb, num_planes, id_col, vec_col)
    qbuckets = hyperplane_bucket(
        queries.select(F.col(qid_col).alias(id_col), F.col(qvec_col).alias(vec_col)),
        num_planes, id_col, vec_col,
    ).withColumnRenamed(id_col, qid_col)

    base = emb.join(buckets, id_col).select(
        F.col(id_col), F.col("bucket"), F.col(vec_col).alias("v"),
        _norm(vec_col).alias("nv"))
    q = queries.join(qbuckets, qid_col).select(
        F.col(qid_col), F.col("bucket"), F.col(qvec_col).alias("qv"),
        _norm(qvec_col).alias("nq"))
    scored = (
        base.join(F.broadcast(q), "bucket")
        .where(F.col(id_col) != F.col(qid_col))
        .withColumn("cosine", F.round(_dot("v", "qv") / (F.col("nv") * F.col("nq")), 4))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )
