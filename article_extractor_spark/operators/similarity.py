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


def _plane_weights(num_planes: int, dims: int) -> list[list[float]]:
    """±1 hyperplane weights, hash-derived per (plane, dim): weight is
    +1 iff the low bit of md5('p:d')[:15 hex] is 0 — the exact expression
    the DuckDB oracle and the previous in-plan formulation evaluate, now
    computed once on the driver instead of per row."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) % 2 == 0
            else -1.0
            for d in range(dims)
        ]
        for p in range(num_planes)
    ]


def hyperplane_bucket(emb: DataFrame, num_planes: int = 8,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      dims: int | None = None) -> DataFrame:
    """Sign-bit bucket id per vector.  Plane p's weight for dimension d is
    hash-derived ±1 (deterministic, no stored model):
    sign(md5(p:d) lowest bit).

    Entirely a single per-row projection: weights are baked as literal
    arrays (computed once on the driver) and each plane sum is a
    ``zip_with`` product folded by ``aggregate`` over the embedding array.
    Zero shuffle and zero row blowup — the earlier posexplode+groupBy
    formulation multiplied rows by |dims| (768× at embedding scale) and
    exchanged them for a value that is a pure per-row function; even the
    in-plan md5-per-element variant re-hashed |dims|×|planes| times per
    row.  Assumes a fixed embedding dimension (peeked from the first row
    when ``dims`` is not given), which is an invariant of any real
    embedding column."""
    if dims is None:
        row = emb.select(F.size(F.col(vec_col)).alias("_d")).first()
        dims = int(row["_d"]) if row is not None and row["_d"] is not None else 1
    ws = _plane_weights(num_planes, dims)
    plane_sums = [
        F.aggregate(
            F.zip_with(F.col(vec_col),
                       F.array(*[F.lit(w) for w in ws[p]]),
                       lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias(f"p{p}")
        for p in range(num_planes)
    ]
    sums = emb.select(F.col(id_col), *plane_sums)
    bucket = None
    for p in range(num_planes):
        term = F.when(F.col(f"p{p}") > 0, F.lit(1 << p)).otherwise(0)
        bucket = term if bucket is None else bucket + term
    return sums.select(F.col(id_col), bucket.cast("int").alias("bucket"))


def _seed_order(id_col: str):
    """Deterministic pseudo-random seed order: md5 of the id string.  The
    first-k-ids seeding it replaces is biased on a sorted-by-crawl corpus
    (all seeds from one shard); hash order is a uniform sample yet still
    reproducible by the DuckDB oracle (ORDER BY md5(CAST(id AS VARCHAR)))."""
    return [F.md5(F.col(id_col).cast("string")), F.col(id_col)]


def ivf_centroids(emb: DataFrame, num_centroids: int = 8,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic seed centroids — ``num_centroids`` vectors picked in
    md5(id) order (a reproducible pseudo-random sample, not the first ids)
    with precomputed norms.  At scale the seed set would come from a
    k-means pass; the inverted-list structure and probe logic are the
    same."""
    return emb.orderBy(*_seed_order(id_col)).limit(num_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec"),
        _norm(vec_col).alias("cn"))


def ivf_assign(emb: DataFrame, num_centroids: int = 8,
               id_col: str = "vec_id", vec_col: str = "embedding",
               cents: DataFrame | None = None) -> DataFrame:
    """IVF coarse quantization: every vector is assigned to its nearest
    centroid by cosine (pass precomputed ``cents`` to avoid re-deriving
    the seed set)."""
    if cents is None:
        cents = ivf_centroids(emb, num_centroids, id_col, vec_col)
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
             qid_col: str = "q_id", qvec_col: str = "q_vec",
             cents: DataFrame | None = None) -> DataFrame:
    """IVF ANN: score only vectors whose inverted list (centroid) is among
    the query's ``n_probes`` nearest centroids.  Pass
    ``cents=kmeans_centroids(...)`` to probe refined centroids."""
    if cents is None:
        cents = ivf_centroids(emb, num_centroids, id_col, vec_col)
    assign = ivf_assign(emb, num_centroids, id_col, vec_col, cents=cents)
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


def pq_encode(emb: DataFrame, num_subspaces: int = 8, codebook_size: int = 8,
              id_col: str = "vec_id", vec_col: str = "embedding",
              dims: int | None = None) -> DataFrame:
    """Product-quantization encoding: split each vector into
    ``num_subspaces`` contiguous subvectors; each subvector is encoded as
    the id of its nearest (L2) codebook entry.  Codebooks are
    deterministic seed sets — the first ``codebook_size`` vectors' own
    subvectors (a k-means pass refines them at scale; the encode path is
    identical).  Output: (id, codes array<int>, one code per subspace) —
    the 64-dim float vector compresses to 8 bytes.

    Scale shape: codebooks are tiny driver-side literals baked into ONE
    per-row projection (zero shuffle, zero join); ties break toward the
    lower code id via strict < comparison in declaration order.  Codebook
    seeds are picked in md5(id) order (see :func:`_seed_order`) so a
    sorted-by-crawl corpus doesn't bias the codebook to one shard."""
    if dims is None:
        row = emb.select(F.size(F.col(vec_col)).alias("_d")).first()
        dims = int(row["_d"]) if row is not None and row["_d"] is not None else num_subspaces
    sub_len = dims // num_subspaces
    seeds = [
        [float(x) for x in r[vec_col]]
        for r in emb.orderBy(*_seed_order(id_col)).limit(codebook_size).collect()
    ]

    def dist_expr(s: int, code: int):
        # exact L2^2 of subspace s against codebook entry `code`
        start = s * sub_len
        cb = seeds[code][start:start + sub_len]
        arr = F.array(*[F.lit(v) for v in cb])
        return F.aggregate(
            F.zip_with(
                F.slice(F.col(vec_col), start + 1, sub_len), arr,
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        )

    codes = []
    for s in range(num_subspaces):
        best_code = F.lit(0)
        best_dist = dist_expr(s, 0)
        for code in range(1, len(seeds)):
            d = dist_expr(s, code)
            improved = d < best_dist
            best_code = F.when(improved, F.lit(code)).otherwise(best_code)
            best_dist = F.when(improved, d).otherwise(best_dist)
        codes.append(best_code.cast("int"))
    return emb.select(F.col(id_col), F.array(*codes).alias("codes"))


def kmeans_iterate(emb: DataFrame, num_centroids: int = 8,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """One Lloyd iteration over the embedding table: assign every vector
    to its nearest seed centroid (cosine, same assignment as
    :func:`ivf_assign`), then recompute each centroid as the member mean —
    the "k-means pass" the IVF docstring defers to at scale.

    Returns (centroid_id, dim, mean_val, n_members) rows.

    Scale shape: assignment is a broadcast join + per-row argmax; the
    recompute explodes members to (centroid, dim) and aggregates with
    map-side combine — |docs|×|dims| rows through ONE shuffle keyed on
    (centroid, dim), the standard Spark k-means layout.  Sums are exact
    (1e-6-quantized integers; oracle policy in NOTES.md) so the means are
    bit-identical to the DuckDB oracle regardless of partition order."""
    cents = ivf_centroids(emb, num_centroids, id_col, vec_col)
    assign = ivf_assign(emb, num_centroids, id_col, vec_col, cents=cents)
    return _exact_member_means(emb, assign, id_col, vec_col,
                               with_counts=True)


def _exact_member_means(emb: DataFrame, assign: DataFrame,
                        id_col: str, vec_col: str,
                        with_counts: bool = False) -> DataFrame:
    """(centroid_id, dim, mean_val[, n_members]): exact quantized
    per-dimension member means (shared by kmeans_iterate and the full
    kmeans loop)."""
    members = emb.join(assign.select(id_col, "centroid_id"), id_col)
    exploded = members.select(
        "centroid_id", F.posexplode(F.col(vec_col)).alias("dim", "x")
    ).withColumn("xq", F.round(F.col("x").cast("double") * 1e6).cast("bigint"))
    n = F.count(F.lit(1))
    aggs = [(F.sum("xq").cast("double") / F.lit(1e6) / n).alias("mean_val")]
    if with_counts:
        aggs.append(n.alias("n_members"))
    return exploded.groupBy("centroid_id", "dim").agg(*aggs)


def kmeans(emb: DataFrame, num_centroids: int = 8, n_iter: int = 1,
           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Full Lloyd loop: seed centroids -> n_iter rounds of (assign by
    cosine, recompute exact member means) -> final assignment.

    Driver-coordinated iteration, the standard Spark k-means shape: each
    round is one broadcast-join assignment plus one (centroid, dim)-keyed
    aggregate; only the k x dims mean table (a few KB) is collected to
    the driver between rounds.  All means are exact (1e-6-quantized
    integer sums), so every round is bit-identical to the SQL oracle's
    CTE chain; clusters that lose all members drop out, exactly as in
    the oracle.  Returns (id, centroid_id, centroid_sim)."""
    cents = kmeans_centroids(emb, num_centroids, n_iter, id_col, vec_col)
    return ivf_assign(emb, num_centroids, id_col, vec_col, cents=cents)


def kmeans_centroids(emb: DataFrame, num_centroids: int = 8, n_iter: int = 1,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """The Lloyd refinement loop alone: (centroid_id, cvec, cn) after
    ``n_iter`` rounds — feed into :func:`ivf_topk` so the IVF inverted
    lists probe REFINED centroids instead of raw seeds (closes the
    seeds-only asterisk on the ANN query path)."""
    spark = emb.sparkSession
    cents = ivf_centroids(emb, num_centroids, id_col, vec_col)
    for _ in range(n_iter):
        assign = ivf_assign(emb, num_centroids, id_col, vec_col, cents=cents)
        rows = _exact_member_means(emb, assign, id_col, vec_col).collect()
        bycid: dict[int, dict[int, float]] = {}
        for r in rows:
            bycid.setdefault(r["centroid_id"], {})[r["dim"]] = r["mean_val"]
        new = [
            (cid, [vals[d] for d in range(len(vals))])
            for cid, vals in sorted(bycid.items())
        ]
        cents = spark.createDataFrame(
            new, "centroid_id long, cvec array<double>"
        ).select("centroid_id", "cvec", _norm("cvec").alias("cn"))
    return cents


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             num_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", qid_col: str = "q_id",
             qvec_col: str = "q_vec", multiprobe: bool = True) -> DataFrame:
    """ANN top-k: score only vectors in the query's hyperplane bucket —
    plus, with ``multiprobe`` (default), its ``num_planes`` hamming-1
    neighbor buckets (one sign bit flipped).  A near-boundary query whose
    true neighbors landed one sign flip away is recovered by the probes.

    Scale shape: the explode is QUERY-side only (fan-out = (1+planes)×|Q|,
    broadcast-sized); each corpus vector still lives in exactly one bucket,
    so a (query, vector) pair matches at most one probe — no dedup needed
    and the corpus-side join stays a single bucket equi-join."""
    buckets = hyperplane_bucket(emb, num_planes, id_col, vec_col)
    qbuckets = hyperplane_bucket(
        queries.select(F.col(qid_col).alias(id_col), F.col(qvec_col).alias(vec_col)),
        num_planes, id_col, vec_col,
    ).withColumnRenamed(id_col, qid_col)
    if multiprobe:
        probe_set = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(num_planes)],
        )
        qbuckets = qbuckets.select(
            qid_col, F.explode(probe_set).alias("bucket"))

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


def random_projection(emb: DataFrame, out_dims: int = 8,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      dims: int | None = None) -> DataFrame:
    """Johnson-Lindenstrauss embedding compression via an Achlioptas-style
    ±1 projection: out[j] = sum_d x[d] * sign(md5(j:d)) / sqrt(out_dims).
    The matrix is hash-derived (no stored model, reproducible anywhere —
    the same derivation as :func:`hyperplane_bucket`'s planes) and baked
    into ONE per-row projection: zero shuffle, zero join, so compressing
    a 10^12-row embedding table is a single map stage.

    Distances are preserved in expectation (JL lemma); downstream ANN /
    clustering runs on the compressed vectors at out_dims/dims the cost.

    Exactness: each input component is 1e-6-quantized BEFORE the signed
    integer sum (NOTES.md oracle policy) — a double-sum's last bits depend
    on summation order, which the oracle engine does not share."""
    if dims is None:
        row = emb.select(F.size(F.col(vec_col)).alias("_d")).first()
        dims = int(row["_d"]) if row is not None and row["_d"] is not None else 1
    ws = _plane_weights(out_dims, dims)
    scale = 1.0 / (out_dims ** 0.5)
    # no final round: the quantized integer sum is identical on both
    # sides, and /1e6 * scale is the same two IEEE ops — bit-identical —
    # while round(, 6) HITS half-ulp ties that Spark (HALF_UP) and the
    # oracle engine round differently
    comps = [
        (F.aggregate(
            F.zip_with(F.col(vec_col),
                       F.array(*[F.lit(w) for w in ws[j]]),
                       lambda x, w: F.round(x.cast("double") * F.lit(1e6))
                       .cast("long") * w.cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        ).cast("double") / F.lit(1e6) * F.lit(scale)).alias(f"c{j}")
        for j in range(out_dims)
    ]
    return emb.select(F.col(id_col), *comps)


def int8_quantize(emb: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization — the storage/transport
    form ANN services ship embeddings in (4x smaller than float32, SIMD
    dot products downstream): q[d] = round(x[d] * 127 / amax) with
    amax = max|x[d]|, zero vectors map to all-zero codes.

    Integer-exact contract (oracle policy): inputs are 1e-6-quantized
    first (the corpus embeddings are such values already), amax and the
    codes are then pure integer arithmetic — q[d] = round-half-away of
    (xq[d] * 127) / amaxq computed as exact bigint division with
    explicit half-adjustment, so Spark and DuckDB agree bit-for-bit.
    Emits (vec_id, amax_micro, codes array<int>, sq_err_scaled) where
    sq_err_scaled = sum((xq*127 - q*amaxq)^2) — the exact integer
    reconstruction-error numerator (denominator (127*amaxq)^2 is
    derivable), so quantization quality itself is value-checked.

    Zero shuffle: one projection over the embedding table."""
    xq = (f"transform({vec_col}, "
          "v -> cast(round(cast(v as double) * 1000000) as bigint))")
    # round-half-away integer division: (2*n + d) div (2*d) for n>=0,
    # negated for n<0 (DuckDB mirrors with the same expression)
    q = ("transform(_xq, v -> cast(CASE WHEN _amax = 0 THEN 0 "
         "WHEN v >= 0 THEN (2 * v * 127 + _amax) div (2 * _amax) "
         "ELSE -((2 * (-v) * 127 + _amax) div (2 * _amax)) END as int))")
    err = ("aggregate(zip_with(_xq, _codes, (x, c) -> "
           "(x * 127 - cast(c as bigint) * _amax) * "
           "(x * 127 - cast(c as bigint) * _amax)), "
           "cast(0 as bigint), (acc, v) -> acc + v)")
    return (emb
            .withColumn("_xq", F.expr(xq))
            .withColumn("_amax", F.expr("array_max(transform(_xq, v -> abs(v)))"))
            .withColumn("_codes", F.expr(q))
            .select(F.col(id_col),
                    F.col("_amax").cast("bigint").alias("amax_micro"),
                    F.col("_codes").alias("codes"),
                    F.expr(err).cast("bigint").alias("sq_err_scaled")))
