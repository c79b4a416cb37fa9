"""Hashed-feature classifier training — train/infer feature parity.

``textstats.classifier_score`` infers over hashed bag-of-words
features (token -> ``int(md5(token)[:6], 16) % CLF_DIM`` -> per-bucket
integer weight), while ``classify.perceptron_train`` trains over 4
interpretable features — two DIFFERENT feature spaces, so a trained
model could not be dropped into the inference path.  This module
closes that loop (NOTES.md round-6 lever #1): a batch perceptron
trained in EXACTLY the inference feature space, plus a parameterized
twin of the inference expression, so ``score_with_weights(df,
trained)`` is the existing quality-filter with a model the engine
trained itself.

Exactness policy (same as ``classify.perceptron_train``): every
quantity — bucket counts, margins, per-bucket updates, weights,
misclassification counts — is a bigint, so the pure-Python oracle in
``tests/test_hashclf.py`` pins training trace and trained-model scores
bit-for-bit; the one float, ``clf_score``, is a single IEEE division
of exact integer operands (NOTES.md float policy).

100 TB shape:

* The hashed count table is built ONCE — one explode + two groupBys,
  then cached as a per-doc ``map<int,bigint>`` (sparse: at most
  ``dim`` entries per doc regardless of doc length).
* Each training iteration is in-row margin evaluation (the weight
  vector is a literal array baked into the plan, exactly like the
  inference path) followed by ONE aggregation whose output is at most
  ``dim + 1`` rows after map-side combine — the sentinel entry
  ``(-1, y)`` folds the misclassification count into the same pass
  (``sum(y * y) = n_mis``), so an iteration is a single scan of the
  cached projection, no doc-keyed shuffle.
* Driver state is the ``dim``-vector of weights (64 bigints here) —
  the kmeans_iter pattern (similarity.py), where only k x dims
  scalars ever cross the driver per pass.

NOT registered as a driver query this round: the verification window
is saturated (NOTES.md round-5 close-out — all 50 window slots hold
keys whose sources changed this round; evicting one would recreate the
stale-verification defect class).  Verification is pytest-only:
an independent pure-Python training oracle, a row-identity pin of
``score_with_weights`` against ``classifier_score``, and a trained
drop-in end-to-end check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from article_extractor_spark.operators.textstats import CLF_DIM

# the ONE token definition this feature space shares with
# classifier_score / bm25 / cms — '' from split('') is not a token
_TOKS = "filter(split(lower(coalesce({col}, '')), '\\\\s+'), t -> t <> '')"

# the ONE bucket hash shared with classifier_score (textstats.py):
# first 6 hex digits of md5 -> int -> mod dim
_BUCKET = "cast(cast(conv(substr(md5({tok}), 1, 6), 16, 10) as int) % {dim} as int)"


def hashed_counts(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", lang_col: str = "lang",
                  dim: int = CLF_DIM) -> DataFrame:
    """Per-doc sparse hashed feature vector: (doc_id, y, fm) where
    ``fm`` maps bucket -> token count (bigint) and y = +1 for lang='en'
    else -1.  Zero-token docs keep an EMPTY map (explode_outer) so the
    perceptron sees them — their margin is exactly 0, i.e. always
    misclassified, matching the pure-Python oracle."""
    toks = _TOKS.format(col=text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"CASE WHEN {lang_col} = 'en' THEN 1 ELSE -1 END")
        .cast("bigint").alias("y"),
        F.explode_outer(F.expr(toks)).alias("tok"),
    )
    per_bucket = (
        base.groupBy(
            "doc_id", "y",
            F.when(F.col("tok").isNotNull(),
                   F.expr(_BUCKET.format(tok="tok", dim=dim))).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    return per_bucket.groupBy("doc_id", "y").agg(
        F.map_from_entries(
            F.filter(F.collect_list(F.struct("bucket", "cnt")),
                     lambda s: s.bucket.isNotNull())).alias("fm"))


def _w_array(w: list[int]) -> str:
    return "array(" + ", ".join(f"{x}L" for x in w) + ")"


def _margin_expr(w: list[int]) -> str:
    """y * (w . x) over the sparse map — in-row, weights as a literal
    array exactly like the inference path bakes its weight table."""
    return (f"y * aggregate(map_entries(fm), 0L, (acc, e) -> "
            f"acc + element_at({_w_array(w)}, e.key + 1) * e.value)")


def perceptron_hashed(df: DataFrame, n_iter: int = 3,
                      dim: int = CLF_DIM,
                      text_col: str = "text", id_col: str = "doc_id",
                      lang_col: str = "lang",
                      init: list[int] | None = None) -> DataFrame:
    """Train; emit one row per (iteration, bucket): (iter, n_mis,
    bucket, w) where n_mis counts misclassifications under the
    PRE-update weights and w is bucket's weight AFTER the update.
    All bigint, fully exact.  ``init`` exists for the overflow-guard
    test; production training starts at zero."""
    spark = df.sparkSession
    feats = hashed_counts(df, text_col=text_col, id_col=id_col,
                          lang_col=lang_col, dim=dim).cache()
    w = list(init) if init is not None else [0] * dim
    if len(w) != dim:
        raise ValueError(f"init must have {dim} weights, got {len(w)}")
    out: list[tuple[int, int, int, int]] = []
    for t in range(n_iter):
        mis = feats.where(F.expr(_margin_expr(w)) <= 0)
        # sentinel entry (-1, y): after the y* multiply its per-doc
        # contribution is y*y = 1, so the bucket=-1 row of the SAME
        # single aggregation is exactly n_mis — one pass per iteration
        ent = ("concat(map_entries(fm), "
               "array(named_struct('key', cast(-1 as int), 'value', y)))")
        rows = (mis.select("y", F.explode(F.expr(ent)).alias("e"))
                .groupBy(F.col("e.key").alias("bucket"))
                .agg(F.sum(F.col("y") * F.col("e.value"))
                     .cast("bigint").alias("delta"))
                .collect())
        n_mis = 0
        for r in rows:
            if r["bucket"] == -1:
                n_mis = int(r["delta"])
            else:
                w[r["bucket"]] += int(r["delta"])
        # same exact-int64 margin envelope as classify.perceptron_train
        if any(abs(x) >= 1 << 40 for x in w):
            feats.unpersist()
            raise OverflowError(
                "perceptron_hashed: weight magnitude exceeds the exact-"
                "int64 margin envelope (|w| >= 2^40); rescale features")
        out.extend((t, n_mis, b, w[b]) for b in range(dim))
    feats.unpersist()
    return spark.createDataFrame(
        out, "iter int, n_mis bigint, bucket int, w bigint")


def score_with_weights(df: DataFrame, weights: list[int],
                       scale: float = 100.0, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """``textstats.classifier_score`` with the weight table and score
    scale as parameters — the drop-in inference path for a model from
    :func:`perceptron_hashed`.  With ``weights=CLF_WEIGHTS,
    scale=100.0`` this is row-identical to ``classifier_score``
    (pinned by tests/test_hashclf.py); the expression shape (literal
    array in-plan, in-row aggregate, zero shuffles) is the same."""
    dim = len(weights)
    w_lit = ", ".join(str(w) for w in weights)
    toks = _TOKS.format(col="_t")
    base = df.select(F.col(id_col),
                     F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    scored = base.select(
        F.col(id_col),
        F.size(F.expr(toks)).cast("bigint").alias("n_tokens"),
        F.expr(
            f"aggregate({toks}, 0L, (acc, t) -> acc + "
            f"element_at(array({w_lit}), "
            + _BUCKET.format(tok="t", dim=dim) + " + 1))"
        ).cast("bigint").alias("_sq"),
    )
    score = F.when(
        F.col("n_tokens") > 0,
        F.col("_sq").cast("double") / (F.lit(scale) * F.col("n_tokens"))
    ).otherwise(F.lit(0.0))
    return scored.select(
        F.col(id_col), F.col("n_tokens"),
        score.alias("clf_score"),
        (score > F.lit(0.0)).cast("int").alias("keep"),
    )
