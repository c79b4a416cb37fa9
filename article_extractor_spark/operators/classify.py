"""Distributed quality-classifier TRAINING: integer batch perceptron.

`textstats.classifier_score` runs inference with fixed weights; this
module closes the loop by training a linear classifier as a Spark job.
The model is a batch perceptron over exact-integer features, chosen
deliberately: every quantity (margins, updates, weights, error counts)
is a bigint, so the driver's value-hash gate pins training EXACTLY —
no transcendental functions, no float drift between JVM and oracle.

The iteration IS the scalable shape for 100 TB training: one pass =
one aggregation (sum of y*x over currently-misclassified rows) with
map-side partial combine; the only driver state is the weight vector
(5 scalars).  T iterations = T scans of a cached feature projection —
the same pattern as kmeans_iter (similarity.py), where only k x dims
means ever cross the driver.

Features (per doc, all JVM-side expressions, no Python):
  x0 = 1 (bias), x1 = English-stopword hits, x2 = whitespace-token
  count, x3 = n_chars.  Label y = +1 if lang='en' else -1.
Update: misclassified(w) = {y * (w . x) <= 0};  w' = w + sum y*x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from article_extractor_spark.operators.textstats import LANG_WORDS


def _features(df: DataFrame, text_col: str = "text",
              lang_col: str = "lang") -> DataFrame:
    arr = ", ".join(f"'{w}'" for w in LANG_WORDS["en"])
    # empty-string tokens filtered out, same token definition as
    # classifier_score / bm25 / cms — '' from split('') is not a token
    toks = (f"filter(split(lower(coalesce({text_col}, '')), '\\\\s+'), "
            "t -> t <> '')")
    from article_extractor_spark.operators.dedup import ensure_min_partitions

    # single-split inputs serialize the tokenize projection on one core
    # (no-op on real multi-split tables)
    df = ensure_min_partitions(df)
    return df.select(
        F.expr(f"CASE WHEN {lang_col} = 'en' THEN 1 ELSE -1 END")
        .cast("bigint").alias("y"),
        F.lit(1).cast("bigint").alias("x0"),
        F.expr(f"size(filter({toks}, t -> array_contains(array({arr}), t)))")
        .cast("bigint").alias("x1"),
        F.expr(f"size({toks})").cast("bigint").alias("x2"),
        F.coalesce(F.col("n_chars"), F.lit(0)).cast("bigint").alias("x3"),
    )


def perceptron_train(df: DataFrame, n_iter: int = 3,
                     text_col: str = "text",
                     lang_col: str = "lang") -> DataFrame:
    """Train; emit one row per iteration: (iter, n_mis, w0..w3) where
    n_mis counts misclassifications under the PRE-update weights and
    w* are the weights AFTER the update.  All bigint, fully exact."""
    spark = df.sparkSession
    feats = _features(df, text_col=text_col, lang_col=lang_col).cache()
    w = [0, 0, 0, 0]
    out = []
    for t in range(n_iter):
        margin = (F.lit(w[0]) * F.col("x0") + F.lit(w[1]) * F.col("x1")
                  + F.lit(w[2]) * F.col("x2") + F.lit(w[3]) * F.col("x3")
                  ) * F.col("y")
        mis = margin <= 0
        aggs = [F.coalesce(F.sum(F.when(mis, F.col("y") * F.col(c))
                                 .otherwise(F.lit(0))), F.lit(0)).cast("bigint")
                for c in ("x0", "x1", "x2", "x3")]
        aggs.append(F.coalesce(
            F.sum(F.when(mis, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0)).cast("bigint"))
        r = feats.agg(*aggs).first()
        w = [w[i] + r[i] for i in range(4)]
        # exactness envelope: margins multiply w by features up to
        # ~n_chars (1e6-ish); |w| beyond 2^40 could overflow the int64
        # margin silently on the next pass, so fail loud instead
        if any(abs(x) >= 1 << 40 for x in w):
            raise OverflowError(
                "perceptron_train: weight magnitude exceeds the exact-"
                "int64 margin envelope (|w| >= 2^40); rescale features")
        out.append((t, int(r[4]), *[int(x) for x in w]))
    feats.unpersist()
    return spark.createDataFrame(
        out, "iter int, n_mis bigint, w0 bigint, w1 bigint, "
             "w2 bigint, w3 bigint")
