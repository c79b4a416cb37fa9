"""DSIR: data selection by hashed-n-gram importance resampling.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling") select pretraining documents by the log-likelihood ratio
of a TARGET distribution vs the RAW pool, both modeled as bag-of-
hashed-n-grams multinomials.  This is that estimator distributed: the
target here is the corpus' own lang='en' slice (self-contained — no
external model files, same spirit as the self-scored CCNet filters in
`lm.py`/`textstats.py`), the features are md5-hashed word bigrams in
``N_BUCKETS`` buckets, both models add-one smoothed.

Exactness: the per-bucket log-ratio ln(pt/pr) is expanded to
ln(ct+1) - ln(Tt+B) - ln(cr+1) + ln(Tr+B) — four ln's of exact
integers in a fixed order — and quantized to 1e-6 micro-units per
bucket BEFORE the per-document summation (NOTES.md oracle policy), so
the emitted weight is an exact bigint the DuckDB oracle reproduces.

100 TB shape: one bigram explode -> bucket hash (pure expression), one
groupBy to the FIXED 256-row bucket table (two conditional counts,
map-side combine; totals ride along — nothing corpus-sized crosses the
driver), a broadcast join back to the instances, one doc-keyed sum.
No reference analogue (the reference is HTML-only extraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 256

# md5-derived bucket, the engine's deterministic-hash idiom (cms.py,
# dedup.py): first 15 hex chars -> bigint -> mod buckets
_BUCKET = ("cast(conv(substr(md5(concat('dsir:', w1, ' ', w2)), 1, 15), "
           "16, 10) as bigint) % {b}")


def dsir_weights(df: DataFrame, target_lang: str = "en",
                 n_buckets: int = N_BUCKETS, text_col: str = "text",
                 id_col: str = "doc_id", lang_col: str = "lang") -> DataFrame:
    """(doc_id, n_grams, logweight_micro): per-document importance
    weight ln P_target(doc)/P_raw(doc) in exact 1e-6 micro-units under
    the hashed-bigram models; docs with < 2 tokens weigh (0, 0)."""
    from article_extractor_spark.operators.dedup import ensure_min_partitions

    # single-split inputs serialize the bigram explode + md5 projection
    # on one core (no-op on real multi-split tables)
    base = ensure_min_partitions(
        df.select(id_col, lang_col, text_col)).select(
        F.col(id_col),
        (F.col(lang_col) == F.lit(target_lang)).alias("is_t"),
        F.expr(f"filter(split(lower(coalesce({text_col}, '')), '\\\\s+'), "
               "t -> t <> '')").alias("w"))
    grams = base.where(F.size("w") >= 2).select(
        id_col, "is_t",
        F.explode(F.expr(
            "transform(sequence(0, size(w) - 2), "
            "i -> struct(w[i] AS w1, w[i + 1] AS w2))")).alias("g"),
    ).select(id_col, "is_t",
             F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    # cache: the bucketed bigram stream feeds the model-count aggregate
    # AND the per-doc scoring join — uncached, the corpus-wide explode +
    # md5 pass executes twice
    grams = grams.select(id_col, "is_t",
                         F.expr(_BUCKET.format(b=n_buckets)).alias("bucket")
                         ).cache()

    # localCheckpoint: the <= n_buckets-row table feeds the totals
    # collect AND the broadcast join below — without it the corpus-wide
    # bigram explode + md5 pass runs three times instead of twice
    buckets = grams.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("bigint")
        .alias("ct"),
        F.count(F.lit(1)).cast("bigint").alias("cr")).localCheckpoint()
    tot = buckets.agg(F.sum("ct").cast("bigint"),
                      F.sum("cr").cast("bigint")).collect()[0]
    tt, tr = int(tot[0] or 0), int(tot[1] or 0)

    lr = (F.log(F.col("ct") + F.lit(1.0))
          - F.log(F.lit(float(tt + n_buckets)))
          - F.log(F.col("cr") + F.lit(1.0))
          + F.log(F.lit(float(tr + n_buckets))))
    scored = (grams.join(F.broadcast(
        buckets.select("bucket",
                       F.round(lr * F.lit(1e6)).cast("bigint").alias("lrq"))),
        "bucket")
        .groupBy(id_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("lrq").cast("bigint").alias("logweight_micro")))
    return (df.select(id_col).join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_grams", F.lit(0)).cast("bigint")
                    .alias("n_grams"),
                    F.coalesce("logweight_micro", F.lit(0)).cast("bigint")
                    .alias("logweight_micro")))
