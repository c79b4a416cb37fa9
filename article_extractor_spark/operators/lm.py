"""Bigram language-model perplexity scoring (CCNet-style quality filter).

CCNet (Wenzek et al. 2020) buckets web documents by their perplexity
under a Wikipedia-trained KenLM; the canonical training-data quality
step between heuristic filters (Gopher/C4) and model-based classifiers.
This is the self-scored distributed form: a corpus-trained add-one-
smoothed bigram model, P(w2|w1) = (c(w1,w2) + 1) / (c(w1,.) + V),
scored as mean -log2 P per document (higher = more surprising = more
likely junk).  Companion to :func:`textstats.unigram_logprob` (same
token split, same 1e-6 quantize-before-sum exactness policy) with real
context sensitivity: scrambled word order keeps the unigram score but
raises the bigram one.

Own module (not ``textstats.py``) deliberately: the verification-
currency manifest hashes transitive module closures, and textstats has
~17 dependent driver queries — more than the 50-key window re-verifies
in one round (same isolation rationale as :mod:`semdedup`).

Scale shape: two token-keyed groupBys build the model (map-side
combine; the model tables are vocabulary-sized, AQE broadcasts them),
one join pipeline scores instances, one doc-keyed aggregate.  Only the
scalar vocabulary size crosses the driver.  No reference analogue (the
reference is HTML-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, avg_neg_log2p): per-document mean negative
    log2 probability of its adjacent word pairs under the corpus bigram
    model with add-one smoothing.  Documents with fewer than two tokens
    score (0, 0.0).

    Exactness: each instance's -log2 p = log2(c1 + V) - log2(c2 + 1) is
    a difference of log2's of exact integers, quantized to 1e-6 BEFORE
    summation (NOTES.md oracle policy); the final division is IEEE-exact
    on both engines, so the result is bit-identical to the DuckDB
    oracle regardless of partition order."""
    from article_extractor_spark.operators.dedup import ensure_min_partitions

    # single-split inputs serialize the tokenize/explode projections on
    # one core (no-op on real multi-split tables)
    base = ensure_min_partitions(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    words = base.select(
        id_col,
        F.expr("filter(split(lower(_t), '\\\\s+'), t -> t <> '')")
        .alias("w"))
    v_size = int(
        words.select(F.explode("w").alias("tok")).distinct().count() or 1)
    # guard size >= 2 BEFORE sequence(): sequence(0, -1) is descending
    bigr = words.where(F.size("w") >= 2).select(
        id_col,
        F.explode(F.expr(
            "transform(sequence(0, size(w) - 2), "
            "i -> struct(w[i] AS w1, w[i + 1] AS w2))")).alias("b"),
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    # cache: the bigram stream feeds the pair counts, the left-context
    # counts AND the scoring join — uncached, the corpus-wide explode
    # executes three times
    bigr = bigr.cache()
    bc = bigr.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    wt = bigr.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bigr.join(bc, ["w1", "w2"]).join(wt, "w1")
        .select(
            id_col,
            F.round((F.log2(F.col("c1") + F.lit(v_size))
                     - F.log2(F.col("c2") + F.lit(1)))
                    * F.lit(1e6)).cast("bigint").alias("q")))
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("q").cast("bigint").alias("sq"))
    return (
        base.select(id_col)
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            # unrounded IEEE division of exact operands (see
            # unigram_logprob: round(,6) diverges on exact halves)
            F.coalesce(F.col("sq").cast("double") / F.lit(1e6)
                       / F.col("n_bigrams"), F.lit(0.0))
            .alias("avg_neg_log2p"),
        )
    )
