"""BM25 full-text retrieval over the corpus (Robertson & Zaragoza 2009).

Top-k document retrieval for a literal term query under Lucene-shaped
BM25: idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (always positive), tf
normalization tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)).  The missing
retrieval primitive next to `textstats.tfidf_keywords` (which ranks
terms WITHIN a doc; this ranks DOCS for a query) and the ANN family
(which retrieves by embedding; this retrieves lexically).

Exactness: per-(doc, term) contributions are quantized to 1e-6
micro-units BEFORE summation (the NOTES.md oracle policy used by
unigram/bigram_logprob and tfidf_keywords) and the emitted score stays
an integer — bit-identical regardless of partition order, and the
DuckDB oracle replays the identical double expression tree.

100 TB shape: one token explode feeds (a) per-doc lengths via a
doc-keyed groupBy and (b) the query-filtered postings; df is a groupBy
over the handful of query terms (broadcastable by construction), the
scored postings aggregate doc-keyed with map-side combine, and the
global top-k is TakeOrderedAndProject (orderBy + limit — no full sort,
no window).  Corpus scalars (N, total token count) are the only driver
state.  No reference analogue (the reference is HTML-only extraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, matched_terms, score_micro): the top-``k`` documents for
    ``query_terms`` by BM25, score in exact 1e-6 micro-units (bigint),
    ties broken by lowest doc_id.  Only docs matching >= 1 term rank.

    ONE corpus-scan plan: because the query terms are a small literal
    list, per-doc tf for every term rides the same doc-keyed groupBy
    that computes dl (conditional sums, map-side combine) — no postings
    explode, no tf/df/dl joins.  The df counts and corpus totals are
    scalar aggregates of that compact per-doc table; idf becomes a
    constant-folded literal expression, and the global top-k is
    TakeOrderedAndProject."""
    from article_extractor_spark.operators.dedup import ensure_min_partitions

    # single-split inputs serialize the tokenize+explode groupBy on one
    # core (no-op on real multi-split tables)
    base = ensure_min_partitions(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    toks = base.select(
        id_col,
        F.explode(F.expr("filter(split(lower(_t), '\\\\s+'), t -> t <> '')"))
        .alias("tok"))
    # dup terms would double-count their contribution; empty queries
    # have no defined ranking
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    # localCheckpoint: the compact one-row-per-doc table feeds both the
    # scalar stats collect and the returned scoring plan — without it
    # the corpus-wide tokenize groupBy runs twice (quantiles.py idiom)
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).cast("bigint")
          .alias(f"tf_{i}") for i, t in enumerate(terms)]).localCheckpoint()
    # corpus scalars: every doc counts toward N (empty docs have dl 0
    # and no per_doc row); df per term from the compact per-doc table
    n_docs = int(base.count() or 1)
    stats = per_doc.agg(
        F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint"),
        *[F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
          .cast("bigint") for i in range(len(terms))]).collect()[0]
    total = int(stats[0] or 0)
    dfs = [int(stats[1 + i] or 0) for i in range(len(terms))]

    # identical double expression tree on both engines (see oracle):
    # avgdl division first, then the tf normalization, then ln-idf
    avgdl = F.lit(float(total)) / F.lit(float(n_docs))
    contribs = []
    for i, dfc in enumerate(dfs):
        tf = F.col(f"tf_{i}")
        idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.lit(dfc)
                                  + F.lit(0.5)) / (F.lit(dfc) + F.lit(0.5)))
        tfn = (tf * F.lit(K1 + 1.0)) / (
            tf + F.lit(K1) * (F.lit(1.0 - B)
                              + F.lit(B) * F.col("dl") / avgdl))
        contribs.append(
            F.when(tf > 0, F.round(idf * tfn * F.lit(1e6)).cast("bigint"))
            .otherwise(F.lit(0)))
    matched = sum((F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)
                   for i in range(len(terms))), F.lit(0))
    score = sum(contribs[1:], contribs[0])
    return (per_doc
            .select(id_col, matched.cast("int").alias("matched_terms"),
                    score.cast("bigint").alias("score_micro"))
            .where(F.col("matched_terms") > 0)
            .orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
            .limit(k))
