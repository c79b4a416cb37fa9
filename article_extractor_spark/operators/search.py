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
    ties broken by lowest doc_id.  Only docs matching >= 1 term rank."""
    base = df.select(F.col(id_col),
                     F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    toks = base.select(
        id_col,
        F.explode(F.expr("filter(split(lower(_t), '\\\\s+'), t -> t <> '')"))
        .alias("tok"))
    # corpus scalars: every doc counts toward avgdl (empty docs -> dl 0)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs = int(base.count() or 1)
    total = dl.agg(F.sum("dl").cast("bigint")).collect()[0][0]
    total = int(total or 0)

    terms = [t.lower() for t in query_terms]
    hits = toks.where(F.col("tok").isin(terms))
    tf = hits.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    # identical double expression tree on both engines (see oracle):
    # avgdl division first, then the tf normalization, then ln-idf
    avgdl = F.lit(float(total)) / F.lit(float(n_docs))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df")
                              + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    tfn = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * F.col("dl") / avgdl))
    scored = (tf.join(F.broadcast(dfq), "tok")
              .join(dl, id_col)
              .select(id_col,
                      F.round(idf * tfn * F.lit(1e6)).cast("bigint")
                      .alias("q")))
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("matched_terms"),
        F.sum("q").cast("bigint").alias("score_micro"))
    return (per_doc
            .orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
            .limit(k))
