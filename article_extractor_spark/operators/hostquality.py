"""Host-level quality filtering — the RefinedWeb/C4-style curation step
where DOMAIN aggregates gate documents: a host whose pages are mostly
junk drops entirely (boilerplate farms, link spam, machine-translated
mills), even though a few individual pages might pass a per-doc filter.

Composition of frozen pieces in a NEW file: per-doc features from
`textstats.quality_score`, host extraction from `weburl.normalize_urls`.
Aggregates are exact integers (micro-quantized sums, the repo-wide
quantize-before-sum discipline) so thresholds are reproducible bit-for-
bit in any engine.

100 TB shape: one host-keyed shuffle with map-side combine for the
aggregate (hosts << docs), then the verdict table — thousands of rows —
broadcasts back onto the corpus as an equi-join; no second corpus
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def host_expr(url_col: str = "url"):
    """The same host rule as `weburl.normalize_urls` (lowercased,
    leading ``www.`` and trailing dot dropped, port stripped) as a bare
    column expression, so callers can KEEP their other columns —
    normalize_urls projects everything else away.  Row-parity with
    normalize_urls' ``host`` is pinned by
    tests/test_hostquality.py::test_host_expr_matches_normalize_urls."""
    u = F.coalesce(F.col(url_col), F.lit(""))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    return F.regexp_replace(
        F.regexp_replace(F.regexp_extract(hostport, r"^([^:]*)", 1),
                         r"^www\.", ""),
        r"\.$", "")


def host_quality(docs: DataFrame, url_col: str = "url",
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-host: page count, exact micro-quantized quality sum, mean
    quality (micro-units, true integer division via ``div`` —
    deterministic at any magnitude, unlike double division which loses
    integer exactness past 2^53), low-quality page count (quality < 0.2).

    ONE projection over docs (host + quality features are all row-local
    expressions; `quality_score` is reused with the host column standing
    in as its id column) straight into the host-keyed groupBy — no
    doc-keyed join, so the only shuffle is the host aggregation."""
    from article_extractor_spark.operators.textstats import quality_score

    with_host = docs.select(host_expr(url_col).alias("__host"),
                            F.col(text_col))
    q = quality_score(with_host, text_col=text_col, id_col="__host")
    micro_q = F.round(F.col("quality") * MICRO).cast("long")
    return q.groupBy(F.col("__host").alias("host")).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(micro_q).alias("quality_micro_sum"),
        F.sum(F.when(micro_q < int(0.2 * MICRO), 1).otherwise(0))
        .alias("n_low_quality"),
    ).withColumn(
        "mean_quality_micro",
        F.expr("quality_micro_sum div n_pages"))


def filter_by_host_quality(docs: DataFrame,
                           url_col: str = "url",
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           min_mean_quality: float = 0.3,
                           max_low_quality_frac: float = 0.5,
                           min_pages: int = 1) -> DataFrame:
    """Keep documents whose HOST passes both gates: mean quality >=
    ``min_mean_quality`` and low-quality fraction <= ``max_low_quality_frac``
    (hosts with fewer than ``min_pages`` pages are kept — not enough
    evidence to damn a domain).  Documents whose URL yields no host
    (relative/garbage/null urls -> '') are NEVER host-gated: they are
    unrelated rows, not a domain, and judging them as one would drop
    every schemeless-URL page on the pseudo-host's aggregate.  Fraction
    compare is integer cross-multiplied (no float division)."""
    hq = host_quality(docs, url_col, text_col, id_col)
    bad = hq.filter(
        (F.col("host") != "")
        & (F.col("n_pages") >= min_pages)
        & ((F.col("mean_quality_micro") < int(min_mean_quality * MICRO))
           | (F.col("n_low_quality") * MICRO
              > F.col("n_pages") * int(max_low_quality_frac * MICRO)))
    ).select("host")

    return (docs.withColumn("__host", host_expr(url_col))
            .join(F.broadcast(bad),
                  F.col("__host") == bad.host, "left_anti")
            .drop("__host"))
