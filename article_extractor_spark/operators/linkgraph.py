"""Web link-graph operators: outlink extraction from raw HTML and a
quantized host-level PageRank.

The standard crawl-curation pair — build the host graph from anchors,
rank hosts, use rank as a crawl-priority / quality prior (the reference
engine extracts per-page content only; the graph view is the corpus-level
complement a 100 TB pipeline needs).

Scale shapes:

* :func:`extract_outlinks` is one regexp projection + generator per page
  (no shuffle) followed by a single (src, dst) groupBy — linear in pages.
* :func:`host_pagerank` is the classic distributed PageRank loop: per
  iteration ONE join of the rank vector against the edge list (both keyed
  on the src host — co-partitioned after the first shuffle) and ONE groupBy
  on dst.  The rank vector has |hosts| rows, never |pages|.

Exactness (NOTES.md oracle float policy): ranks live in integer
micro-units.  Per-edge contribution is ``(r * w) DIV w_out`` and the damped
update is ``150000 + (85 * S) DIV 100`` — every step is exact bigint
arithmetic, so results are bit-identical regardless of partition order and
the DuckDB oracle can unroll the same iterations in SQL.  (Integer
truncation leaks a little rank mass — documented, deterministic.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"


def extract_outlinks(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """Host-level weighted edge list from anchor hrefs in raw HTML.

    Emits ``(src_host, dst_host, n_links)`` for absolute http(s) links
    whose target host differs from the source host (self-loops carry no
    ranking signal and are dropped, as in standard host-graph builds).
    ``html`` may be binary (decoded as UTF-8) or string."""
    is_bin = dict(pages.dtypes)[html_col] == "binary"
    html_str = (F.decode(F.col(html_col), "UTF-8") if is_bin
                else F.col(html_col).cast("string"))
    base = pages.select(
        F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
        .alias("src_host"),
        html_str.alias("_html"),
    )
    links = base.select(
        "src_host",
        F.explode(
            F.expr("regexp_extract_all(_html, 'href=\"([^\"]+)\"', 1)")
        ).alias("_href"),
    )
    dst = F.lower(F.regexp_extract(F.col("_href"), _HOST_RE, 1))
    return (
        links.where(F.col("_href").rlike(r"^https?://"))
        .select("src_host", dst.alias("dst_host"))
        .where((F.col("dst_host") != "") & (F.col("dst_host") != F.col("src_host")))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_links"))
    )


def host_pagerank(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Quantized damped PageRank (d = 0.85) over a weighted host edge
    list, run for a fixed number of iterations.

    Nodes are all hosts appearing on either side.  r0 = 1e6 micro-units
    for every node; each iteration:

        contrib(u->v) = (r(u) * w(u,v)) DIV w_out(u)
        r'(v)         = 150000 + (85 * sum(contrib)) DIV 100

    Dangling hosts (no outlinks) keep receiving and simply do not emit —
    their mass leak is the standard simplification and is identical in
    the SQL oracle.  The loop is a driver-side ``for`` over a |hosts|-row
    DataFrame; each pass adds one join + one groupBy to the plan, which
    stays shallow for the handful of iterations PageRank needs."""
    edges = edges.cache()
    out_w = edges.groupBy("src_host").agg(
        F.sum("n_links").cast("bigint").alias("w_out"))
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .cache()
    )
    ranks = nodes.withColumn("r", F.lit(1_000_000).cast("bigint"))
    ew = edges.join(out_w, "src_host").cache()
    for _ in range(iterations):
        contrib = (
            ew.join(ranks.withColumnRenamed("host", "src_host"), "src_host")
            .select(
                F.col("dst_host").alias("host"),
                F.expr("CAST((r * n_links) DIV w_out AS BIGINT)").alias("_c"),
            )
            .groupBy("host")
            .agg(F.sum("_c").cast("bigint").alias("_s"))
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .select(
                "host",
                (F.lit(150_000) +
                 F.expr("CAST((85 * coalesce(_s, 0L)) DIV 100 AS BIGINT)"))
                .cast("bigint").alias("r"),
            )
        )
    return ranks.select(
        "host",
        F.col("r").alias("rank_micro"),
        F.round(F.col("r").cast("double") / F.lit(1e6), 6).alias("pagerank"),
    )


def host_hits(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """Quantized HITS (Kleinberg 1999) over the weighted host edge list:
    authority(v) = sum of hub scores linking to v, hub(u) = sum of
    authority scores u links to — the crawl-frontier complement to
    PageRank (hubs find new content, authorities deserve recrawl).

    Exactness: classic HITS L2-normalizes each half-step; a sqrt breaks
    the integer-exact oracle discipline, so scores are MAX-normalized
    instead — after each half-step ``x'(v) = (X(v) * 1e6) DIV max(X)``,
    an exact bigint scaling with the same fixed point structure
    (rankings and ratios are what downstream consumers use).  Every
    operation is deterministic integer arithmetic, so the DuckDB oracle
    unrolls the same iterations.

    Scale shape per half-step: ONE join of the |hosts|-row score vector
    against the edge list + ONE groupBy (both keyed on a host column).
    The raw-score vector is localCheckpointed (same pattern as
    dedup_clusters' label state — keeps the iterative plan shallow
    instead of replaying the whole lineage per consumer) and the
    normalizer is a driver-side scalar collect off that materialized
    vector (one |hosts|-row agg, like k-means' centroid collect) — no
    cross join in the plan at all."""
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint()
    )

    def _half(score_df, score_col, join_side, emit_side, out_col):
        raw = (
            edges.join(score_df.withColumnRenamed("host", join_side),
                       join_side)
            .select(F.col(emit_side).alias("host"),
                    F.expr(f"CAST({score_col} * n_links AS BIGINT)")
                    .alias("_c"))
            .groupBy("host")
            .agg(F.sum("_c").cast("bigint").alias("_raw"))
            .localCheckpoint())
        mx = raw.agg(F.max("_raw")).first()[0]
        if not mx:  # empty edge list or all-zero scores: all-zero half
            return nodes.select("host",
                                F.lit(0).cast("bigint").alias(out_col))
        return (nodes.join(raw, "host", "left")
                .select("host",
                        F.expr(f"CAST((coalesce(_raw, 0L) * 1000000) "
                               f"DIV {mx} AS BIGINT)").alias(out_col)))

    hubs = nodes.withColumn("h", F.lit(1_000_000).cast("bigint"))
    auths = None
    for _ in range(iterations):
        auths = _half(hubs, "h", "src_host", "dst_host", "a")
        hubs = _half(auths, "a", "dst_host", "src_host", "h")
    return (nodes.join(auths, "host").join(hubs, "host")
            .select("host", F.col("a").alias("authority_micro"),
                    F.col("h").alias("hub_micro")))


def anchor_text_terms(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html", top_k: int = 3) -> DataFrame:
    """Inbound anchor-text aggregation per target host — the classic
    off-page relevance signal (anchor terms describe the TARGET better
    than its own page does; used for ranking and for labeling hosts a
    crawler has not fetched yet).

    Parse: one regexp pass over the raw HTML extracts (href, anchor
    text) pairs — two ``regexp_extract_all`` captures of the SAME
    pattern zipped positionally (identical match counts by
    construction), no HTML DOM needed at this stage.  Terms are
    lowercase word tokens of the anchor text; self-links are dropped
    like in :func:`extract_outlinks`.

    Scale shape: parse + explode are in-row; one (dst_host, term)
    groupBy with map-side combine; the top-k ranking windows
    partitionBy(dst_host).  Emits (dst_host, term, n_mentions, rank<=k)
    in deterministic order (count desc, term asc)."""
    from pyspark.sql import Window

    is_bin = dict(pages.dtypes)[html_col] == "binary"
    html_str = (F.decode(F.col(html_col), "UTF-8") if is_bin
                else F.col(html_col).cast("string"))
    pat = '<a href="([^"]+)"[^>]*>([^<]*)</a>'
    base = (pages.select(
                F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
                .alias("src_host"),
                html_str.alias("_h"))
            .select(
                "src_host",
                F.expr(f"regexp_extract_all(_h, '{pat}', 1)").alias("_hrefs"),
                F.expr(f"regexp_extract_all(_h, '{pat}', 2)").alias("_texts"))
            .withColumn("_z", F.arrays_zip("_hrefs", "_texts"))
            .select("src_host", F.explode("_z").alias("_p"))
            .select("src_host",
                    F.col("_p._hrefs").alias("_href"),
                    F.col("_p._texts").alias("_text")))
    dst = F.lower(F.regexp_extract(F.col("_href"), _HOST_RE, 1))
    terms = (
        base.where(F.col("_href").rlike(r"^https?://"))
        .select(dst.alias("dst_host"), "src_host", "_text")
        .where((F.col("dst_host") != "") &
               (F.col("dst_host") != F.col("src_host")))
        .select("dst_host", F.explode(F.expr(
            "filter(split(lower(_text), '[^a-z0-9]+'), t -> t <> '')"))
            .alias("term"))
        .groupBy("dst_host", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_mentions"))
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n_mentions").desc(), F.col("term").asc())
    return (terms.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k)
            .select("dst_host", "term", "n_mentions",
                    F.col("rank").cast("int").alias("rank")))
