"""Count-Min sketch: sub-linear token-frequency estimation.

Completes the sketch family (KMV distinct-count, HLL union, Bloom
membership in `sketches.py`) with the frequency estimator used for
heavy-hitter detection and streaming word statistics (Cormode &
Muthukrishnan 2005).  Deterministic md5-derived row hashes, integer
counters only — the driver's value oracle replays the sketch AND the
point queries exactly in SQL, and pins the structural guarantee
est >= true per probe.

100 TB shape: building the sketch is ONE shuffle of (row, bucket)
pairs — d x corpus tokens map-side, combined into at most d*w rows
(d=4, w=64 here => <=256 counters TOTAL, independent of corpus size).
The sketch table is broadcastable by construction; point queries join
the d-row probe expansion against it and take min per key.  This is
the aggregation-light alternative to an exact groupBy(word) when the
vocabulary itself is too large to shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

D_ROWS = 4
WIDTH = 64


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    """The one tokenize pipeline every pass in this module shares —
    sketch build, true counts, and heavy-hitter recount MUST agree on
    what a token is or the est>=true / exact-set invariants break.

    Single-split inputs are fanned out first: the explode+md5 work
    otherwise runs on one core until the first exchange (no-op on real
    multi-split tables)."""
    from article_extractor_spark.operators.dedup import ensure_min_partitions

    return (ensure_min_partitions(df.select(text_col))
            .select(F.explode(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                        r"\s+"))
                .alias("token"))
            .where(F.col("token") != ""))


def _bucket_expr(row: int, token_expr: str, width: int = WIDTH) -> str:
    """hash60('cms<row>:' || token) % width — same md5 idiom as the
    engine's other deterministic hashes."""
    return (f"cast(conv(substr(md5(concat('cms{row}', ':', {token_expr})), "
            f"1, 15), 16, 10) as bigint) % {width}")


def _bucket_expr_col(row_col: str, word_col: str, width: int) -> str:
    """Column-row variant of :func:`_bucket_expr` (identical hash)."""
    return (f"cast(conv(substr(md5(concat('cms', cast({row_col} as string), "
            f"':', {word_col})), 1, 15), 16, 10) as bigint) % {width}")


def cms_build(df: DataFrame, text_col: str = "text",
              d: int = D_ROWS, width: int = WIDTH) -> DataFrame:
    """Build the sketch: (row, bucket, cnt) — at most d*width rows.

    ONE corpus scan: each token expands to its d (row, bucket) pairs
    via an inline-array explode (a union of d projections would re-scan
    the corpus d times — the difference between 1x and 4x input I/O at
    100 TB)."""
    pairs = ", ".join(
        f"struct({r} AS row, {_bucket_expr(r, 'token', width)} AS bucket)"
        for r in range(d))
    return (_tokens(df, text_col)
            .select(F.explode(F.expr(f"array({pairs})")).alias("rb"))
            .select(F.col("rb.row").alias("row"),
                    F.col("rb.bucket").alias("bucket"))
            .groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))


def cms_point_query(df: DataFrame, probes: list[str],
                    text_col: str = "text",
                    d: int = D_ROWS, width: int = WIDTH) -> DataFrame:
    """Estimate frequencies for ``probes``: (word, true_cnt, est_cnt,
    overestimate_ok).  est = min over rows of the probed counter; the
    CMS guarantee est >= true holds for every probe (collisions only
    inflate) — emitted as a checkable boolean.  Probes are lowercased
    to match the token stream, then deduplicated."""
    spark = df.sparkSession
    sketch = cms_build(df, text_col=text_col, d=d, width=width)
    probes = list(dict.fromkeys(p.lower() for p in probes))
    probe_rows = [(w, r) for w in probes for r in range(d)]
    pdf = spark.createDataFrame(probe_rows, "word string, row int")
    pdf = pdf.withColumn("bucket", F.expr(_bucket_expr_col("row", "word",
                                                           width)))
    est = (F.broadcast(pdf)
           .join(sketch, ["row", "bucket"], "left")
           .groupBy("word")
           .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                .cast("bigint").alias("est_cnt")))
    true = (_tokens(df, text_col)
            .where(F.col("token").isin(probes))
            .groupBy(F.col("token").alias("word"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt")))
    return (est.join(true, "word", "left")
            .select("word",
                    F.coalesce(F.col("true_cnt"), F.lit(0)).cast("bigint")
                    .alias("true_cnt"),
                    "est_cnt",
                    (F.col("est_cnt") >=
                     F.coalesce(F.col("true_cnt"), F.lit(0)))
                    .alias("overestimate_ok")))


def heavy_hitters(df: DataFrame, threshold: int,
                  text_col: str = "text",
                  d: int = D_ROWS, width: int = WIDTH) -> DataFrame:
    """Exact heavy hitters (token, cnt with cnt >= threshold), sketch-
    gated:

    1. aggregate per-token counts once (the canonical map-side-combined
       word count — the corpus is tokenized exactly once),
    2. rebuild the d*width-counter sketch from those counts (identical
       counters: sum of per-token counts per (row, bucket) == count of
       instances per counter), collect it driver-side and turn it into
       a LITERAL lookup array, so every token's estimate is a pure
       projection (least of d element_at's — zero shuffle, zero join),
    3. keep only tokens whose estimate AND exact count clear the
       threshold.

    Because est >= true for every token (collisions only inflate), the
    estimate gate can never drop a true heavy hitter; the HAVING
    removes the false positives.  The output is therefore EXACTLY the
    true heavy-hitter set — the oracle is a plain GROUP BY/HAVING, and
    any sketch bug that loses mass breaks the value match.  At 100 TB
    the vocabulary exchange ships per-partition partial counts (not
    token instances), and the md5 counter hashing — formerly 8
    evaluations per token INSTANCE, the dominant corpus-scan CPU —
    runs once per distinct token."""
    # cached: the vocabulary table feeds the sketch build AND the gated
    # output below
    counts = (_tokens(df, text_col)
              .groupBy("token")
              .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
              .cache())
    pairs = ", ".join(
        f"struct({r} AS row, {_bucket_expr(r, 'token', width)} AS bucket)"
        for r in range(d))
    sketch = (counts
              .select("cnt", F.explode(F.expr(f"array({pairs})")).alias("rb"))
              .groupBy(F.col("rb.row").alias("row"),
                       F.col("rb.bucket").alias("bucket"))
              .agg(F.sum("cnt").cast("bigint").alias("cnt")))
    flat = [0] * (d * width)
    for r in sketch.collect():
        flat[int(r["row"]) * width + int(r["bucket"])] = int(r["cnt"])
    arr = ", ".join(str(v) for v in flat)
    est = "least(" + ", ".join(
        f"element_at(array({arr}), cast({r * width} + "
        f"({_bucket_expr(r, 'token', width)}) + 1 as int))"
        for r in range(d)) + ")"
    return (counts
            .where(F.expr(est) >= F.lit(int(threshold)))
            .where(F.col("cnt") >= F.lit(int(threshold))))
