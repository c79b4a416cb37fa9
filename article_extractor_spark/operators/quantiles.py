"""Log-bucket quantile sketch: mergeable percentiles in O(64) space.

Completes the sketch family (KMV distinct / HLL union / Bloom
membership in `sketches.py`, Count-Min frequency in `cms.py`) with the
rank estimator: values are histogrammed by BIT LENGTH (power-of-two
buckets, `length(bin(v))` — pure integer logic on both engines), the
percentile estimate is the upper bound of the bucket holding the target
rank.  The structural guarantee is a 2-approximation: for any rank r
with true value t >= 1, t <= est(r) <= 2*t - 1, because bucket b covers
exactly [2^(b-1), 2^b).  Both the estimate and the guarantee are exact
integers, so the driver's value hash pins them.

100 TB shape: ONE groupBy collapses any corpus to <= ~64 rows
(map-side combine does nearly all the work), the cumulative walk and
rank probes happen on that fixed-size table — the sketch is
broadcastable, mergeable (bucket-wise addition), and the only thing
that scales with data is the map side.  The exact true percentile
(needed here only to PIN the guarantee) is a global TakeOrdered-style
rank probe.  No reference analogue (the reference is HTML-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quantile_sketch(df: DataFrame, value_col: str = "n_chars",
                    percentiles: tuple[int, ...] = (50, 90, 99)) -> DataFrame:
    """(p, rank, est, true_val, within_2x): for each percentile p, the
    1-indexed target rank ceil(p/100 * N), the sketch estimate
    (2^bucket - 1), the exact order statistic at that rank, and the
    2-approximation guarantee bool.  Values < 1 land in bucket 0 with
    est 0 (exact for the all-nonpositive prefix)."""
    spark = df.sparkSession
    vals = df.select(F.coalesce(F.col(value_col), F.lit(0))
                     .cast("bigint").alias("v"))
    # ONE corpus scan: the value-keyed histogram (needed below for the
    # exact order statistic anyway) is the only pass over the data; the
    # <= ~64-row sketch, N, and the cumulative walks all derive from it.
    # In a sketch-only deployment this collapses to the bucket groupBy.
    hist = vals.groupBy("v").agg(F.count(F.lit(1)).cast("bigint")
                                 .alias("c")).localCheckpoint()
    # bucket = bit length of v for v >= 1, else 0 — integer-exact on
    # both engines (Spark bin() == DuckDB bin(), both minimal-width)
    sketch = (hist.select(
        F.expr("CASE WHEN v < 1 THEN 0 ELSE length(bin(v)) END")
        .cast("int").alias("bucket"), "c")
        .groupBy("bucket").agg(F.sum("c").cast("bigint").alias("cnt")))
    # the sketch is <= ~64 rows: the cumulative walk is driver-trivial,
    # kept declarative via a window over the single tiny partition
    cum = sketch.withColumn(
        "cum", F.sum("cnt").over(
            Window.partitionBy(F.lit(0)).orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)))
    n = int(hist.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint"))
            .collect()[0][0] or 0)
    probes = spark.createDataFrame(
        [(int(p), max(1, -(-p * n // 100))) for p in percentiles],
        "p int, rank bigint")
    est = (F.broadcast(probes)
           .join(cum, F.col("cum") >= F.col("rank"))
           .groupBy("p", "rank")
           .agg(F.min("bucket").alias("b"))
           .select("p", "rank",
                   F.expr("shiftleft(cast(1 as bigint), b) - 1")
                   .cast("bigint").alias("est")))
    # exact order statistic, selection-by-histogram: the value-keyed
    # groupBy above is the distributed part (distinct values of a
    # bounded-domain column, NOT corpus rows); the cumulative walk runs
    # over that compressed table only
    cumv = hist.withColumn(
        "cumc", F.sum("c").over(
            Window.partitionBy(F.lit(0)).orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)))
    true = (F.broadcast(probes)
            .join(cumv, F.col("cumc") >= F.col("rank"))
            .groupBy("p")
            .agg(F.min("v").alias("true_val")))
    return (est.join(true, "p")
            .select("p", "rank", "est", "true_val",
                    ((F.col("est") >= F.col("true_val"))
                     & (F.col("est") <=
                        F.greatest(F.lit(0),
                                   F.lit(2) * F.col("true_val") - F.lit(1))))
                    .alias("within_2x")))
