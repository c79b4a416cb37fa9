"""Dedup chain at 10x corpus scale with bucket-skew telemetry
(round-4 verdict ask #8): prove the MinHash banding holds where it
matters — replicate the sf0.1 documents table 10x (half exact copies,
half near-dup variants: the dup-heavy worst case for bucket skew), run
the full minhash -> jaccard -> keep_best chain SOLO, and log the
per-band bucket-size histogram (max bucket, capped count, p99) so
"no bucket blowup" is a measured number, not a claim.

Run solo (the box has bursty background load):
    python scripts/dedup_scale.py [sf_dir] [mult]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("aes-dedup-scale")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    from article_extractor_spark.operators.dedup import (
        dedup_clusters, dedup_keep_best, minhash_band_hashes,
        minhash_lsh_pairs, ngram_jaccard_pairs, word_shingles)
    from article_extractor_spark.operators.textstats import quality_score

    docs0 = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "text")
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    # rep 0: original; odd reps: near-dup variant (suffix edit); even
    # reps: EXACT copies — worst case for bucket multiplicity
    docs = (docs0.crossJoin(reps)
            .select(
                (F.col("doc_id") + F.col("rep") * 10_000_000)
                .alias("doc_id"),
                F.when(F.col("rep") % 2 == 1,
                       F.concat(F.coalesce("text", F.lit("")),
                                F.lit(" replica tag "),
                                F.col("rep").cast("string")))
                .otherwise(F.col("text")).alias("text"))
            .repartition(4 * cpus, "doc_id")
            .cache())
    n_docs = docs.count()

    # ---- telemetry: band-bucket size distribution BEFORE the self-join
    bands = minhash_band_hashes(word_shingles(docs), num_bands=16)
    sizes = (bands.groupBy("band", "band_hash")
             .agg(F.count(F.lit(1)).alias("sz")).cache())
    agg = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.sum((F.col("sz") > 100_000).cast("long")).alias("n_capped"),
        F.expr("percentile_approx(sz, 0.99, 10000)").alias("p99"),
        F.expr("percentile_approx(sz, 0.999, 10000)").alias("p999"),
    ).collect()[0]
    hist_rows = (sizes.groupBy(
        F.floor(F.log2("sz")).cast("int").alias("log2_size"))
        .agg(F.count(F.lit(1)).alias("n_buckets"),
             F.sum("sz").alias("n_rows"))
        .orderBy("log2_size").collect())
    hist = {f"2^{r.log2_size}": [int(r.n_buckets), int(r.n_rows)]
            for r in hist_rows}
    sizes.unpersist()

    # ---- timed chain: minhash -> jaccard -> keep_best -----------------
    t0 = time.monotonic()
    n_pairs = minhash_lsh_pairs(docs, num_bands=16).count()
    t1 = time.monotonic()
    n_verified = ngram_jaccard_pairs(docs, threshold=0.5).count()
    t2 = time.monotonic()
    clusters = dedup_clusters(docs, num_bands=8)
    score_df = quality_score(docs).select(
        "doc_id",
        F.expr("cast(round(quality * 1000000) as bigint)")
        .alias("quality_micro"))
    kept = dedup_keep_best(docs, clusters, score_df) \
        .agg(F.sum("keep").alias("n_kept"),
             F.count(F.lit(1)).alias("n_total")).collect()[0]
    t3 = time.monotonic()

    print(json.dumps({
        "metric": "dedup chain at %dx (minhash->jaccard->keep_best)" % mult,
        "value": round(t3 - t0, 3),
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "minhash_pairs_sec": round(t1 - t0, 3),
        "jaccard_verify_sec": round(t2 - t1, 3),
        "cluster_keep_best_sec": round(t3 - t2, 3),
        "n_candidate_pairs": n_pairs,
        "n_verified_pairs": n_verified,
        "n_kept": int(kept.n_kept),
        "n_total": int(kept.n_total),
        "bucket_telemetry": {
            "n_buckets": int(agg.n_buckets),
            "max_bucket": int(agg.max_bucket),
            "n_over_cap_100k": int(agg.n_capped),
            "p99": int(agg.p99),
            "p999": int(agg.p999),
            "log2_histogram": hist,
        },
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
