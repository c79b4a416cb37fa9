"""spark-submit entrypoint for the raw-crawl job: WARC in, WET out.

The Common-Crawl production shape end-to-end — every stage is the
library's tested operator:

  read_warc (binary payloads)  ->  route_payloads (JVM magic sniff)
    html  -> extract_articles_from_bytes (charset+extraction fused,
             ONE Arrow stage, hash-partitioned on url)
          -> parquet articles table + per-partition lineage metrics
          -> WET conversion segments (atomic per-partition files)
    image -> image_stats_any (decode + pixel checksums) -> parquet
    other -> counted, dropped

Cluster usage (north rule: --py-files ships the package):

    zip -r aes.zip article_extractor_spark
    spark-submit --py-files aes.zip scripts/run_warc_job.py \
        --input s3://bucket/warc-segments/ --output s3://bucket/out/

Local sandbox smoke (synthesizes a WARC from the sf dir first):

    python scripts/run_warc_job.py --synthesize /root/testdata/sf0.001 \
        --output /tmp/aes_warc_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="directory of WARC segments")
    src.add_argument("--synthesize",
                     help="build a WARC from this sf dir's pages first")
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = SparkSession.builder.appName("aes-warc-job")
    if args.master:
        b = b.master(args.master)
    spark = (b.config("spark.sql.shuffle.partitions", str(args.partitions))
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    warc_dir = args.input
    if args.synthesize:
        from article_extractor_spark.sources.pages import synthesize_pages
        from article_extractor_spark.sources.warc import build_warc

        warc_dir = os.path.join(args.output, "_synth_warc")
        os.makedirs(warc_dir, exist_ok=True)
        rows = synthesize_pages(spark, args.synthesize) \
            .select("url", "html").collect()
        recs = [(r["url"], "2024-01-01T00:00:00Z",
                 h.encode() if isinstance(h, str) else bytes(h))
                for r in rows for h in [r["html"]]]
        with open(os.path.join(warc_dir, "synth-00000.warc"), "wb") as f:
            f.write(build_warc(recs))

    from article_extractor_spark.operators.extract import lineage_metrics
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)
    from article_extractor_spark.operators.media_ext import image_stats_any
    from article_extractor_spark.operators.router import route_payloads
    from article_extractor_spark.sources.warc_http import (ok_responses,
                                                           read_warc_http)
    from article_extractor_spark.sources.wet_sink import write_wet_segments

    # keep the HTTP head: 200-gate + transport charset (WHATWG-ranked
    # above the in-document meta) flow into extraction
    pages = ok_responses(read_warc_http(spark, warc_dir)).localCheckpoint()
    routed = route_payloads(pages, content_col="html")

    articles = extract_articles_from_bytes(
        routed["html"], body_col="html", content_type_col="content_type",
        num_partitions=args.partitions).localCheckpoint()
    # bloom filter on url: the downstream point-lookup key (incremental
    # anti-joins, backfills) skips row groups without reading the column
    from article_extractor_spark.plans.bloomwrite import write_with_bloom

    n_articles = articles.count()
    write_with_bloom(
        articles, os.path.join(args.output, "articles"),
        {"url": max(1, n_articles // max(1, args.partitions))})
    lineage_metrics(articles, run_id="warc-job").write.mode(
        "overwrite").parquet(os.path.join(args.output, "lineage"))
    n_wet = write_wet_segments(
        articles, os.path.join(args.output, "wet"), ts_col=None)

    media = routed["image"].select(
        F.xxhash64("url").alias("media_id"),
        F.col("html").alias("content"))
    stats = image_stats_any(media)
    stats.write.mode("overwrite").parquet(
        os.path.join(args.output, "media_stats"))

    summary = {
        "articles": articles.count(),
        "wet_records": n_wet,
        "images_decoded": stats.filter("error IS NULL").count(),
        "other_payloads": routed["other"].count(),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
