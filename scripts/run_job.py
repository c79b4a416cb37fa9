"""spark-submit entrypoint for the extraction job.

Cluster usage (north rule: two cluster sizes, --py-files ships the package):

    zip -r aes.zip article_extractor_spark
    spark-submit --py-files aes.zip scripts/run_job.py \
        --input  s3://bucket/pages/     \
        --output s3://bucket/extracted/ \
        --num-buckets 4096 --partitions-per-bucket 8

Local sandbox:

    python scripts/run_job.py --synthesize /root/testdata/sf0.01 \
        --output /tmp/aes_out --num-buckets 16

Re-running the same command resumes from the checkpoint table exactly
(completed buckets are skipped; interrupted buckets are rewritten
idempotently via dynamic partition overwrite)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (parquet/iceberg)")
    ap.add_argument("--synthesize", help="synthesize pages from this sf dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--buckets-per-wave", type=int, default=None)
    ap.add_argument("--partitions-per-bucket", type=int, default=2)
    ap.add_argument("--master", default=None,
                    help="override master (default: from spark-submit)")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from article_extractor_spark.session import build_session
    from article_extractor_spark.plans.checkpoint import run_extraction_job

    spark = build_session(master=args.master or os.environ.get(
        "SPARK_MASTER", "local[*]"))

    if args.synthesize:
        from article_extractor_spark.sources.pages import synthesize_pages

        pages = synthesize_pages(spark, args.synthesize)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthesize is required")

    summary = run_extraction_job(
        spark, pages, args.output,
        num_buckets=args.num_buckets,
        buckets_per_wave=args.buckets_per_wave,
        partitions_per_bucket=args.partitions_per_bucket,
        run_id=args.run_id,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
