"""End-to-end curation chain at two parallelism levels (north rule on a
REAL multi-stage pipeline, not just the map-only extraction stage).

Builds mult-replicated deterministic WARC segments (distinct doc_ids per
replica so extraction output is genuinely distinct; every-7th-doc MIRROR
records keep the dedup stage loaded proportionally), then times the full
chain — read_warc -> extract_articles -> integer quality/lang gates ->
exact-hash clusters through dedup_keep_best -> BPE token counts ->
pack_counts — once at local[N] and once at local[4N] over the SAME
segment files, alternating levels across rounds so a background-load
burst cannot be attributed to one level.

This complements scripts/multi_jvm_scaling.py (extraction-only,
executor-JVM topology): here the job has real shuffles (dedup groupBys,
keep-best join, packing prefix sums), i.e. the stages a 100 TB curation
run actually serializes on.

Run SOLO (the box carries bursty background load):
    python scripts/e2e_scale.py [sf_dir] [mult] [rounds]
Prints one JSON line.
"""
from __future__ import annotations

import gzip
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CTX = 2048
MIN_WORDS = 80


def build_warcs(sf_dir: str, mult: int) -> tuple[str, int]:
    import duckdb

    from article_extractor_spark.sources.pages import synthesize_page_py
    from article_extractor_spark.sources.warc import build_warc

    rows = duckdb.sql(
        f"SELECT doc_id, text, source FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}') "
        f"ORDER BY doc_id").fetchall()
    recs = []
    for rep in range(mult):
        for doc_id, text, source in rows:
            did = doc_id + rep * 10_000_000
            body = text if rep == 0 else f"{text} replica marker {rep}"
            url, html = synthesize_page_py(did, body, source)
            recs.append((url, html))
            if doc_id % 7 == 0:
                recs.append((url.replace(".example.com", "-m.example.com",
                                         1), html))
    tmp = tempfile.mkdtemp(prefix="e2escale_")
    nseg = 8 * mult
    segs: list[list] = [[] for _ in range(nseg)]
    for i, (url, html) in enumerate(recs):
        segs[i % nseg].append((url, "2024-01-01T00:00:01Z",
                               html.encode("utf-8")))
    for si, seg in enumerate(segs):
        if si % 2 == 0:
            with open(os.path.join(tmp, f"seg-{si}.warc"), "wb") as f:
                f.write(build_warc(seg))
        else:
            with open(os.path.join(tmp, f"seg-{si}.warc.gz"), "wb") as f:
                f.write(b"".join(gzip.compress(build_warc([r]))
                                 for r in seg))
    return tmp, len(recs)


def run_chain(spark, warc_dir: str, cpus: int) -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from article_extractor_spark.operators.dedup import dedup_keep_best
    from article_extractor_spark.operators.extract import extract_articles
    from article_extractor_spark.operators.packing import pack_counts
    from article_extractor_spark.operators.textstats import LANG_WORDS
    from article_extractor_spark.operators.tokenizer import bpe_token_counts
    from article_extractor_spark.sources.warc import read_warc

    pages = read_warc(spark, warc_dir)
    arts = extract_articles(pages, config_broadcast=entry._configs(spark),
                            num_partitions=4 * cpus)
    plain = F.regexp_replace(F.coalesce(F.col("text"), F.lit("")),
                             "<[^>]+>", "")
    base = arts.select(F.xxhash64("url").alias("doc_id"),
                       plain.alias("plain"))
    arr = ", ".join(f"'{w}'" for w in LANG_WORDS["en"])
    stop_hits = F.expr(
        f"size(filter(split(lower(plain), '\\\\s+'), "
        f"t -> array_contains(array({arr}), t)))")
    feat = base.select(
        "doc_id", "plain",
        F.size(F.split(F.lower(F.col("plain")), r"\s+")).alias("n_words"),
        stop_hits.alias("stop_hits"))
    filtered = (feat.where((F.col("n_words") >= MIN_WORDS)
                           & (F.col("stop_hits") >= 1))
                .localCheckpoint())
    hashed = filtered.select("doc_id", F.md5(F.col("plain")).alias("_h"))
    groups = hashed.groupBy("_h").agg(F.min("doc_id").alias("cluster_id"))
    members = hashed.join(groups, "_h").select("doc_id", "cluster_id")
    keep = dedup_keep_best(
        filtered, members,
        filtered.select("doc_id", F.col("n_words").alias("quality_micro")))
    survivors = keep.where(F.col("keep") == 1).select("doc_id")
    surv = filtered.join(survivors, "doc_id")
    counts = bpe_token_counts(surv.select(
        "doc_id", F.col("plain").alias("text")))
    packed = pack_counts(counts, count_col="n_bpe_tokens", ctx_len=CTX)
    return packed.count()


def level(cpus: int, warc_dir: str) -> tuple[float, int]:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"aes-e2e-scale-{cpus}")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    # warm the python worker pool so the timed window is steady-state
    run_chain(spark, warc_dir, cpus)
    t0 = time.monotonic()
    n = run_chain(spark, warc_dir, cpus)
    t = time.monotonic() - t0
    spark.stop()
    return t, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    lo, hi = 8, 32

    warc_dir, n_recs = build_warcs(sf_dir, mult)
    best: dict[int, float] = {}
    n_packed = {}
    for r in range(rounds):
        # alternate which level goes first so a load burst is not
        # attributable to one level
        order = (lo, hi) if r % 2 == 0 else (hi, lo)
        for cpus in order:
            t, n = level(cpus, warc_dir)
            best[cpus] = min(best.get(cpus, t), t)
            n_packed[cpus] = n
    thr = {c: round(n_recs / t, 1) for c, t in best.items()}
    print(json.dumps({
        "metric": "e2e curation chain (warc->extract->filter->dedup->"
                  "bpe->pack) at local[%d] vs local[%d]" % (lo, hi),
        "unit": "docs/sec",
        "sf_dir": sf_dir,
        "mult": mult,
        "n_warc_records": n_recs,
        "n_packed_rows": n_packed,
        "best_sec": {str(c): round(t, 3) for c, t in best.items()},
        "throughput": {str(c): thr[c] for c in sorted(thr)},
        "scaling_efficiency": round(
            (thr[hi] / thr[lo]) / (hi / lo), 3) if lo in thr else None,
    }))


if __name__ == "__main__":
    main()
