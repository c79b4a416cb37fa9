"""Solo bench for the round-5 free-surface additions (modules not yet
registered as driver queries): suffix-array exact dedup, unigram-LM
training, GIF codec, charset bridge, small-file compaction.

Prints one JSON line per measurement.  Run SOLO (the box's background
load inflates everything).  Results are recorded in BENCH/BASELINE.md
("free-surface additions" section).

Usage: python scripts/free_surface_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(name, fn, **extra):
    t0 = time.monotonic()
    out = fn()
    wall = round(time.monotonic() - t0, 3)
    rec = {"bench": name, "sec": wall, **extra}
    if isinstance(out, dict):
        rec.update(out)
    print(json.dumps(rec), flush=True)
    return wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .appName("aes-free-surface-bench")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "text").localCheckpoint(eager=True)
    n_docs = docs.count()
    n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]

    # -- suffix-array exact dedup ---------------------------------------
    from article_extractor_spark.operators.suffixarray import (
        duplicated_positions, exact_dup_spans)

    def sa_dupes():
        n = duplicated_positions(docs, L=40).count()
        return {"dup_positions": n, "docs": n_docs, "chars": int(n_chars)}

    _timed("suffixarray.duplicated_positions L=40", sa_dupes)

    def sa_spans():
        return {"spans": exact_dup_spans(docs, L=40).count()}

    _timed("suffixarray.exact_dup_spans L=40", sa_spans)

    # -- unigram-LM training --------------------------------------------
    from article_extractor_spark.operators.unigram import (
        unigram_encode, unigram_train)

    vdf = None

    def train():
        nonlocal vdf
        vdf = unigram_train(docs, vocab_size=512, max_piece_len=6,
                            seed_size=4000, em_iters=2)
        return {"vocab": vdf.count(), "docs": n_docs}

    _timed("unigram.train vocab=512", train)

    def encode():
        r = unigram_encode(docs, vdf) \
            .agg(F.sum("n_tokens")).collect()[0][0]
        return {"tokens": int(r)}

    _timed("unigram.encode", encode)

    # -- charset bridge ---------------------------------------------------
    from article_extractor_spark.core.charset import decode_html_bytes

    bodies = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit('<meta charset="utf-8">'),
                          F.col("text")), "utf-8").alias("body")) \
        .localCheckpoint(eager=True)
    bodies.count()

    def sniff():
        n = decode_html_bytes(bodies).where(
            F.col("encoding") == "utf-8").count()
        return {"decoded": n,
                "mb": round((n_chars or 0) / 1e6, 1)}

    _timed("charset.decode_html_bytes", sniff)

    # -- GIF codec (single-core, pure Python) ----------------------------
    from article_extractor_spark.core.gif import decode_gif, encode_gif

    w, h = 128, 96
    pal = [(i, 255 - i, (i * 3) % 256) for i in range(256)]
    idx = bytes(((x * 3 + y) % 256) for y in range(h) for x in range(w))
    frames = [idx] * 8

    def gif_rt():
        enc = encode_gif(w, h, frames, pal)
        out = decode_gif(enc)
        return {"frames": out["n_frames"], "encoded_bytes": len(enc),
                "raw_bytes": w * h * len(frames)}

    _timed("gif.encode+decode 8x128x96", gif_rt)

    # -- small-file compaction -------------------------------------------
    import shutil
    import tempfile

    from article_extractor_spark.plans.compact import (
        compact_parquet, compaction_stats)

    tmp = tempfile.mkdtemp(prefix="aes-compact-bench-")
    try:
        src = os.path.join(tmp, "src")
        docs.repartition(256).write.parquet(src)
        before = compaction_stats(src)

        def comp():
            rep = compact_parquet(
                spark, src, os.path.join(tmp, "dst"),
                target_bytes=max(before["bytes"] // 8, 1 << 20),
                open_cost_bytes=64 * 1024)
            return {"files_before": rep["before"]["n_files"],
                    "files_after": rep["after"]["n_files"],
                    "rows": rep["rows"]}

        _timed("compact.parquet 256 files (incl. dual checksum verify)",
               comp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
