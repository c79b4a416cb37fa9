"""Solo bench for the round-5 continuation modules (unregistered,
free-surface): any-image decode routing, raw-bytes extraction front
end, and the cross-modal fingerprint + Hamming-LSH near-dup family
(image phash, audio energy deltas, video brightness deltas).

Prints one JSON line per measurement.  Run SOLO (background load
inflates everything).  Results recorded in BENCH/BASELINE.md.

Usage: python scripts/fingerprint_bench.py [sf_dir]
"""

from __future__ import annotations

import io
import json
import os
import struct
import sys
import time
import wave

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .appName("aes-fingerprint-bench")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    # -- image phash -> Hamming-banded near-dup + clusters ---------------
    from article_extractor_spark.operators.imagededup import (
        phash_dup_clusters, phash_near_dups)
    from article_extractor_spark.operators.multimodal import image_phash

    hashes = image_phash(docs).localCheckpoint(eager=True)

    def img_pairs():
        return {"pairs": phash_near_dups(hashes, max_hamming=1).count(),
                "docs": n_docs}

    _timed("imagededup.phash_near_dups d<=1", img_pairs)

    def img_clusters():
        cl = phash_dup_clusters(hashes, max_hamming=1)
        return {"clustered": cl.count(),
                "clusters": cl.select("cluster_id").distinct().count()}

    _timed("imagededup.phash_dup_clusters d<=1", img_clusters)

    # -- audio fingerprint + near-dup ------------------------------------
    from article_extractor_spark.operators.audiofp import (
        audio_fingerprint, audio_near_dups)

    def wav_bytes(mid: int) -> bytes:
        n = 4000 + (mid % 7) * 500
        samples = [((mid % 97) * 131 + ((i * i) % 1009) * 37 + i * (mid % 13)
                    ) % 16001 - 8000 for i in range(n)]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(struct.pack(f"<{n}h", *samples))
        return buf.getvalue()

    audio_rows = [(i, wav_bytes(i)) for i in range(2000)]
    audio = spark.createDataFrame(
        audio_rows, "media_id long, content binary").localCheckpoint(True)

    def audio_fp():
        fps = audio_fingerprint(audio).localCheckpoint(eager=True)
        pairs = audio_near_dups(fps, max_hamming=1).count()
        return {"clips": 2000, "pairs_d1": pairs}

    _timed("audiofp.fingerprint+near_dups 2000 clips", audio_fp)

    # -- video fingerprint + near-dup ------------------------------------
    from article_extractor_spark.core.y4m import encode_y4m
    from article_extractor_spark.operators.videofp import (
        video_fingerprint, video_near_dups)

    def clip_bytes(mid: int) -> bytes:
        levels = [((mid % 127) * 31 + ((i * i * i) % 251) + i * (mid % 11)
                   ) % 256 for i in range(33)]
        frames = [(bytes([lv]) * 64, bytes(16), bytes(16)) for lv in levels]
        return encode_y4m(8, 8, frames, colourspace="C420jpeg")

    video_rows = [(i, clip_bytes(i)) for i in range(2000)]
    video = spark.createDataFrame(
        video_rows, "media_id long, content binary").localCheckpoint(True)

    def video_fp():
        fps = video_fingerprint(video).localCheckpoint(eager=True)
        pairs = video_near_dups(fps, max_hamming=1).count()
        return {"clips": 2000, "pairs_d1": pairs}

    _timed("videofp.fingerprint+near_dups 2000 clips", video_fp)

    # -- any-image decode routing ----------------------------------------
    from article_extractor_spark.core.gif import encode_gif
    from article_extractor_spark.core.png import encode_png
    from article_extractor_spark.operators.media_ext import image_stats_any

    pal = [(i, 255 - i, i * 3 % 256) for i in range(16)]

    def payload(mid: int) -> bytes:
        if mid % 2:
            idx = bytes((mid + x + y) % 16 for y in range(24)
                        for x in range(24))
            return encode_gif(24, 24, [idx], pal)
        px = bytes((mid + 3 * i) % 256 for i in range(24 * 24 * 3))
        return encode_png(24, 24, px)

    media_rows = [(i, payload(i)) for i in range(2000)]
    media = spark.createDataFrame(
        media_rows, "media_id long, content binary").localCheckpoint(True)

    def any_decode():
        out = image_stats_any(media)
        ok = out.filter("error IS NULL").count()
        return {"payloads": 2000, "decoded": ok}

    _timed("media_ext.image_stats_any 2000 GIF/PNG", any_decode)

    # -- raw-bytes extraction front end ----------------------------------
    from article_extractor_spark.operators.extract_bytes import (
        extract_articles_from_bytes)
    from article_extractor_spark.sources.pages import synthesize_pages

    from article_extractor_spark.operators.extract import broadcast_configs

    pages = synthesize_pages(spark, sf_dir)
    binpages = pages.selectExpr(
        "url", "encode(html, 'UTF-8') AS body").localCheckpoint(eager=True)
    n_pages = binpages.count()
    cfg = broadcast_configs(spark)
    # warm-up: rule-base unpickle + Arrow worker startup, same as bench.py
    extract_articles_from_bytes(
        binpages.limit(64), config_broadcast=cfg).count()

    def bytes_extract():
        arts = extract_articles_from_bytes(
            binpages, config_broadcast=cfg, num_partitions=32)
        return {"pages": n_pages,
                "rows": arts.count()}

    wall = min(_timed("extract_bytes.extract_articles_from_bytes",
                      bytes_extract) for _ in range(2))
    print(json.dumps({"bench": "extract_bytes docs/sec (best of 2, warm)",
                      "value": round(n_pages / wall, 1)}), flush=True)

    # -- SimHash near-dup pairing ----------------------------------------
    from article_extractor_spark.operators.textfp import simhash_near_dups

    def simhash_pairs():
        return {"docs": n_docs,
                "pairs": simhash_near_dups(docs, max_hamming=3).count()}

    _timed("textfp.simhash_near_dups d<=3", simhash_pairs)

    # -- host-level quality gating ---------------------------------------
    from article_extractor_spark.operators.hostquality import (
        filter_by_host_quality)

    docs_urls = docs.selectExpr(
        "doc_id", "concat('http://', source, '.example.test/doc/', doc_id) "
        "AS url", "text").localCheckpoint(eager=True)

    def host_gate():
        kept = filter_by_host_quality(docs_urls, min_mean_quality=0.2,
                                      min_pages=3).count()
        return {"docs": n_docs, "kept": kept}

    _timed("hostquality.filter_by_host_quality", host_gate)

    # -- WET segment writing ---------------------------------------------
    import shutil
    import tempfile

    from article_extractor_spark.sources.wet_sink import write_wet_segments

    wet_src = docs_urls.selectExpr("url", "text").repartition(32) \
        .localCheckpoint(eager=True)
    wet_dir = tempfile.mkdtemp(prefix="aes_wet_bench_")

    def wet_write():
        return {"records": write_wet_segments(wet_src, wet_dir)}

    _timed("wet_sink.write_wet_segments", wet_write)
    shutil.rmtree(wet_dir, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
