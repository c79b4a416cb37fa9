"""Worker-occupancy breakdown for the extraction stage (round-2 VERDICT #2):
where does wall time go at local[N]?

Uses the lineage column batch_elapsed_ms (per-batch Python busy time) to
split wall into: python-busy core-seconds vs everything else (JVM scan +
synthesis + Arrow pipe + scheduling + idle).  Prints one JSON line per N.

Run SOLO; best-of-N per level.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, time, sys
sys.path.insert(0, %(repo)r)
cpus = %(cpus)d
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(2*cpus))
    .config("spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("AES_ARROW_BATCH", "1024"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "8g").getOrCreate())
sys.path.insert(0, %(repo)r)
import bench
from article_extractor_spark.operators.extract import extract_articles
import __spark_entry__ as entry
pages = bench.replicated_pages(spark, "/root/testdata/sf0.1", 4).cache()
n_docs = pages.count()
cfg = entry._configs(spark)
warm = pages.limit(4*cpus).repartition(4*cpus)
extract_articles(warm, config_broadcast=cfg).count()
narrow_in = pages.repartition(4*cpus).cache(); narrow_in.count()
best = None
for _ in range(3):
    t0 = time.monotonic()
    arts = extract_articles(narrow_in, config_broadcast=cfg)
    agg = arts.groupBy("part_id").agg(
        F.max("batch_elapsed_ms").alias("ms"),
        F.count(F.lit(1)).alias("n")).collect()
    wall = time.monotonic() - t0
    py_core_sec = sum(r["ms"] for r in agg) / 1000.0
    if best is None or wall < best[0]:
        best = (wall, py_core_sec, len(agg))
wall, py_core_sec, tasks = best
print(json.dumps({
    "cpus": cpus, "docs": n_docs, "wall_sec": round(wall, 2),
    "docs_per_sec": round(n_docs / wall, 1),
    "py_busy_core_sec": round(py_core_sec, 2),
    "py_busy_share_of_wallxcores": round(py_core_sec / (wall * cpus), 3),
    "per_core_docs_per_sec_python_only": round(n_docs / py_core_sec, 1),
    "tasks": tasks,
}))
"""


def run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO, "cpus": cpus}],
        capture_output=True, text=True, timeout=1800, cwd=REPO)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise SystemExit(1)
    return json.loads(lines[-1])


def main():
    for cpus in (8, 32):
        r = run(cpus)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
