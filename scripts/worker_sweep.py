"""Sweep the Python-worker pipe knobs for the extraction stage (NOTES.md #1 /
round-2 VERDICT #2): Arrow batch size, useLargeVarTypes, worker reuse — each
config in a fresh JVM via bench.py (AES_BENCH_EXTRACT_ONLY), best-of-N inside.

Usage: python scripts/worker_sweep.py   # prints a markdown table
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("batch=1024 (r2 default)", {"AES_ARROW_BATCH": "1024"}),
    ("batch=256", {"AES_ARROW_BATCH": "256"}),
    ("batch=512", {"AES_ARROW_BATCH": "512"}),
    ("batch=2048", {"AES_ARROW_BATCH": "2048"}),
    ("batch=4096", {"AES_ARROW_BATCH": "4096"}),
    ("batch=1024 largeVarTypes", {
        "AES_ARROW_BATCH": "1024",
        "AES_SPARK_CONF": "spark.sql.execution.arrow.useLargeVarTypes=true"}),
    ("batch=1024 no-reuse", {
        "AES_ARROW_BATCH": "1024",
        "AES_SPARK_CONF": "spark.python.worker.reuse=false"}),
    ("batch=1024 faulthandler-off+prefetch", {
        "AES_ARROW_BATCH": "1024",
        "AES_SPARK_CONF": "spark.python.worker.faulthandler.enabled=false"}),
]


def run(extra_env: dict) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "SPARK_GRAFT_SF_DIR": os.environ.get("SPARK_GRAFT_SF_DIR",
                                             "/root/testdata/sf0.1"),
        "AES_BENCH_MULT": os.environ.get("AES_BENCH_MULT", "4"),
        "AES_BENCH_EXTRACT_ONLY": "1",
    })
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    print("| config | docs/s (repartition) | docs/s (narrow) |")
    print("| --- | --- | --- |")
    results = {}
    for label, env in CONFIGS:
        r = run(env)
        results[label] = r
        print(f"| {label} | {r['extraction_docs_per_sec']} | "
              f"{r['extraction_docs_per_sec_narrow']} |", flush=True)
    best = max(results.items(),
               key=lambda kv: kv[1]["extraction_docs_per_sec_narrow"])
    print(f"\nbest narrow: {best[0]} at "
          f"{best[1]['extraction_docs_per_sec_narrow']} docs/s")


if __name__ == "__main__":
    main()
