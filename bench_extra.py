"""bench_extra.py — per-query isolation harness for optimization work.

NOT used by the driver (bench.py is the frozen measurement contract);
this exists so individual queries can be timed solo, with best-of-N,
and their physical plans dumped for plans/r06/.

Usage:
  python bench_extra.py q1 q2 ...        # time the named queries
  python bench_extra.py --all            # every query bench.py times
  python bench_extra.py --explain q ...  # dump explain("formatted") only

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores (default 32)
  AES_EXTRA_REPEATS    best-of-N (default 3)
  AES_SINK             count | noop   (default count — bench.py methodology)
  AES_EXPLAIN_DIR      where --explain writes files (default plans/r06)
  AES_EXPLAIN_SUFFIX   filename suffix (default "before")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_spark  # same session config as the frozen bench


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("AES_EXTRA_REPEATS", "3"))
    sink = os.environ.get("AES_SINK", "count")

    args = [a for a in sys.argv[1:]]
    explain_only = "--explain" in args
    args = [a for a in args if not a.startswith("--explain")]
    want_all = "--all" in args
    args = [a for a in args if a != "--all"]

    spark = build_spark(cpus)
    import __spark_entry__ as entry

    qs = entry.queries()
    names = list(qs) if want_all else args
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if explain_only:
        out_dir = os.environ.get("AES_EXPLAIN_DIR", "plans/r06")
        suffix = os.environ.get("AES_EXPLAIN_SUFFIX", "before")
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path}")
            spark.catalog.clearCache()
        return

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        best = None
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            t = time.monotonic() - t0
            best = t if best is None else min(best, t)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(json.dumps({name: timings[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "sink": sink, "repeats": repeats,
                      "timings": timings}))


if __name__ == "__main__":
    main()
