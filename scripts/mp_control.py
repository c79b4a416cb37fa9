"""No-Spark hardware control in the SAME process topology as the Spark
scaling runs: G concurrent process-groups of W extraction workers each.

The local-cluster scaling experiment (scripts/multi_jvm_scaling.py,
AES_LOCAL_CLUSTER=1) measures 1x8 vs 4x8 executor JVMs on this box.  That
number conflates (a) the plan/engine cost of scaling and (b) what the
SOCKET charges any 32-way parallel run of this allocation-heavy workload.
This control isolates (b): the identical extraction core (same parser,
same synthesize_page_py pages) under bare multiprocessing, first as one
group of W workers, then as G concurrent groups of W workers — zero JVM,
zero shuffle, zero Spark.  efficiency = aggregate(GxW) / (G x single(W)).

Whatever deficit THIS control shows at GxW is environmental; only the gap
between the Spark run and this control is attributable to the engine.

Run SOLO (the box carries bursty background load).
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_PARSER = None


def _init():
    global _PARSER
    from article_extractor_spark.core.pipeline import get_parser
    _PARSER = get_parser()
    # warm: one parse so lazy imports/regex compilation leave the window
    _PARSER.parse_offline(["<html><body><p>" + "w" * 600 + "</p></body></html>"])


def _work(chunk):
    from article_extractor_spark.core.urlutil import Url
    n = 0
    for url_s, html in chunk:
        try:
            u = Url.parse(url_s)
        except Exception:
            u = None
        try:
            _PARSER.parse_offline([html], url=u)
        except Exception:
            pass
        n += 1
    return n


def _pages(mult: int):
    import duckdb

    from article_extractor_spark.sources.pages import synthesize_page_py
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rows = duckdb.sql(
        f"SELECT doc_id, text, source FROM "
        f"read_parquet('{sf_dir}/documents.parquet')").fetchall()
    pages = []
    for rep in range(mult):
        for doc_id, text, source in rows:
            url, html = synthesize_page_py(doc_id, text, source)
            pages.append((f"{url}?rep={rep}", html))
    return pages


def _group(workers: int, mult: int, q):
    pages = _pages(mult)
    chunks = [pages[i::workers * 4] for i in range(workers * 4)]
    with mp.Pool(workers, initializer=_init) as pool:
        pool.map(_work, [chunks[0][:8]])  # warm the pool
        t0 = time.monotonic()
        done = sum(pool.map(_work, chunks))
        el = time.monotonic() - t0
    q.put((done, el, done / el))


def run_groups(g: int, workers: int, mult: int):
    q = mp.Queue()
    procs = [mp.Process(target=_group, args=(workers, mult, q))
             for _ in range(g)]
    for p in procs:
        p.start()
    res = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return res


def main():
    workers = int(os.environ.get("AES_MP_WORKERS", "8"))
    g = int(os.environ.get("AES_MP_GROUPS", "4"))
    mult = int(os.environ.get("AES_BENCH_MULT", "4"))

    single = run_groups(1, workers, mult)[0]
    tp1 = single[2]

    multi = run_groups(g, workers, mult)
    agg = sum(r[2] for r in multi)
    eff = agg / (g * tp1)
    print(json.dumps({
        "mode": f"bare multiprocessing, 1x{workers} vs {g}x{workers} "
                "concurrent pools (no Spark)",
        "docs_per_group": single[0],
        "throughput_1x%d" % workers: round(tp1, 1),
        "throughput_groups": [round(r[2], 1) for r in multi],
        "throughput_aggregate": round(agg, 1),
        "scaling_efficiency_control": round(eff, 3),
    }))
    print(f"\n1x{workers} pool: {tp1:.0f} docs/s")
    print(f"{g}x{workers} concurrent pools: {agg:.0f} docs/s aggregate")
    print(f"control efficiency = {eff:.3f}")


if __name__ == "__main__":
    main()
