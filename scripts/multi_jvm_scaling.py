"""Multi-JVM scaling evidence: emulate "N executor machines" as N
concurrent local[8] Sparks, each owning a disjoint url-hash shard.

The north rule's criterion is throughput scaling across CLUSTER SIZES
(N vs 4N executors).  local[8] vs local[32] inside ONE JVM conflates two
effects: socket-level contention (hits any parallel run, see the
multiprocessing control) and single-JVM oversubscription (task threads +
python workers sharing cores).  Neither exists ACROSS machines — each
executor host runs its own JVM on its own cores, and the extraction map
stage has zero cross-partition communication.  Running 4 isolated JVMs
concurrently on disjoint shards is therefore the closest single-box proxy
for 4 executor machines.

Prints: single local[8] throughput, aggregate of 4 concurrent local[8]
shard instances, and efficiency = aggregate / (4 x single).

Run SOLO: concurrent work contaminates the numbers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def spawn(cpus: int, mult: int, shard: str | None):
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "AES_BENCH_MULT": str(mult),
        "AES_BENCH_EXTRACT_ONLY": "1",
        "AES_BENCH_REPEATS": os.environ.get("AES_BENCH_REPEATS", "2"),
    })
    if shard:
        env["AES_BENCH_SHARD"] = shard
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def result(proc) -> dict:
    out, _ = proc.communicate(timeout=3600)
    return json.loads([l for l in out.splitlines() if l.startswith("{")][-1])


def main():
    mult = int(os.environ.get("AES_BENCH_MULT", "8"))
    k = int(os.environ.get("AES_JVMS", "4"))

    single = result(spawn(8, mult, None))
    tp_single = single["extraction_docs_per_sec"]

    procs = [spawn(8, mult, f"{i}/{k}") for i in range(k)]
    shards = [result(p) for p in procs]
    tp_shards = [s["extraction_docs_per_sec"] for s in shards]
    docs_shards = [s["extraction_docs"] for s in shards]
    agg = sum(tp_shards)
    eff = agg / (k * tp_single)

    print(json.dumps({
        "mode": f"{k} concurrent local[8] JVMs on disjoint url-hash shards",
        "docs_total": sum(docs_shards),
        "throughput_single_jvm8": tp_single,
        "throughput_per_shard": tp_shards,
        "throughput_aggregate": round(agg, 1),
        "scaling_efficiency_multi_jvm": round(eff, 3),
    }))
    print(f"\nsingle local[8]: {tp_single} docs/s")
    print(f"{k} concurrent local[8] shards: {agg:.0f} docs/s aggregate")
    print(f"efficiency = {agg:.0f} / ({k} x {tp_single}) = **{eff:.3f}**")


if __name__ == "__main__":
    main()
