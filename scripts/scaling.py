"""Two-parallelism-level scaling evidence (north rule: efficiency >= 0.8
between cluster sizes N and 4N; sandbox evidence = local[8] vs local[32]
on the same input, per BASELINE.md).

Runs bench.py in fresh subprocesses (separate JVMs), computes
efficiency = throughput(4N) / (4 * throughput(N)) for the extraction
headline, and prints a markdown table ready for BENCH/BASELINE.md."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str, mult: int) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "AES_BENCH_MULT": str(mult),
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("AES_BENCH_MULT", "16"))
    rounds = int(os.environ.get("AES_SCALING_ROUNDS", "2"))
    # AES_SCALING_N overrides the lower level (4N follows): the default
    # 8/32 pair spans the socket's memory-bus saturation knee, while
    # 2/8 measures the UNSATURATED regime every 8-core executor host of
    # a real cluster runs in — report both (BENCH/BASELINE.md)
    n = int(os.environ.get("AES_SCALING_N", "8"))
    four_n = 4 * n
    # alternate levels and keep the best of each: the sandbox carries
    # bursty background load, and alternating avoids attributing one load
    # burst entirely to one level
    lo = hi = None

    def better(a, b):
        if a is None:
            return b
        return a if a["extraction_docs_per_sec"] >= b["extraction_docs_per_sec"] else b

    for _ in range(rounds):
        lo = better(lo, run(n, sf_dir, mult))
        hi = better(hi, run(four_n, sf_dir, mult))
    tp_lo = lo["extraction_docs_per_sec"]
    tp_hi = hi["extraction_docs_per_sec"]
    eff = tp_hi / (4 * tp_lo)
    tp_lo_nar = lo.get("extraction_docs_per_sec_narrow")
    tp_hi_nar = hi.get("extraction_docs_per_sec_narrow")
    eff_nar = (tp_hi_nar / (4 * tp_lo_nar)) if tp_lo_nar and tp_hi_nar else None
    result = {
        "sf_dir": sf_dir,
        "docs": lo["extraction_docs"],
        f"throughput_n{n}": tp_lo,
        f"throughput_n{four_n}": tp_hi,
        "scaling_efficiency": round(eff, 3),
        f"throughput_n{n}_narrow": tp_lo_nar,
        f"throughput_n{four_n}_narrow": tp_hi_nar,
        "scaling_efficiency_narrow": round(eff_nar, 3) if eff_nar else None,
        f"suite_sec_n{n}": lo["value"],
        f"suite_sec_n{four_n}": hi["value"],
        f"queries_n{four_n}": hi["queries"],
    }
    print(json.dumps(result))
    print()
    print("| cores | extraction docs/sec | narrow docs/sec | suite sec |")
    print("| --- | --- | --- | --- |")
    print(f"| local[{n}] | {tp_lo} | {tp_lo_nar} | {lo['value']} |")
    print(f"| local[{four_n}] | {tp_hi} | {tp_hi_nar} | {hi['value']} |")
    print(f"\nefficiency = {tp_hi} / (4 x {tp_lo}) = **{eff:.3f}**"
          + (f" (narrow: {eff_nar:.3f})" if eff_nar else ""))


if __name__ == "__main__":
    main()
