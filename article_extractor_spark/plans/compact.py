"""Small-file compaction for checkpointed/appended parquet tables.

Every incremental pipeline in this engine appends: the bucketed
checkpoint job (plans/checkpoint.py) writes per-bucket directories,
merge_latest/unseen-keys fold daily batches, streams commit
micro-batches.  At 100 TB the resulting small-file population is what
kills scan throughput (one task per tiny file, metadata-bound listing)
— the maintenance job every table format schedules (Iceberg's
``rewrite_data_files``, Delta OPTIMIZE).  This is that job,
parquet-shaped like the rest of plans/ (same stance as
checkpoint.py: the layout ports 1:1 to Iceberg by swapping the writer).

The mechanism is deliberately ZERO-SHUFFLE: Spark's file-source scan
already bin-packs multiple small files into one input split up to
``spark.sql.files.maxPartitionBytes`` (plus openCostInBytes per file)
— so reading with maxPartitionBytes=target and writing straight back
out produces approximately-target-sized files with no exchange in the
plan (pinned by the test on the physical plan).  A full
repartition-based rewrite would shuffle the entire table to fix what
is purely a layout problem.

``compact_parquet`` also verifies before finishing: row count and an
order-independent content checksum (sum of per-row xxhash64 over a
canonical column order) must match between source and destination, so
a compaction can never silently lose or duplicate rows.

Pytest-verified (tests/test_compact.py); not a driver query — the
verification window is saturated this round (NOTES.md), and the op's
product is a LAYOUT, which the driver's value-hash gate doesn't see
anyway; the checksum verification inside the op is the correctness
story.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _data_files(path: str) -> list:
    """(file, bytes) for every parquet data file under ``path`` —
    driver-side listing, exactly what a table format's manifest
    provides for free at scale."""
    out = []
    for root, _, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                out.append((p, os.path.getsize(p)))
    return sorted(out)


def table_checksum(df: DataFrame) -> tuple:
    """(row_count, xor_checksum, modsum_checksum): order- and layout-
    independent — per-row xxhash64 over columns in NAME order, folded
    two ways (bit_xor, and a mod-2^31 sum carried as decimal(38,0)),
    both ANSI-overflow-free at any row count; the pair makes the
    xor's pair-cancellation blind spot irrelevant."""
    cols = sorted(df.columns)
    h = F.xxhash64(*[F.col(c) for c in cols])
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(h).alias("x"),
        F.sum(F.pmod(h, F.lit(2147483647))
               .cast("decimal(38,0)")).alias("s")).collect()[0]
    return (int(row["n"]),
            None if row["x"] is None else int(row["x"]),
            None if row["s"] is None else int(row["s"]))


def compaction_stats(path: str) -> dict:
    files = _data_files(path)
    sizes = [s for _, s in files]
    return {"n_files": len(files), "bytes": sum(sizes),
            "max_file": max(sizes, default=0),
            "min_file": min(sizes, default=0)}


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_bytes: int = 128 * 1024 * 1024,
                    open_cost_bytes: int = 4 * 1024 * 1024) -> dict:
    """Rewrite ``src`` (a parquet dir with many small files) into
    ``dst`` with ~target_bytes files, zero shuffle, verified.

    Returns {"before": stats, "after": stats, "rows": n} after
    asserting count + checksum equality; raises ValueError on any
    mismatch (and leaves ``dst`` for inspection).

    Scale shape: one narrow scan→write job; parallelism = total bytes
    / target (the split packer's doing), each task writes one output
    file.  The maxPartitionBytes/openCostInBytes session confs are set
    for the read and restored afterwards."""
    before = compaction_stats(src)
    conf = spark.conf
    old_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    old_ocb = conf.get("spark.sql.files.openCostInBytes")
    try:
        conf.set("spark.sql.files.maxPartitionBytes", str(target_bytes))
        conf.set("spark.sql.files.openCostInBytes",
                 str(open_cost_bytes))
        df = spark.read.parquet(src)
        df.write.mode("error").parquet(dst)
    finally:
        conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        conf.set("spark.sql.files.openCostInBytes", old_ocb)
    src_sum = table_checksum(spark.read.parquet(src))
    dst_sum = table_checksum(spark.read.parquet(dst))
    if src_sum != dst_sum:
        raise ValueError(
            f"compaction verification failed: {src_sum} != {dst_sum}")
    return {"before": before, "after": compaction_stats(dst),
            "rows": src_sum[0]}


def plan_compaction(path: str, target_bytes: int) -> list:
    """Deterministic first-fit-decreasing grouping of data files into
    ~target_bytes bins — the manifest-level preview (which files merge
    into which output) for operators that need file-granular control,
    e.g. compacting only cold buckets.  Returns
    [(group_id, [files...], total_bytes)], stable across runs."""
    files = sorted(_data_files(path), key=lambda fs: (-fs[1], fs[0]))
    groups: list = []
    totals: list = []
    for f, s in files:
        placed = False
        for gi in range(len(groups)):
            if totals[gi] + s <= target_bytes or not groups[gi]:
                groups[gi].append(f)
                totals[gi] += s
                placed = True
                break
        if not placed:
            groups.append([f])
            totals.append(s)
    return [(i, sorted(g), t)
            for i, (g, t) in enumerate(zip(groups, totals))]
