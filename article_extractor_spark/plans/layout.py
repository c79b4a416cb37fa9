"""Range-sorted writes — min/max row-group pruning at rest.

The zero-cost complement to `plans/bloomwrite.py`: parquet stores
per-row-group min/max statistics for every column, and the reader skips
row groups whose range excludes the predicate — but only if the layout
CLUSTERS the column.  ``write_range_sorted`` arranges that with
``repartitionByRange`` + ``sortWithinPartitions`` before the write, so
range scans (time slices of `warc_ts`, id ranges, quality bands) read
a sliver of the bytes.  At 100 TB this is the difference between a
time-slice backfill scanning one day's row groups and scanning the
corpus.

``scan_output_rows`` exposes the executed plan's parquet-scan metrics —
the same introspection the pruning test uses, handy for plan audits:
after an action, it reports how many rows the SCAN emitted (post
row-group pruning, pre filter), which is the honest measure of I/O
avoided.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_range_sorted(df: DataFrame, path: str, sort_col: str | Column,
                       n_files: int, mode: str = "overwrite",
                       **writer_options) -> None:
    """Write parquet range-clustered on ``sort_col``: each file owns a
    contiguous range (repartitionByRange) and is sorted inside
    (sortWithinPartitions), so both file-level and row-group-level
    min/max exclude non-matching ranges."""
    col = F.col(sort_col) if isinstance(sort_col, str) else sort_col
    w = (df.repartitionByRange(n_files, col)
         .sortWithinPartitions(col)
         .write.mode(mode))
    for k, v in writer_options.items():
        w = w.option(k, v)
    w.parquet(path)


def scan_output_rows(df: DataFrame) -> int:
    """Execute ``df``'s OWN physical plan and return the total rows
    EMITTED BY ITS PARQUET SCANS — after row-group/file pruning, before
    any Filter node — i.e. the rows actually read off disk.  (A
    ``df.count()`` would build a separate QueryExecution whose metrics
    this Dataset never sees, so the plan is executed directly.)"""
    plan = df._jdf.queryExecution().executedPlan()
    plan.execute().count()  # run THIS plan instance; fills its metrics
    total = 0

    def walk(node):
        nonlocal total
        if "Scan parquet" in node.nodeName():
            m = node.metrics()
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    total += kv._2().value()
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        # AQE wraps the real plan; unwrap if present
        if node.nodeName().startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())

    walk(plan)
    return total
