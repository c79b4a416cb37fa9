"""Parquet bloom-filtered writes — point-lookup pruning at rest.

At 100 TB the incremental patterns (`incremental_new`'s unseen-keys
anti-join, checkpoint probes, url backfills) issue POINT lookups against
huge tables; parquet bloom filters let the scan skip row groups that
certainly don't contain the key, without reading the column data.  This
helper applies the per-column writer options (`parquet.bloom.filter.
enabled#<col>` + expected NDV) that Spark's parquet writer supports
natively — the filter bytes land in the file footer region, verified by
tests/test_bloomwrite.py via the on-disk size delta (pyarrow in this
container predates bloom metadata accessors) plus lookup correctness.

Sizing: expected NDV per FILE (not per table) — overshooting wastes
footer bytes, undershooting inflates the false-positive rate and reads
row groups anyway.  Pair with `plans/shards.py` / `repartition` so the
per-file key count is predictable.

Low-cardinality columns get NO bloom filter even when requested:
parquet-mr skips the filter when the column chunk stays fully
dictionary-encoded, because the dictionary page already answers
membership exactly — so asking for one on a 50-value host column is a
no-op by design (pinned in tests/test_bloomwrite.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_with_bloom(df: DataFrame, path: str, bloom_cols: dict[str, int],
                     mode: str = "overwrite", **writer_options) -> None:
    """Write parquet with bloom filters on ``bloom_cols`` (column ->
    expected distinct values per file)."""
    w = df.write.mode(mode)
    for col, ndv in bloom_cols.items():
        w = (w.option(f"parquet.bloom.filter.enabled#{col}", "true")
             .option(f"parquet.bloom.filter.expected.ndv#{col}", str(ndv)))
    for k, v in writer_options.items():
        w = w.option(k, v)
    w.parquet(path)
