"""Incremental corpus maintenance — the operators a recurring crawl needs
to fold a new snapshot into an existing corpus without reprocessing it.

* :func:`merge_latest` — Iceberg-MERGE-style upsert semantics expressed
  relationally: union the corpus with the incoming snapshot and keep the
  newest row per key (crawl timestamp, incoming wins ties).  One shuffle
  keyed on the merge key; no driver-side state.
* :func:`new_docs` — the pre-filter for expensive downstream work: only
  incoming rows whose key (or content hash) is absent from the corpus.
  A left-anti join — broadcastable when the incoming side is small,
  shuffle-join otherwise (AQE decides; no forced hint)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_latest(existing: DataFrame, incoming: DataFrame,
                 key: str = "url", ts: str = "warc_ts") -> DataFrame:
    """Upsert: one row per ``key`` — the latest by ``ts``; on an exact
    ``ts`` tie the INCOMING row wins (re-crawl replaces).  Columns are
    the union-by-name of both sides.

    Scale shape: |corpus| + |snapshot| rows through ONE hash shuffle on
    ``key``, per-key top-1 via row_number — the canonical distributed
    MERGE; swap the sink for an actual Iceberg MERGE INTO on a cluster
    with a catalog, semantics identical."""
    tagged = existing.withColumn("_src", F.lit(0)).unionByName(
        incoming.withColumn("_src", F.lit(1)), allowMissingColumns=True)
    w = Window.partitionBy(key).orderBy(
        F.col(ts).desc(), F.col("_src").desc())
    return (
        tagged.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk", "_src")
    )


def new_docs(incoming: DataFrame, existing: DataFrame,
             key: str = "url") -> DataFrame:
    """Incoming rows whose ``key`` does not exist in the corpus — feed
    ONLY these to extraction/dedup on an incremental run."""
    return incoming.join(existing.select(key).distinct(), key, "left_anti")
