"""Leakage-safe corpus splitting: host-disjoint train/val/test
assignment with a per-host document cap.

Training pipelines built on web crawls must split at the HOST level,
not the document level — near-duplicate pages from one site otherwise
straddle train and eval and inflate benchmark scores (the standard
decontamination concern; cf. the reference's per-host config keying,
/root/reference/src/full_text_parser/config/mod.rs — the host is the
natural unit of page similarity).  This module provides the two
primitives as pure DataFrame transformations:

* split assignment hashes the HOST (group), never the doc, so every
  page of a site lands in exactly one split — deterministic, seedable,
  no rand(), reproducible across runs / retries / cluster sizes;
* a per-host cap keeps the top-k documents per host by a deterministic
  quality order (longest first, doc_id tie-break), bounding any single
  host's contribution to the corpus (crawls are Zipfian in host size —
  without a cap the head hosts dominate the token budget).

100 TB shape: the assignment is a zero-shuffle projection; the cap is
ONE shuffle on the group key, and the per-group state is a row_number
counter (no buffering beyond the sort run).  Host cardinality in a web
crawl is ~10^7-10^8, so the groupBy parallelizes wide; the cap itself
removes the head-host skew that would otherwise make downstream
shuffles lopsided."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_split(df: DataFrame, group_col: str = "source",
                 val_pct: int = 10, test_pct: int = 10,
                 seed: str = "split1") -> DataFrame:
    """Add a ``split`` column ('train' | 'val' | 'test') hashed from
    ``group_col`` so a group is never divided across splits.

    bucket = hash60(seed:group) % 100; val gets [0, val_pct), test
    gets [val_pct, val_pct+test_pct), train the rest.  Threshold
    property: growing val_pct only moves buckets train->val, never
    reshuffles existing assignments.  Zero shuffle."""
    bucket = F.expr(
        f"cast(conv(substr(md5(concat('{seed}', ':', {group_col})), 1, 15), "
        f"16, 10) as bigint) % 100"
    )
    return df.withColumn(
        "split",
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def cap_per_group(df: DataFrame, group_col: str = "source",
                  cap: int = 20, order_col: str = "n_chars",
                  id_col: str = "doc_id") -> DataFrame:
    """Add ``grp_rank`` (1-based, by ``order_col`` DESC then ``id_col``
    ASC — fully deterministic) and boolean ``kept`` = rank <= cap.

    Emits ALL rows with the flag rather than filtering, so callers can
    audit what the cap dropped; one shuffle on the group key."""
    w = (Window.partitionBy(group_col)
         .orderBy(F.col(order_col).desc(), F.col(id_col).asc()))
    return (df
            .withColumn("grp_rank", F.row_number().over(w))
            .withColumn("kept", F.col("grp_rank") <= F.lit(cap)))


def train_split(df: DataFrame, group_col: str = "source",
                val_pct: int = 10, test_pct: int = 10, cap: int = 20,
                order_col: str = "n_chars", id_col: str = "doc_id",
                seed: str = "split1") -> DataFrame:
    """Composite: host-disjoint split + per-host cap, emitting
    (id, group, split, grp_rank, kept) per document."""
    out = assign_split(df, group_col, val_pct, test_pct, seed)
    out = cap_per_group(out, group_col, cap, order_col, id_col)
    return out.select(F.col(id_col), F.col(group_col),
                      "split", "grp_rank", "kept")
