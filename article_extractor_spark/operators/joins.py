"""Join operators Spark lacks as built-ins, composed from DataFrame
primitives with cluster-scale plans.

* :func:`asof_join` — for each left row, the latest right row with
  ``right_ts <= left_ts`` per key (a temporal / point-in-time join: "which
  crawl of this host was current when the event happened").  Implemented
  as the canonical distributed sort-merge form: union both sides, one
  shuffle on the key, one in-partition sort, then a running
  ``last(value, ignorenulls)`` window — no per-key loops, no range
  cross-join blowup.  DuckDB's native ``ASOF JOIN`` is the value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str] = "k",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_vals: tuple[str, ...] = ("val",),
    how: str = "left",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``right_vals`` of the
    most recent ``right`` row (``right_ts <= left_ts``) with the same
    ``key`` (a column name or a list for composite keys); NULLs when no
    right row precedes it (how='left') or the row is dropped
    (how='inner').

    Scale shape: |L|+|R| rows shuffle ONCE on ``key``; each partition
    sorts by (ts, side) and carries values forward — linear, no
    key×key fan-out, skew bounded by the hottest key (salt upstream if a
    single key exceeds a partition).

    Equal timestamps: the right row is visible to left rows at the same
    timestamp (<= semantics, matching DuckDB ASOF).  The matched right
    row is carried as ONE struct, so all ``right_vals`` come from the
    same row, and a matched row whose value columns are NULL yields
    NULLs (the latest row wins regardless of its values — DuckDB ASOF
    semantics), never an older row's values.  Duplicate right rows on
    the same (key, ts) resolve deterministically to the row with the
    greatest ``struct(right_vals)`` (field-wise comparison).
    """
    keys = [key] if isinstance(key, str) else list(key)
    lcols = left.columns
    rv_struct = lambda: F.struct(*[F.col(c).alias(c) for c in right_vals])  # noqa: E731
    rv_type = right.select(rv_struct().alias("_r")).schema["_r"].dataType
    l = left.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        # NULL struct for left rows: last(_r, ignorenulls) skips them, so
        # the carry is keyed on right-ROW presence, not value presence.
        F.lit(None).cast(rv_type).alias("_r"),
    )
    r = right.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.select(*lcols).dtypes],
        rv_struct().alias("_r"),
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal ts (<= visibility);
    # duplicate right (key, ts) rows sort by the whole value struct, so
    # `last` deterministically picks the greatest one.
    w = (
        Window.partitionBy(*[f"_k{i}" for i in range(len(keys))])
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(),
                 F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        F.last("_r", ignorenulls=True).over(w).alias("_asof"),
    ).where(F.col("_side") == 1)
    out = carried.select(
        *lcols,
        F.col("_asof").alias("_asof"),
        *[F.col(f"_asof.{c}").alias(c) for c in right_vals],
    )
    if how == "inner":
        out = out.where(F.col("_asof").isNotNull())
    return out.drop("_asof")
