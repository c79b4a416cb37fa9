"""Stateful Structured Streaming operators over the events table.

* :func:`sessionize_stream` — 30-min-inactivity-gap sessionization as a
  CUSTOM STATEFUL operator (``applyInPandasWithState``): per-user state
  carries the open session's aggregates across micro-batches; a closed
  session is emitted exactly once, when the event that breaks the gap
  arrives.  The emitted rows use the same aggregate discipline as the
  batch twin (``__spark_entry__.q_sessionize``): value sums are exact
  1e-4-quantized integers, durations are floored epoch-second spans — so
  closed sessions are row-identical to the batch window formulation
  (asserted in tests/test_streaming.py).

* :func:`windowed_counts_stream` — event-time tumbling-window counts with
  a watermark for late data; append mode emits a window only after the
  watermark passes it (exactly-once per window).

Ordering note: state transitions assume per-user event-time order across
micro-batches (true for replayed logs and for sources partitioned by
user with in-order delivery); out-of-order streams need the watermarked
window form instead.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = ("user_id long, session_no long, n_events long, "
                  "session_value double, duration_sec long")
SESSION_STATE = ("session_no long, start_epoch long, last_epoch long, "
                 "n long, vsum_q long")


def _sessionize_group(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_sec: int = 1800,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    if state.exists:
        session_no, start_epoch, last_epoch, n, vsum_q = state.get
    else:
        # numbering starts at 1 to match the batch twin (running sum of
        # gap-break flags, where the first event is a break)
        session_no, start_epoch, last_epoch, n, vsum_q = 1, None, None, 0, 0

    closed = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, value in zip(pdf["ts"], pdf["value"]):
            epoch = int(pd.Timestamp(ts).timestamp())  # floor seconds
            vq = int(round(float(value) * 10_000))
            if last_epoch is not None and epoch - last_epoch > gap_sec:
                closed.append((user_id, session_no, n, vsum_q / 10_000.0,
                               last_epoch - start_epoch))
                session_no += 1
                start_epoch, n, vsum_q = epoch, 0, 0
            if start_epoch is None:
                start_epoch = epoch
            last_epoch = epoch
            n += 1
            vsum_q += vq

    state.update((session_no, start_epoch, last_epoch, n, vsum_q))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_no", "n_events", "session_value",
                     "duration_sec"],
        )


def sessionize_stream(events_stream: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """events(user_id, event_id, ts, value) stream -> closed sessions."""
    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_sec)

    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_counts_stream(events_stream: DataFrame,
                           window: str = "10 minutes",
                           watermark: str = "1 hour") -> DataFrame:
    """Tumbling event-time window counts with late-data watermark.
    Append mode: a window row is emitted once, after the watermark passes
    its end — the standard exactly-once windowed aggregation."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events",
        )
    )
