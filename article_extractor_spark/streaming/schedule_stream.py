"""Streaming crawl-politeness scheduler: the incremental twin of
``operators/weburl.crawl_schedule``.

A live crawl frontier arrives as a stream of (host, doc_id, ts) fetch
requests; each must be assigned an execution slot >= its request time
and >= the host's previous slot + ``min_delay``.  Batch recomputation
per micro-batch would be quadratic in frontier history, so this is a
CUSTOM STATEFUL operator (``applyInPandasWithState``): per-host state
carries only (last assigned slot) — O(1) per host — and each
micro-batch folds its requests against it.  Slots are emitted exactly
once, in append mode.

Parity contract: for any stream replay that delivers each host's
requests in (ts, doc_id) order across micro-batches (the same ordering
note as sessionize_stream), emitted slots are ROW-IDENTICAL to the
batch closed-form window (asserted in tests/test_streaming.py) —
because the recurrence slot_i = max(ts_i, slot_{i-1} + D) is exactly
what the state fold computes and exactly what the batch prefix-max
closed form solves.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCHEDULE_OUTPUT = "doc_id long, host string, ts long, slot long, wait long"
SCHEDULE_STATE = "last_slot long"


def _schedule_group(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    min_delay: int = 5,
) -> Iterator[pd.DataFrame]:
    host = key[0]
    last_slot = state.get[0] if state.exists else None
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "doc_id"])
        for doc_id, ts in zip(pdf["doc_id"], pdf["ts"]):
            ts = int(ts)
            slot = ts if last_slot is None else max(ts, last_slot + min_delay)
            out.append((int(doc_id), host, ts, slot, slot - ts))
            last_slot = slot
    if last_slot is not None:
        state.update((last_slot,))
    if out:
        yield pd.DataFrame(
            out, columns=["doc_id", "host", "ts", "slot", "wait"])


def crawl_schedule_stream(requests_stream: DataFrame,
                          min_delay: int = 5) -> DataFrame:
    """requests(doc_id, host, ts) stream -> scheduled fetches."""
    def fn(key, pdfs, state):
        return _schedule_group(key, pdfs, state, min_delay)

    return (
        requests_stream.select("doc_id", "host", "ts")
        .groupBy("host")
        .applyInPandasWithState(
            fn,
            outputStructType=SCHEDULE_OUTPUT,
            stateStructType=SCHEDULE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
