"""Per-host crawl politeness from robots.txt ``Crawl-delay``.

``operators/weburl.py::parse_robots_txt`` extracts the allow/disallow
rule table; robots bodies also carry the de-facto ``Crawl-delay:``
directive, and a real fetch fleet paces each host at ITS delay, not a
global constant.  This module parses the directive (same group
semantics as the rule parser: a directive belongs to the most recent
``User-agent`` group; a group naming the agent exactly beats the ``*``
group; the first valid value in the winning group wins) and provides
``crawl_schedule_per_host`` — the same closed form the batch scheduler
uses (slot_i = i*D + running-max(ts_j - j*D), one per-host window, no
sequential fold) with D joined in per host.

With every host's delay equal to the constant, output is row-identical
to ``weburl.crawl_schedule`` (pinned in tests/test_politeness.py along
with a pure-Python sequential-fold oracle for the mixed-delay case).

Scale shape: the delays table is hosts-sized (broadcastable); the
schedule is one window partitioned by host — identical to the audited
``crawl_schedule`` plan.  Parsing is Arrow-batched over robots bodies
(one row per host, linear in robots bytes).

Unregistered as a driver query this round (window saturation,
NOTES.md), like the rest of the round-5 additions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_crawl_delays(robots: DataFrame, host_col: str = "host",
                       content_col: str = "content",
                       agent: str = "*") -> DataFrame:
    """(host, delay_s bigint) for every host whose robots.txt names a
    valid Crawl-delay for ``agent``.  Fractional delays round UP
    (politeness never rounds toward rudeness); non-numeric and
    negative values are ignored, hosts without a directive emit no
    row (callers supply the default)."""
    import pandas as pd

    def parse_one(content: str):
        best = None  # (specificity, delay) — 1 = exact agent, 0 = *
        cur_agents: list = []
        in_group_body = False
        for raw in (content or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if in_group_body:
                    cur_agents = []
                    in_group_body = False
                cur_agents.append(val.lower())
                continue
            in_group_body = True
            if key != "crawl-delay":
                continue
            spec = None
            if agent.lower() in cur_agents:
                spec = 1
            elif "*" in cur_agents:
                spec = 0
            if spec is None:
                continue
            try:
                d = float(val)
            except ValueError:
                continue
            if not (d >= 0) or math.isinf(d):
                continue
            # first valid directive of the most specific group wins
            if best is None or spec > best[0]:
                best = (spec, int(math.ceil(d)))
        return None if best is None else best[1]

    def fn(batches):
        for pdf in batches:
            hosts, delays = [], []
            for h, c in zip(pdf[host_col], pdf[content_col]):
                d = parse_one(c)
                if d is not None:
                    hosts.append(h)
                    delays.append(d)
            yield pd.DataFrame({
                "host": pd.Series(hosts, dtype="object"),
                "delay_s": pd.Series(delays, dtype="int64")})

    return robots.select(host_col, content_col) \
        .mapInPandas(fn, "host string, delay_s bigint")


def crawl_schedule_per_host(df: DataFrame, delays: DataFrame,
                            host_col: str = "host", ts_col: str = "ts",
                            id_col: str = "doc_id",
                            default_delay: int = 5) -> DataFrame:
    """``weburl.crawl_schedule`` with a per-host delay column: join the
    hosts-sized ``delays`` (host, delay_s) table (left; missing hosts
    get ``default_delay``), then the identical closed form —
    slot_i = i*D + max_{j<=i}(ts_j - j*D) over one per-host window.
    Emits (doc_id, host, ts, delay_s, slot, wait)."""
    from pyspark.sql import Window

    base = (df.select(id_col, host_col, ts_col)
              .join(F.broadcast(delays), on=host_col, how="left")
              .withColumn("delay_s",
                          F.coalesce(F.col("delay_s"),
                                     F.lit(default_delay))
                           .cast("bigint")))
    w = Window.partitionBy(host_col).orderBy(ts_col, id_col)
    r = (F.row_number().over(w) - F.lit(1)).cast("bigint")
    base = base.withColumn("_r", r).withColumn(
        "_adj", F.col(ts_col) - F.col("_r") * F.col("delay_s"))
    run_max = F.max("_adj").over(
        Window.partitionBy(host_col).orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0))
    return (base.withColumn(
                "slot",
                (F.col("_r") * F.col("delay_s") + run_max)
                .cast("bigint"))
            .select(id_col, host_col,
                    F.col(ts_col).cast("bigint").alias(ts_col),
                    "delay_s", "slot",
                    (F.col("slot") - F.col(ts_col)).cast("bigint")
                    .alias("wait")))
