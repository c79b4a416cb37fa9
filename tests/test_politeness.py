"""Per-host Crawl-delay politeness (operators/politeness.py): directive
parsing (group semantics, specificity, ceil, junk tolerance) and the
per-host-delay closed-form schedule — pinned against a pure-Python
sequential fold and against weburl.crawl_schedule at constant delay."""

import random

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-politeness-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


ROBOTS = [
    ("a.com", """User-agent: *
Crawl-delay: 10
"""),
    ("b.org", """User-agent: mybot
Crawl-delay: 2.5
User-agent: *
Crawl-delay: 30
"""),
    ("c.net", """User-agent: otherbot
Crawl-delay: 1
"""),
    ("d.io", """User-agent: *
Crawl-delay: banana
Crawl-delay: 7
Crawl-delay: 9
"""),
    ("e.gov", "User-agent: *\nDisallow: /x\n"),
    ("f.edu", """User-agent: a
User-agent: *
Crawl-delay: 4
"""),
    ("g.neg", "User-agent: *\nCrawl-delay: -3\n"),
]


def test_parse_crawl_delays(spark):
    from article_extractor_spark.operators.politeness import (
        parse_crawl_delays)

    df = spark.createDataFrame(ROBOTS, "host string, content string")
    got = {r["host"]: r["delay_s"] for r in
           parse_crawl_delays(df, agent="mybot").collect()}
    assert got == {
        "a.com": 10,
        "b.org": 3,   # exact-agent group beats *, 2.5 ceils to 3
        "d.io": 7,    # junk skipped, FIRST valid in group wins
        "f.edu": 4,   # shared-agent-line group includes *
    }
    # c.net names another bot only; e.gov has no directive; g.neg < 0
    star = {r["host"]: r["delay_s"] for r in
            parse_crawl_delays(df).collect()}
    assert star["b.org"] == 30  # for agent '*' the * group applies


def _oracle_schedule(rows, delays, default):
    from collections import defaultdict

    byh = defaultdict(list)
    for doc_id, host, ts in rows:
        byh[host].append((ts, doc_id))
    out = {}
    for host, rs in byh.items():
        d = delays.get(host, default)
        last = None
        for ts, doc_id in sorted(rs):
            slot = ts if last is None else max(ts, last + d)
            out[doc_id] = (host, ts, d, slot, slot - ts)
            last = slot
    return out


def test_schedule_matches_sequential_fold(spark):
    from article_extractor_spark.operators.politeness import (
        crawl_schedule_per_host)

    rng = random.Random(5150)
    hosts = ["a.com", "b.org", "c.net", "nodelay.xyz"]
    rows = [(i, rng.choice(hosts), rng.randint(0, 120))
            for i in range(300)]
    delays = {"a.com": 10, "b.org": 3, "c.net": 1}
    df = spark.createDataFrame(rows, "doc_id long, host string, ts long")
    ddf = spark.createDataFrame(list(delays.items()),
                                "host string, delay_s long")
    got = {r["doc_id"]: (r["host"], r["ts"], r["delay_s"], r["slot"],
                         r["wait"]) for r in
           crawl_schedule_per_host(df, ddf, default_delay=5).collect()}
    assert got == _oracle_schedule(rows, delays, 5)


def test_constant_delay_matches_weburl_schedule(spark):
    from article_extractor_spark.operators.politeness import (
        crawl_schedule_per_host)
    from article_extractor_spark.operators.weburl import crawl_schedule

    rng = random.Random(99)
    rows = [(i, f"h{rng.randint(0, 5)}.com", rng.randint(0, 60))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, host string, ts long")
    hosts = df.select("host").distinct()
    ddf = hosts.withColumn("delay_s", F.lit(5).cast("bigint"))
    a = sorted(map(tuple, crawl_schedule_per_host(df, ddf)
                   .select("doc_id", "host", "ts", "slot", "wait")
                   .collect()))
    b = sorted(map(tuple, crawl_schedule(df, min_delay=5).collect()))
    assert a == b


def test_robots_to_schedule_glue(spark):
    from article_extractor_spark.operators.politeness import (
        crawl_schedule_per_host, parse_crawl_delays)

    robots = spark.createDataFrame(ROBOTS, "host string, content string")
    delays = parse_crawl_delays(robots)
    frontier = spark.createDataFrame(
        [(1, "a.com", 0), (2, "a.com", 0), (3, "a.com", 0),
         (4, "e.gov", 0), (5, "e.gov", 0)],
        "doc_id long, host string, ts long")
    got = {r["doc_id"]: r for r in crawl_schedule_per_host(
        frontier, delays, default_delay=2).collect()}
    # a.com paced at its declared 10s; e.gov at the 2s default
    assert [got[i]["slot"] for i in (1, 2, 3)] == [0, 10, 20]
    assert [got[i]["slot"] for i in (4, 5)] == [0, 2]
