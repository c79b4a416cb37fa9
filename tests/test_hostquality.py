"""Host-level quality gating: exact aggregates vs a pure replication of
the quality formula, and the domain-drop semantics."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-hostquality-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


GOOD = ("this is a reasonably long piece of the kind of text that a "
        "working website publishes, with punctuation, and enough common "
        "words that the stopword ratio lands in a healthy band. " * 3)
JUNK = "buy cheap now " * 5


def corpus():
    rows = []
    did = 0
    for i in range(4):  # good.test: all good pages
        rows.append((did, f"http://good.test/a{i}", GOOD)); did += 1
    for i in range(4):  # junk.test: all junk
        rows.append((did, f"http://junk.test/s{i}", JUNK)); did += 1
    # mixed.test: one good page drowned by junk (majority rule drops host)
    rows.append((did, "http://mixed.test/good", GOOD)); did += 1
    for i in range(3):
        rows.append((did, f"http://mixed.test/j{i}", JUNK)); did += 1
    # lone.test: single junk page, below min_pages evidence bar
    rows.append((did, "http://lone.test/only", JUNK)); did += 1
    return rows


def test_host_expr_matches_normalize_urls(spark):
    """The inlined host expression must stay row-identical to the frozen
    weburl.normalize_urls host rule (pin against divergence)."""
    from article_extractor_spark.operators.hostquality import host_expr
    from article_extractor_spark.operators.weburl import normalize_urls

    urls = [
        "http://WWW.Example.COM/path", "https://sub.www.site.org:443/x",
        "http://host.test:8080/a?b=1", "https://dot.trailing./p",
        "ftp://other.scheme.net/f", "not a url at all", "",
        "http://www.www.double.test/", "https://UPPER.CASE.IO",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    mine = [r["h"] for r in
            df.select(host_expr("url").alias("h")).collect()]
    theirs = [r["host"] for r in normalize_urls(df).collect()]
    assert mine == theirs


def test_host_aggregates_match_per_doc_scores(spark):
    from article_extractor_spark.operators.hostquality import (MICRO,
                                                               host_quality)
    from article_extractor_spark.operators.textstats import quality_score

    df = spark.createDataFrame(corpus(), "doc_id long, url string, text string")
    per_doc = {r["doc_id"]: r["quality"]
               for r in quality_score(df).collect()}
    hosts = {r["host"]: r for r in host_quality(df).collect()}
    # replicate good.test exactly
    g_ids = [i for i, (d, u, t) in enumerate(corpus()) if "good.test" in u]
    want_sum = sum(round(per_doc[i] * MICRO) for i in range(4))
    assert hosts["good.test"]["n_pages"] == 4
    assert hosts["good.test"]["quality_micro_sum"] == want_sum
    assert hosts["good.test"]["mean_quality_micro"] == want_sum // 4
    assert hosts["junk.test"]["n_low_quality"] >= 0  # integral column exists
    assert set(hosts) == {"good.test", "junk.test", "mixed.test", "lone.test"}


def test_domain_drop_semantics(spark):
    from article_extractor_spark.operators.hostquality import (
        filter_by_host_quality)

    df = spark.createDataFrame(corpus(), "doc_id long, url string, text string")
    kept = filter_by_host_quality(df, min_mean_quality=0.3,
                                  max_low_quality_frac=0.5, min_pages=2)
    kept_hosts = {r["url"].split("/")[2] for r in kept.collect()}
    # whole junk host gone; mixed host gone INCLUDING its good page;
    # lone junk page survives on the evidence bar
    assert "good.test" in kept_hosts
    assert "junk.test" not in kept_hosts
    assert "mixed.test" not in kept_hosts
    assert "lone.test" in kept_hosts
    # with the evidence bar at 1 page, the lone junk host drops too
    kept2 = filter_by_host_quality(df, min_pages=1)
    hosts2 = {r["url"].split("/")[2] for r in kept2.collect()}
    assert hosts2 == {"good.test"}


def test_empty_host_never_gated(spark):
    """Docs whose URL yields no host ('' pseudo-host: relative, garbage,
    null) are never dropped by the domain gate, however junky."""
    from article_extractor_spark.operators.hostquality import (
        filter_by_host_quality)

    rows = [(1, "relative/path.html", JUNK), (2, "not a url", JUNK),
            (3, None, JUNK), (4, "http://junk.test/a", JUNK),
            (5, "http://junk.test/b", JUNK)]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    kept = {r["doc_id"] for r in
            filter_by_host_quality(df, min_pages=1).collect()}
    assert kept == {1, 2, 3}  # junk.test dropped; hostless rows kept


def test_mean_quality_integer_division(spark):
    """mean_quality_micro must be TRUE integer division (div), not a
    double cast — pinned on a sum where both agree, plus the plan shape."""
    from article_extractor_spark.operators.hostquality import host_quality

    df = spark.createDataFrame(
        [(1, "http://h.test/a", GOOD), (2, "http://h.test/b", JUNK),
         (3, "http://h.test/c", GOOD)],
        "doc_id long, url string, text string")
    row = host_quality(df).collect()[0]
    assert row["mean_quality_micro"] == row["quality_micro_sum"] // 3


def test_single_corpus_projection_no_join(spark):
    """host_quality must not self-join the corpus: one projection into
    the host groupBy (the review's 100 TB shape fix)."""
    from article_extractor_spark.operators.hostquality import host_quality

    df = spark.createDataFrame(corpus(), "doc_id long, url string, text string")
    plan = host_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_broadcast_antijoin_plan(spark):
    from article_extractor_spark.operators.hostquality import (
        filter_by_host_quality)

    df = spark.createDataFrame(corpus(), "doc_id long, url string, text string")
    plan = filter_by_host_quality(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Cartesian" not in plan


def test_randomized_aggregate_parity(spark):
    """Random multi-host corpus: host aggregates must equal a pure fold
    over the engine's own per-doc quality scores."""
    import random
    from collections import defaultdict

    from article_extractor_spark.operators.hostquality import (MICRO,
                                                               host_quality)
    from article_extractor_spark.operators.textstats import quality_score

    rng = random.Random(23)
    words = ("the of and a to in is it you that quick brown fox "
             "buy now cheap click free").split()
    rows = []
    for i in range(150):
        n = rng.randrange(5, 120)
        text = " ".join(rng.choice(words) for _ in range(n))
        if rng.random() < 0.3:
            text += "."
        rows.append((i, f"http://host{rng.randrange(6)}.test/{i}", text))
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")

    per_doc = {r["doc_id"]: r["quality"] for r in quality_score(df).collect()}
    want = defaultdict(lambda: [0, 0, 0])
    for i, url, _ in rows:
        host = url.split("/")[2]
        q = round(per_doc[i] * MICRO)
        want[host][0] += 1
        want[host][1] += q
        want[host][2] += int(q < int(0.2 * MICRO))
    got = {r["host"]: r for r in host_quality(df).collect()}
    assert set(got) == set(want)
    for h, (n, qsum, nlow) in want.items():
        assert got[h]["n_pages"] == n
        assert got[h]["quality_micro_sum"] == qsum
        assert got[h]["n_low_quality"] == nlow
        assert got[h]["mean_quality_micro"] == qsum // n
