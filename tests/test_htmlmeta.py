"""Robots-meta directives and canonical-URL dedup: attribute-order and
quoting variants, token-boundary semantics, deterministic survivor."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-htmlmeta-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def page(head_extra=""):
    return (f"<html><head><title>T</title>{head_extra}</head>"
            "<body><p>body</p></body></html>")


def test_robots_variants(spark):
    from article_extractor_spark.operators.htmlmeta import robots_directives

    rows = [
        (1, page('<meta name="robots" content="noindex, nofollow">')),
        (2, page("<meta name='robots' content='NOINDEX'>")),
        (3, page('<meta content="nofollow" name="robots">')),  # attr order
        (4, page('<meta name=robots content=none>')),          # unquoted
        (5, page('<meta name="robots" content="index, follow">')),
        (6, page()),                                            # absent
        (7, page('<meta name="robots" content="noindexing-policy">')),
        (8, page('<meta name="googlebot" content="noindex">')),  # other agent
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    got = {r["id"]: (r["noindex"], r["nofollow"])
           for r in robots_directives(df).collect()}
    assert got[1] == (1, 1)
    assert got[2] == (1, 0)
    assert got[3] == (0, 1)
    assert got[4] == (1, 1)  # none = noindex + nofollow
    assert got[5] == (0, 0)
    assert got[6] == (0, 0)
    assert got[7] == (0, 0)  # token boundary: 'noindexing-policy' is not noindex
    assert got[8] == (0, 0)  # name != robots


def test_noindex_filter(spark):
    from article_extractor_spark.operators.htmlmeta import noindex_filter

    rows = [(1, page('<meta name="robots" content="noindex">')),
            (2, page()), (3, page('<meta name="robots" content="all">'))]
    df = spark.createDataFrame(rows, "id long, html string")
    kept = {r["id"] for r in noindex_filter(df).collect()}
    assert kept == {2, 3}
    assert set(noindex_filter(df).columns) == {"id", "html"}


def test_canonical_extraction_and_fallback(spark):
    from article_extractor_spark.operators.htmlmeta import canonical_url

    rows = [
        (1, "http://a.test/p?utm=x",
         page('<link rel="canonical" href="http://a.test/p">')),
        (2, "http://b.test/q",
         page('<link href="http://b.test/canon" rel=canonical>')),
        (3, "http://c.test/self", page()),
    ]
    df = spark.createDataFrame(rows, "id long, url string, html string")
    got = {r["id"]: r["canonical"] for r in canonical_url(df).collect()}
    assert got[1] == "http://a.test/p"
    assert got[2] == "http://b.test/canon"
    assert got[3] == "http://c.test/self"


def test_canonical_dedup_min_url_survives(spark):
    from article_extractor_spark.operators.htmlmeta import canonical_dedup

    canon = '<link rel="canonical" href="http://s.test/article">'
    rows = [
        (1, "http://s.test/article?ref=tw", page(canon)),
        (2, "http://s.test/article", page(canon)),
        (3, "http://s.test/article/amp", page(canon)),
        (4, "http://other.test/thing", page()),
    ]
    df = spark.createDataFrame(rows, "id long, url string, html string")
    got = {r["canonical"]: r["url"] for r in canonical_dedup(df).collect()}
    assert got["http://s.test/article"] == "http://s.test/article"
    assert got["http://other.test/thing"] == "http://other.test/thing"
    assert len(got) == 2


def test_zero_python_plan(spark):
    from article_extractor_spark.operators.htmlmeta import robots_directives

    df = spark.createDataFrame([(1, page())], "id long, html string")
    plan = robots_directives(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "MapInPandas" not in plan and "ArrowEval" not in plan
    assert "BatchEvalPython" not in plan


def test_prefix_attribute_values_do_not_match(spark):
    """'robots-extension' / 'canonicalize' must NOT match as prefixes in
    the content-first / href-first patterns."""
    from article_extractor_spark.operators.htmlmeta import (canonical_url,
                                                            robots_directives)

    rows = [
        (1, "http://p.test/a",
         page('<meta content="none important" name="robots-extension">')),
        (2, "http://p.test/b",
         page('<link href="http://p.test/evil" rel="canonicalize">')),
    ]
    df = spark.createDataFrame(rows, "id long, url string, html string")
    r = {x["id"]: x for x in robots_directives(df).collect()}
    assert r[1]["noindex"] == 0 and r[1]["robots_meta"] == ""
    c = {x["id"]: x["canonical"] for x in canonical_url(df).collect()}
    assert c[2] == "http://p.test/b"  # self-canonical fallback, not evil


def test_compliant_outlinks_nofollow_gate(spark):
    """Pages declaring nofollow contribute no edges; others do — and the
    binary-html path flags correctly too."""
    from article_extractor_spark.operators.htmlmeta import compliant_outlinks

    link = '<a href="http://dst.test/x">x</a>'
    html_follow = ('<html><head><title>T</title></head>'
                   f'<body>{link}{link}</body></html>')
    html_nofollow = ('<html><head>'
                     '<meta name="robots" content="nofollow"></head>'
                     f'<body>{link}</body></html>')
    df = spark.createDataFrame(
        [("http://src-a.test/1", html_follow),
         ("http://src-b.test/1", html_nofollow)],
        "url string, html string")
    got = {(r["src_host"], r["dst_host"]): r["n_links"]
           for r in compliant_outlinks(df).collect()}
    assert got == {("src-a.test", "dst.test"): 2}

    # binary html column: same verdicts
    dfb = df.selectExpr("url", "encode(html, 'UTF-8') AS html")
    gotb = {(r["src_host"], r["dst_host"]): r["n_links"]
            for r in compliant_outlinks(dfb).collect()}
    assert gotb == got


def test_canonical_dedup_randomized_parity(spark):
    """200 random pages, random canonical declarations: the survivor set
    must equal a pure-Python min-url fold over the same declarations."""
    import random

    from article_extractor_spark.operators.htmlmeta import canonical_dedup

    rng = random.Random(17)
    rows, want = [], {}
    for i in range(200):
        url = f"http://h{rng.randrange(8)}.test/p{i}"
        if rng.random() < 0.6:
            canon = f"http://h{rng.randrange(8)}.test/c{rng.randrange(30)}"
            html = page(f'<link rel="canonical" href="{canon}">')
        else:
            canon = url  # self-canonical fallback
            html = page()
        rows.append((i, url, html))
        if canon not in want or url < want[canon]:
            want[canon] = url
    df = spark.createDataFrame(rows, "id long, url string, html string")
    got = {r["canonical"]: r["url"] for r in canonical_dedup(df).collect()}
    assert got == want


def test_attributeless_robots_tag_does_not_steal_next_tags_content(spark):
    """ADVICE r5: <meta name="robots"> with no content attribute must not
    capture a content= from a FOLLOWING tag (the old [\\s>] consumed the
    closing '>' and matched across tag boundaries)."""
    from article_extractor_spark.operators.htmlmeta import robots_directives

    html = page('<meta name="robots">'
                '<meta content="noindex tips here" name="description">')
    df = spark.createDataFrame([(1, "http://a.test/x", html)],
                               "id long, url string, html string")
    row = robots_directives(df).collect()[0]
    assert row["robots_meta"] == ""
    assert row["noindex"] == 0 and row["nofollow"] == 0
    # the real thing still matches
    html2 = page('<meta name="robots" content="noindex">')
    df2 = spark.createDataFrame([(1, "http://a.test/x", html2)],
                                "id long, url string, html string")
    row2 = robots_directives(df2).collect()[0]
    assert row2["noindex"] == 1


def test_attributeless_canonical_link_does_not_steal_next_href(spark):
    """Same cross-tag defect class for <link rel="canonical"> with no
    href: must fall back to the page url, not a later tag's href."""
    from article_extractor_spark.operators.htmlmeta import canonical_url

    html = page('<link rel="canonical">'
                '<link href="http://evil.test/steal" rel="stylesheet">')
    df = spark.createDataFrame([(1, "http://a.test/x", html)],
                               "id long, url string, html string")
    row = canonical_url(df).collect()[0]
    assert row["canonical"] == "http://a.test/x"
