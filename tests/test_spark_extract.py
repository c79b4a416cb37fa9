"""Spark-path tests: the vectorized UDF must equal the pure-Python core
row-for-row, lineage must reconcile, and checkpoint/resume must be exact."""

import os
import shutil

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tests.conftest import FIXTURE_DIR


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_spark_udf_equals_core_on_fixtures(spark):
    """Every golden fixture through the Spark operator == pure-core output
    (proves the Arrow/broadcast plumbing adds nothing and loses nothing)."""
    from article_extractor_spark.operators.extract import extract_articles
    from article_extractor_spark.sources.pages import fixture_pages
    from article_extractor_spark.core.pipeline import get_parser
    from article_extractor_spark.core.urlutil import Url

    pages = fixture_pages(spark)
    out = {
        r["url"]: r
        for r in extract_articles(pages, num_partitions=8).collect()
    }
    assert len(out) == 107

    parser = get_parser()
    checked = 0
    for name in sorted(os.listdir(os.path.join(FIXTURE_DIR, "readability")))[:25]:
        path = os.path.join(FIXTURE_DIR, "readability", name, "source.html")
        if not os.path.isfile(path):
            continue
        with open(path, encoding="utf-8", newline="") as f:
            html = f.read()
        url = f"http://fakehost/test/{name}/"
        art = parser.parse_offline([html], url=Url.parse(url))
        row = out[url]
        assert row["text"] == art.html, f"{name}: spark text != core"
        assert row["title"] == art.title, f"{name}: spark title != core"
        checked += 1
    assert checked >= 20


def test_lineage_reconciles(spark):
    from article_extractor_spark.operators.extract import (extract_articles,
                                                           lineage_metrics)
    from article_extractor_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001")
    arts = extract_articles(pages, num_partitions=4).cache()
    lineage = lineage_metrics(arts, "t").cache()
    total_rows = arts.count()
    agg = lineage.agg(F.sum("doc_count").alias("n")).collect()[0]
    assert agg["n"] == total_rows
    assert lineage.count() == 4
    arts.unpersist()


def test_checkpoint_resume_exact(spark, tmp_path):
    from article_extractor_spark.plans.checkpoint import (completed_buckets,
                                                          run_extraction_job,
                                                          with_bucket)
    from article_extractor_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(120).cache()
    out_a = str(tmp_path / "full")
    res_full = run_extraction_job(spark, pages, out_a, num_buckets=8)
    assert res_full["docs_total"] == 120
    full = {r["url"]: r["text"] for r in
            spark.read.parquet(os.path.join(out_a, "articles")).collect()}

    # simulate a crash: run waves of 2 buckets, stop after 2 waves
    out_b = str(tmp_path / "resumed")
    from article_extractor_spark.plans import checkpoint as cp

    orig_mark = cp.mark_completed
    calls = {"n": 0}

    def crashing_mark(s, d, b, r):
        orig_mark(s, d, b, r)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")

    cp.mark_completed = crashing_mark
    try:
        with pytest.raises(RuntimeError):
            run_extraction_job(spark, pages, out_b, num_buckets=8,
                               buckets_per_wave=2)
    finally:
        cp.mark_completed = orig_mark

    done_before = completed_buckets(spark, os.path.join(out_b, "_checkpoint")).count()
    assert done_before == 4  # two waves of two buckets checkpointed

    res = run_extraction_job(spark, pages, out_b, num_buckets=8)
    assert res["buckets_skipped"] == 4
    assert res["buckets_processed"] == 4
    resumed = {r["url"]: r["text"] for r in
               spark.read.parquet(os.path.join(out_b, "articles")).collect()}
    assert resumed == full  # byte-exact across crash/resume
    pages.unpersist()


def test_arrow_and_pandas_paths_identical(spark):
    """mapInArrow (default) and mapInPandas fallback must emit identical
    rows — same extraction, same nulls, same timestamps."""
    from article_extractor_spark.operators.extract import extract_articles
    from article_extractor_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(50).cache()
    cols = ["url", "title", "author", "date", "thumbnail_url", "text"]
    a = {r["url"]: tuple(r[c] for c in cols)
         for r in extract_articles(pages, use_arrow=True).collect()}
    p = {r["url"]: tuple(r[c] for c in cols)
         for r in extract_articles(pages, use_arrow=False).collect()}
    assert a == p and len(a) == 50
    pages.unpersist()


def test_salted_repartition_deterministic(spark):
    """The salted repartition key must be a pure function of row DATA —
    never rand()/partition position, which can duplicate or lose rows when
    a task retries after the exchange partially materialized.  Checks the
    physical plan contains no rand and that two runs give identical
    url->partition assignment and exact row conservation."""
    from article_extractor_spark.operators.extract import extract_articles
    from article_extractor_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(60).cache()
    arts = extract_articles(pages, num_partitions=4, salt_buckets=8)
    plan = arts._jdf.queryExecution().executedPlan().toString()
    assert "rand(" not in plan.lower()

    run1 = {r["url"]: r["part_id"] for r in arts.select("url", "part_id").collect()}
    run2 = {r["url"]: r["part_id"]
            for r in extract_articles(pages, num_partitions=4, salt_buckets=8)
            .select("url", "part_id").collect()}
    assert run1 == run2
    assert len(run1) == 60  # no rows duplicated or lost
    pages.unpersist()


def test_large_document_through_arrow(spark):
    """The reference's 460 KB criterion page (slow.html) through the
    Spark mapInArrow path: large binary payloads must survive the Arrow
    exchange and extract identically to the pure core."""
    from article_extractor_spark.core.pipeline import get_parser
    from article_extractor_spark.core.urlutil import Url
    from article_extractor_spark.operators.extract import extract_articles

    path = "/root/reference/resources/tests/slow.html"
    with open(path, encoding="utf-8", errors="replace") as f:
        html = f.read()
    url = "https://spectrum.ieee.org/stellarator"
    pages = spark.createDataFrame(
        [(url, bytearray(html.encode("utf-8")))], "url string, html binary")
    rows = extract_articles(pages).collect()
    assert len(rows) == 1
    core = get_parser().parse_offline([html], url=Url.parse(url))
    assert rows[0]["title"] == core.title
    assert rows[0]["text"] == core.html
    assert "Stellarator" in (rows[0]["title"] or "")


def test_bucket_partition_pruning(spark, tmp_path):
    """Reads of the bucket-partitioned articles table must prune at the
    scan (PartitionFilters carries the bucket predicate) — the property
    that makes resume reads and downstream bucket-scoped queries touch
    only their slice of a 100 TB output."""
    import re

    from article_extractor_spark.plans.checkpoint import run_extraction_job
    from article_extractor_spark.sources.pages import synthesize_pages

    out = str(tmp_path / "job")
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(80)
    run_extraction_job(spark, pages, out, num_buckets=8)
    df = spark.read.parquet(os.path.join(out, "articles")) \
        .where(F.col("bucket").isin([1, 2]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m is not None and "bucket" in m.group(0), plan[:800]


def test_plan_pushes_projection(spark, tmp_path):
    """Column pruning must reach the parquet scan: ReadSchema only url,html."""
    from article_extractor_spark.operators.extract import extract_articles
    from article_extractor_spark.sources.pages import synthesize_pages

    p = str(tmp_path / "pages")
    synthesize_pages(spark, "/root/testdata/sf0.001").write.parquet(p)
    pages = spark.read.parquet(p)
    plan = extract_articles(pages, num_partitions=4)._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "html" in read_schema and "url" in read_schema
    assert "warc_ts" not in read_schema and "lang" not in read_schema


def test_pages_python_twin_byte_identical(spark):
    """synthesize_page_py must reproduce the JVM page template EXACTLY —
    the extract_fulltext oracle's expected checksums depend on it."""
    from article_extractor_spark.sources.pages import (synthesize_page_py,
                                                       synthesize_pages)

    sf = "/root/testdata/sf0.001"
    got = {r["url"]: bytes(r["html"]).decode("utf-8")
           for r in synthesize_pages(spark, sf).select("url", "html").collect()}
    docs = spark.read.parquet(sf + "/documents.parquet").select(
        "doc_id", "text", "source").collect()
    assert len(docs) == len(got)
    for d in docs:
        url, html = synthesize_page_py(d["doc_id"], d["text"], d["source"])
        assert url in got, url
        assert got[url] == html, url


def test_extract_fulltext_oracle_values_match_spark(spark):
    """The driver's new value gate for extract_fulltext, replicated: the
    pure-Python expected rows equal the Spark pipeline's output."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    expected = {r[0]: r for r in entry._expected_extraction_values(sf)}
    out = entry.q_extract_fulltext(spark, sf).collect()
    assert len(out) == len(expected)
    for r in out:
        url, title, md5, nb = expected[r["url"]]
        assert (r["title"], r["text_md5"], r["text_bytes"]) == (title, md5, nb), url


def test_salting_balances_mega_host_skew(spark):
    """North-rule skew clause, made binding: a re-crawled mega-url (95% of
    rows share one url) serializes one partition without salt; with
    data-derived salt the same rows spread across partitions.  Verified
    via the part_id lineage column — the same mechanism a production run
    monitors."""
    import datetime

    from article_extractor_spark.operators.extract import extract_articles

    T0 = datetime.datetime(2024, 1, 1)
    html = b"<html><body><div id='c'><h1>H</h1><p>body text</p></div></body></html>"
    rows = [("https://mega.example.com/hot",
             T0 + datetime.timedelta(seconds=i), html) for i in range(380)]
    rows += [(f"https://site{i}.example.com/p", T0, html) for i in range(20)]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")

    def partition_counts(salt):
        arts = extract_articles(pages, num_partitions=8, salt_buckets=salt)
        byp = {r["part_id"]: r["n"] for r in
               arts.groupBy("part_id").count().withColumnRenamed(
                   "count", "n").collect()}
        return byp

    unsalted = partition_counts(0)
    salted = partition_counts(8)
    assert sum(unsalted.values()) == sum(salted.values()) == 400
    # without salt the hot url lands in ONE partition
    assert max(unsalted.values()) >= 380
    # with salt=8 buckets no partition holds more than ~half the hot rows
    assert max(salted.values()) < 200
