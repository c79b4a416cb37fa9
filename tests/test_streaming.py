"""Streaming extraction: drain a parquet-file backlog with availableNow and
check exactly-once append semantics across a second batch of files."""

import os

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-stream-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_stream_extraction_available_now(spark, tmp_path):
    from article_extractor_spark.sources.pages import synthesize_pages
    from article_extractor_spark.streaming.extract_stream import \
        start_extraction_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(60).cache()
    pages.limit(40).write.mode("append").parquet(in_dir)

    q = start_extraction_stream(spark, in_dir, out_dir)
    q.awaitTermination(300)
    got = spark.read.parquet(os.path.join(out_dir, "articles"))
    assert got.count() == 40
    assert got.where(F.col("title").isNull()).count() == 0

    # second wave of files: only the delta is processed (stream checkpoint)
    pages.subtract(pages.limit(40)).write.mode("append").parquet(in_dir)
    q2 = start_extraction_stream(spark, in_dir, out_dir)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(os.path.join(out_dir, "articles"))
    assert got2.count() == 60
    assert got2.select("url").distinct().count() == 60
    pages.unpersist()


def _run_sessionize_stream(spark, in_dir, out_dir, chk):
    from article_extractor_spark.streaming.sessionize_stream import \
        sessionize_stream

    ev_schema = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        sessionize_stream(stream).writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Closed sessions from the stateful stream (applyInPandasWithState)
    must be ROW-IDENTICAL to the batch window formulation, across two
    file waves with state carried through the checkpoint.  The only
    allowed difference: each user's final session is still open in the
    stream (no later event closed it)."""
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    split_ts = ev.selectExpr(
        "percentile_approx(ts, 0.6) AS t").collect()[0]["t"]
    in_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "sessions")
    chk = str(tmp_path / "chk")
    # wave files arrive in event-time order (per-user order preserved)
    ev.where(F.col("ts") <= F.lit(split_ts)).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    _run_sessionize_stream(spark, in_dir, out_dir, chk)
    ev.where(F.col("ts") > F.lit(split_ts)).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    _run_sessionize_stream(spark, in_dir, out_dir, chk)

    streamed = {
        (r["user_id"], r["session_no"]):
            (r["n_events"], r["session_value"], r["duration_sec"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = entry.q_sessionize(spark, sf_dir)
    from pyspark.sql import Window
    last = Window.partitionBy("user_id")
    closed_batch = {
        (r["user_id"], r["session_no"]):
            (r["n_events"], r["session_value"], r["duration_sec"])
        for r in batch.withColumn(
            "max_no", F.max("session_no").over(last))
        .where(F.col("session_no") < F.col("max_no")).collect()
    }
    assert streamed == closed_batch
    assert len(streamed) > 0


def test_stream_sessionize_randomized(spark, tmp_path):
    """Randomized gaps/values/users across three waves: closed sessions
    from the stateful stream equal a pure-Python reference sessionizer."""
    import datetime
    import random

    rng = random.Random(77)
    T0 = datetime.datetime(2024, 1, 1)
    rows = []
    clocks = {u: rng.randrange(3600) for u in range(6)}
    for eid in range(300):
        u = rng.randrange(6)
        # mix of sub-gap and super-gap advances (gap = 1800s)
        clocks[u] += rng.choice([60, 300, 1700, 1900, 4000])
        rows.append((eid, T0 + datetime.timedelta(seconds=clocks[u]), u,
                     "e", round(rng.uniform(0, 50), 2), "{}"))
    rows.sort(key=lambda r: r[1])

    # python reference: closed sessions only (a later event ends them)
    ref = {}
    state = {}
    for eid, ts, u, _t, val, _p in rows:
        ep = int(ts.timestamp())
        vq = int(round(val * 10000))
        if u in state and ep - state[u]["last"] > 1800:
            s = state[u]
            ref[(u, s["no"])] = (s["n"], s["vq"] / 10000.0, s["last"] - s["start"])
            state[u] = {"no": s["no"] + 1, "start": ep, "last": ep, "n": 0, "vq": 0}
        st = state.setdefault(u, {"no": 1, "start": ep, "last": ep, "n": 0, "vq": 0})
        st["last"] = ep
        st["n"] += 1
        st["vq"] += vq

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    third = len(rows) // 3
    for wave in (rows[:third], rows[third:2 * third], rows[2 * third:]):
        spark.createDataFrame(wave, schema).coalesce(1) \
            .write.mode("append").parquet(in_dir)
        _run_sessionize_stream(spark, in_dir, out_dir, chk)

    got = {(r["user_id"], r["session_no"]):
           (r["n_events"], r["session_value"], r["duration_sec"])
           for r in spark.read.parquet(out_dir).collect()}
    assert got == ref and len(ref) > 10


def test_stream_windowed_counts_watermark(spark, tmp_path):
    """Append-mode watermarked window counts: every emitted window row
    equals the batch aggregation of the same data (exactly-once, no
    partials emitted before finalization)."""
    from article_extractor_spark.streaming.sessionize_stream import \
        windowed_counts_stream

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    in_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "win_out")
    ev.orderBy("ts").coalesce(4).write.mode("append").parquet(in_dir)

    ev_schema = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q = (
        windowed_counts_stream(stream, window="10 minutes", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "win_chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    emitted = {
        (r["window_start"], r["window_end"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r["window_start"], r["window_end"], r["event_type"]): r["n_events"]
        for r in ev.groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events").collect()
    }
    assert len(emitted) > 0
    for k, v in emitted.items():
        assert batch[k] == v  # finalized windows are complete and exact


def test_stream_extraction_kill_and_restart(spark, tmp_path):
    """Kill the extraction stream mid-backlog, restart from the SAME
    checkpoint, and verify the final output is row-identical to an
    uninterrupted single run over the same input (exactly-once across a
    restart, not just across file waves)."""
    import time

    from article_extractor_spark.sources.pages import synthesize_pages
    from article_extractor_spark.streaming.extract_stream import \
        start_extraction_stream

    in_dir = str(tmp_path / "in")
    killed_dir = str(tmp_path / "out_killed")
    single_dir = str(tmp_path / "out_single")
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(48)
    # many small files so one trigger != the whole backlog
    pages.repartition(12).write.mode("append").parquet(in_dir)

    # run 1: one file per micro-batch; kill after the first progress
    q = start_extraction_stream(spark, in_dir, killed_dir,
                                available_now=False, max_files_per_trigger=1)
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        done = [p for p in q.recentProgress if p["numInputRows"] > 0]
        if len(done) >= 2:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    partial = spark.read.parquet(os.path.join(killed_dir, "articles")).count()
    assert 0 < partial < 48, f"kill landed at {partial} rows — retune trigger"

    # run 2: restart from the same checkpoint, drain the rest
    q2 = start_extraction_stream(spark, in_dir, killed_dir,
                                 available_now=True, max_files_per_trigger=1)
    q2.awaitTermination(300)

    # reference: uninterrupted single run
    q3 = start_extraction_stream(spark, in_dir, single_dir)
    q3.awaitTermination(300)

    key = lambda df: {(r["url"], r["title"], r["text"]) for r in
                      df.select("url", "title", "text").collect()}
    restarted = spark.read.parquet(os.path.join(killed_dir, "articles"))
    single = spark.read.parquet(os.path.join(single_dir, "articles"))
    assert restarted.count() == 48 == single.count()   # no dupes, no loss
    assert key(restarted) == key(single)


def test_stream_dedup_first_seen_wins(spark, tmp_path):
    """Streaming exact dedup: duplicates across micro-batches AND across
    a stop/restart are dropped via dropDuplicates state; output equals
    batch distinct-by-url."""
    import datetime

    from article_extractor_spark.streaming.dedup_stream import dedup_stream

    T0 = datetime.datetime(2024, 1, 1)
    schema = "url string, warc_ts timestamp, body string"
    in_dir, out_dir, chk = (str(tmp_path / d) for d in ("in", "out", "chk"))

    def write_wave(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(in_dir)

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(in_dir))
        q = (dedup_stream(stream, keys=("url",)).writeStream
             .format("parquet").option("path", out_dir)
             .option("checkpointLocation", chk)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)

    write_wave([("u1", T0, "a"), ("u2", T0, "b"), ("u1", T0, "dup")])
    drain()
    # second run (fresh query, same checkpoint): u1/u2 dups must be
    # remembered by state, u3 is new
    write_wave([("u2", T0, "dup"), ("u3", T0, "c"), ("u3", T0, "dup")])
    drain()

    got = spark.read.parquet(out_dir)
    assert got.count() == 3
    assert {r["url"] for r in got.collect()} == {"u1", "u2", "u3"}
    # first-seen wins: no row carries a 'dup' body
    assert not [r for r in got.collect() if r["body"] == "dup"]


def test_stream_curation_filters_match_batch(spark, tmp_path):
    """The zero-shuffle curation filters (classifier inference + Gopher
    quality) run unchanged on a file stream: availableNow output is
    row-identical to the batch run over the same input."""
    from article_extractor_spark.operators.textstats import (
        classifier_score, gopher_quality)

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "docs_out")
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(80).cache())
    docs.write.mode("append").parquet(in_dir)

    schema = docs.schema
    stream = spark.readStream.schema(schema).parquet(in_dir)
    scored = classifier_score(stream).join(
        gopher_quality(stream).withColumnRenamed("keep", "g_keep")
        .select("doc_id", "g_keep"), "doc_id")
    q = (scored.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).orderBy("doc_id").collect()
    exp = (classifier_score(docs).join(
        gopher_quality(docs).withColumnRenamed("keep", "g_keep")
        .select("doc_id", "g_keep"), "doc_id")
        .orderBy("doc_id").collect())
    assert [r.asDict() for r in got] == [r.asDict() for r in exp]
    docs.unpersist()


def test_stream_crawl_schedule_matches_batch(spark, tmp_path):
    """Streaming politeness slots (per-host O(1) state) must be
    ROW-IDENTICAL to the batch closed-form window, across two waves with
    state carried through the checkpoint — the recurrence the state
    folds is exactly what the prefix-max closed form solves."""
    from article_extractor_spark.operators.weburl import crawl_schedule
    from article_extractor_spark.streaming.schedule_stream import \
        crawl_schedule_stream

    rows = [(i, f"h{i % 5}.com", 1_000 + (i // 5) * 2 + (i % 3))
            for i in range(60)]
    reqs = spark.createDataFrame(
        rows, "doc_id long, host string, ts long").cache()
    in_dir = str(tmp_path / "req_in")
    out_dir = str(tmp_path / "slots")
    chk = str(tmp_path / "chk_sched")

    def run_wave():
        stream = (spark.readStream
                  .schema("doc_id long, host string, ts long")
                  .option("maxFilesPerTrigger", 1).parquet(in_dir))
        q = (crawl_schedule_stream(stream, min_delay=5)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", chk)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(300)

    # waves split on ts so per-host (ts, doc_id) order holds across waves
    reqs.where(F.col("ts") <= 1_020).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    run_wave()
    reqs.where(F.col("ts") > 1_020).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    run_wave()

    streamed = {(r.doc_id, r.host, r.ts, r.slot, r.wait)
                for r in spark.read.parquet(out_dir).collect()}
    batch = {(r.doc_id, r.host, r.ts, r.slot, r.wait)
             for r in crawl_schedule(reqs, min_delay=5).collect()}
    assert streamed == batch
    assert len(streamed) == 60
    reqs.unpersist()
