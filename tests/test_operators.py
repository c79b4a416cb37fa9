"""Operator-level tests for the training-data pipeline ops (semantic
checks; value-level parity vs DuckDB is covered by tests/oracle_compare.py
and the driver's CORRECTNESS gate)."""

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-op-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),   # exact dup
            (2, "the quick brown fox leaps over the lazy dog"),   # near dup
            (3, "completely different content about spark engines"),
            (4, "el rapido zorro marron salta sobre el perro"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_exact_duplicates(spark, docs):
    from article_extractor_spark.operators.dedup import exact_duplicates

    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["dup_count"] == 2
    assert groups[0]["canonical_id"] == 0


def test_minhash_finds_near_dups(spark, docs):
    from article_extractor_spark.operators.dedup import minhash_lsh_pairs

    pairs = {(r["a_id"], r["b_id"]): r["n_shared_bands"]
             for r in minhash_lsh_pairs(docs, num_bands=16).collect()}
    assert pairs[(0, 1)] == 16          # identical docs share every band
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares some bands
    assert all(a != 3 and b != 3 for a, b in pairs)  # distinct doc never pairs


def test_ngram_jaccard_values(spark, docs):
    from article_extractor_spark.operators.dedup import ngram_jaccard_pairs

    rows = {(r["a_id"], r["b_id"]): r for r in
            ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert rows[(0, 1)]["jaccard"] == 1.0
    near = rows.get((0, 2)) or rows.get((1, 2))
    assert near is not None and 0.2 <= near["jaccard"] < 1.0


def test_lsh_bucket_cap_binds(spark):
    """Degenerate corpus: many identical docs land in one (band, band_hash)
    bucket.  With the cap above the bucket size all pairs appear; with the
    cap below it the bucket is dropped and produces no pairs — the 100 TB
    quadratic-bucket insurance actually binds."""
    from article_extractor_spark.operators.dedup import minhash_lsh_pairs

    clones = spark.createDataFrame(
        [(i, "boilerplate cookie banner accept all cookies to continue")
         for i in range(12)],
        "doc_id long, text string",
    )
    uncapped = minhash_lsh_pairs(clones, num_bands=4, max_bucket_size=100).count()
    assert uncapped == 12 * 11 // 2
    capped = minhash_lsh_pairs(clones, num_bands=4, max_bucket_size=11).count()
    assert capped == 0


def test_jaccard_shingle_df_cap_binds(spark):
    """Hot-shingle guard: with a df cap below the corpus-wide shingle
    frequency, shared counts drop (jaccard underestimates, never over)."""
    from article_extractor_spark.operators.dedup import ngram_jaccard_pairs

    clones = spark.createDataFrame(
        [(i, "boilerplate cookie banner accept all cookies to continue")
         for i in range(8)],
        "doc_id long, text string",
    )
    full = ngram_jaccard_pairs(clones, threshold=0.5, max_shingle_df=100)
    assert full.count() == 8 * 7 // 2
    assert all(r["jaccard"] == 1.0 for r in full.collect())
    # every shingle appears in all 8 docs -> df cap of 7 drops them all
    capped = ngram_jaccard_pairs(clones, threshold=0.5, max_shingle_df=7)
    assert capped.count() == 0


def test_simhash_similarity(spark, docs):
    from article_extractor_spark.operators.dedup import simhash

    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=32).collect()}
    assert fp[0] == fp[1]
    ham_near = bin(fp[0] ^ fp[2]).count("1")
    ham_far = bin(fp[0] ^ fp[3]).count("1")
    assert ham_near < ham_far


def test_ann_brute_and_lsh_agree_on_top1(spark):
    from article_extractor_spark.operators.similarity import (brute_force_topk,
                                                              lsh_topk)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    brute = brute_force_topk(emb, q, k=10).collect()
    assert len(brute) == 10
    assert [r["rank"] for r in brute] == list(range(1, 11))
    assert brute[0]["cosine"] >= brute[-1]["cosine"]
    lsh = lsh_topk(emb, q, k=10, num_planes=4).collect()
    # LSH results are a subset of the same bucket; top hit should be a
    # genuinely similar vector (recall sanity, not exactness)
    assert len(lsh) > 0
    brute_ids = {r["vec_id"] for r in brute}
    assert any(r["vec_id"] in brute_ids for r in lsh[:5])


def test_null_text_treated_as_empty(spark):
    """NULL text must behave exactly like '' in every textstats operator
    (Spark's size(split(NULL)) = -1 would otherwise leak negative scores
    and a bogus pred_lang) and block_col=None must not crash near-dups."""
    from article_extractor_spark.operators.dedup import embedding_near_dups
    from article_extractor_spark.operators.textstats import (fingerprint,
                                                             language_id,
                                                             quality_score,
                                                             token_counts)

    nulls = spark.createDataFrame(
        [(0, None), (1, "")], "doc_id long, text string")
    for op in (language_id, quality_score, token_counts, fingerprint):
        rows = {r["doc_id"]: r.asDict() for r in op(nulls).collect()}
        r0, r1 = rows[0], rows[1]
        r0.pop("doc_id"), r1.pop("doc_id")
        assert r0 == r1, f"{op.__name__}: NULL != '' -> {r0} vs {r1}"
        assert all(v is None or not (isinstance(v, (int, float)) and v < 0)
                   for v in r0.values())

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    pairs = embedding_near_dups(emb, threshold=0.9, block_col=None).collect()
    assert {(r["a_id"], r["b_id"]) for r in pairs} == {(0, 1)}


def test_language_id(spark, docs):
    from article_extractor_spark.operators.textstats import language_id

    rows = {r["doc_id"]: r for r in language_id(docs).collect()}
    assert rows[0]["pred_lang"] == "en"
    assert rows[4]["pred_lang"] == "es"


def test_token_counts(spark, docs):
    from article_extractor_spark.operators.textstats import token_counts

    rows = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert rows[0]["n_words"] == 9
    assert rows[0]["n_subtokens"] == 9


def test_fingerprint_deterministic(spark, docs):
    from article_extractor_spark.operators.textstats import fingerprint

    a = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    b = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    assert a == b
    assert a[0] == a[1] and a[0] != a[3]


def test_media_decode_stub(spark):
    from article_extractor_spark.operators.multimodal import (
        decode_image_real, decode_media, media_stats, synthesize_media)

    media = synthesize_media(spark, "/root/testdata/sf0.001")
    decoded = decode_media(media, num_partitions=4).cache()
    n = decoded.count()
    assert n == 500
    row = decoded.where(F.col("media_id") == 0).collect()[0]
    assert 1 <= row["width"] <= 1920 and 1 <= row["height"] <= 1080
    stats = {r["kind"]: r for r in media_stats(decoded).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert stats["image"]["max_frames"] == 1
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_media_resize_and_frame_sample(spark):
    from article_extractor_spark.operators.multimodal import (decode_media,
                                                              frame_sample,
                                                              resize_media,
                                                              synthesize_media)

    media = synthesize_media(spark, "/root/testdata/sf0.001")
    decoded = decode_media(media).cache()
    rs = resize_media(decoded, max_side=336).collect()
    assert len(rs) == decoded.count()
    for r in rs:
        assert max(r["out_width"], r["out_height"]) <= 336
        assert r["out_width"] <= r["width"] and r["out_height"] <= r["height"]
        if max(r["width"], r["height"]) <= 336:
            # never upscaled: small media keep exact dimensions
            assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])

    frames = frame_sample(media, decoded, n_frames=4, fps=24)
    per = {r["media_id"]: r["n"] for r in
           frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    counts = {r["media_id"]: (r["kind"], r["n_frames"])
              for r in decoded.select("media_id", "kind", "n_frames").collect()}
    for mid, (kind, total) in counts.items():
        expected = min(4, total) if kind == "video" else None
        assert per.get(mid) == expected, (mid, kind, total)
    decoded.unpersist()


def test_plan_shapes_of_new_operators(spark):
    """Physical-plan audits for the round-2 operators: the scale
    properties the docstrings claim must be visible in the plan."""
    from article_extractor_spark.operators.joins import asof_join
    from article_extractor_spark.operators.similarity import (hyperplane_bucket,
                                                              pq_encode)
    from article_extractor_spark.operators.textstats import (script_detect,
                                                             scrub_pii,
                                                             stratified_sample)

    docs = spark.createDataFrame(
        [(i, "text here", "en") for i in range(50)],
        "doc_id long, text string, lang string")
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # pure projections: zero Exchange
    for df in (stratified_sample(docs, {"en": 0.5}), scrub_pii(docs),
               script_detect(docs), hyperplane_bucket(emb, 4, dims=2),
               pq_encode(emb, num_subspaces=2, codebook_size=2, dims=2)):
        assert "Exchange" not in plan(df), plan(df)[:500]

    # as-of join: exactly one exchange keyed on the join key (the union
    # sides co-shuffle), never a cartesian/range join
    left = docs.select("doc_id", F.col("doc_id").alias("k"),
                       F.current_timestamp().alias("ts"))
    right = docs.select(F.col("doc_id").alias("k"),
                        F.current_timestamp().alias("ts"),
                        F.lit(1).alias("val"))
    p = plan(asof_join(left, right, key="k", right_vals=("val",)))
    assert "Cartesian" not in p and "BroadcastNestedLoop" not in p
    assert p.count("Exchange hashpartitioning") <= 2  # union sides


def test_broadcast_in_ann_plan(spark):
    """The query side of the ANN join must be broadcast, not shuffled."""
    from article_extractor_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    plan = brute_force_topk(emb, q)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_dedup_clusters(spark, docs):
    from article_extractor_spark.operators.dedup import dedup_clusters

    labels = {r["doc_id"]: r["cluster_id"]
              for r in dedup_clusters(docs, num_bands=16).collect()}
    # docs 0,1 identical and 2 near-dup: same cluster, canonical = min id
    assert labels[0] == labels[1] == 0
    assert labels.get(2, 0) == 0
    assert 3 not in labels  # unique doc: no edges, not in any cluster


def test_asof_join_semantics(spark):
    """<= visibility, per-key isolation, and left rows with no preceding
    right row get NULL (analytic hand-checkable case)."""
    import datetime

    from article_extractor_spark.operators.joins import asof_join

    T = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 0, T(5)), (2, 0, T(10)), (3, 0, T(2)), (4, 1, T(10)), (5, 2, T(10))],
        "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(0, T(5), 100), (0, T(8), 101), (1, T(20), 200)],
        "k long, ts timestamp, val long")
    out = {r["event_id"]: r["val"]
           for r in asof_join(left, right, key="k", right_vals=("val",)).collect()}
    assert out == {
        1: 100,   # ts==right ts -> visible (<=)
        2: 101,   # latest of the two preceding
        3: None,  # nothing precedes
        4: None,  # right row is in the future
        5: None,  # key has no right rows at all
    }
    inner = asof_join(left, right, key="k", right_vals=("val",), how="inner")
    assert {r["event_id"] for r in inner.collect()} == {1, 2}


def test_asof_join_composite_key(spark):
    import datetime

    from article_extractor_spark.operators.joins import asof_join

    T = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 0, "x", T(10)), (2, 0, "y", T(10)), (3, 1, "x", T(10))],
        "event_id long, k1 long, k2 string, ts timestamp")
    right = spark.createDataFrame(
        [(0, "x", T(5), 100), (0, "y", T(6), 200), (1, "x", T(20), 300)],
        "k1 long, k2 string, ts timestamp, val long")
    out = {r["event_id"]: r["val"]
           for r in asof_join(left, right, key=["k1", "k2"],
                              right_vals=("val",)).collect()}
    assert out == {1: 100, 2: 200, 3: None}


def test_asof_join_fuzz_vs_reference(spark):
    """Randomized as-of joins vs a brute-force Python reference: for every
    left row, value of the max right_ts <= left_ts within the key."""
    import random

    from article_extractor_spark.operators.joins import asof_join

    rng = random.Random(1234)
    import datetime
    T0 = datetime.datetime(2024, 1, 1)

    for trial in range(3):
        lrows = [(i, rng.randrange(4),
                  T0 + datetime.timedelta(seconds=rng.randrange(1000)))
                 for i in range(120)]
        rrows_raw = {(rng.randrange(4),
                      T0 + datetime.timedelta(seconds=rng.randrange(1000)))
                     for _ in range(60)}
        rrows = [(k, ts, j * 10) for j, (k, ts) in enumerate(sorted(
            rrows_raw, key=lambda x: (x[0], x[1])))]
        left = spark.createDataFrame(lrows, "event_id long, k long, ts timestamp")
        right = spark.createDataFrame(rrows, "k long, ts timestamp, val long")
        got = {r["event_id"]: r["val"]
               for r in asof_join(left, right, key="k",
                                  right_vals=("val",)).collect()}
        for eid, k, ts in lrows:
            cand = [(rts, v) for rk, rts, v in rrows if rk == k and rts <= ts]
            want = max(cand)[1] if cand else None
            assert got[eid] == want, (trial, eid)


def test_kmeans_iterate_exact_means(spark):
    """Member means per dimension are exact (quantized integer sums).
    Seeds are the first 2 ids in md5(id) order — for ids {0..3} that is
    vec 1 ([0,1]) and vec 2 ([1,0.2]); members split {1,3} / {0,2}."""
    from article_extractor_spark.operators.similarity import kmeans_iterate

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]),
         (2, [1.0, 0.2]), (3, [0.2, 1.0])],
        "vec_id long, embedding array<double>")
    rows = {(r["centroid_id"], r["dim"]): r
            for r in kmeans_iterate(emb, num_centroids=2).collect()}
    assert rows[(1, 0)]["mean_val"] == 0.1 and rows[(1, 0)]["n_members"] == 2
    assert rows[(1, 1)]["mean_val"] == 1.0
    assert rows[(2, 0)]["mean_val"] == 1.0 and rows[(2, 0)]["n_members"] == 2
    assert rows[(2, 1)]["mean_val"] == 0.1


def test_dedup_clusters_full_covers_all(spark, docs):
    from article_extractor_spark.operators.dedup import dedup_clusters_full

    out = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters_full(docs, num_bands=16).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5}   # every doc present
    assert out[0] == out[1] == 0            # dup cluster canonical = min id
    assert out[3] == 3 and out[4] == 4      # singletons map to themselves


def test_line_dedup(spark):
    """Corpus-frequent long lines drop, order is preserved, short lines
    and rare lines survive; a doc of pure boilerplate vanishes."""
    from article_extractor_spark.operators.dedup import line_dedup

    banner = "ACCEPT ALL COOKIES RIGHT NOW PLEASE"
    docs = spark.createDataFrame(
        [(i, f"{banner}\nunique body {i}\nok\n{banner}") for i in range(5)]
        + [(99, banner)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(docs, max_line_docs=2).collect()}
    assert 99 not in out                       # all lines were boilerplate
    for i in range(5):
        assert out[i]["clean_text"] == f"unique body {i}\nok"
        assert out[i]["n_lines_kept"] == 2
    # short repeated lines ('ok') are kept unconditionally
    assert all("ok" in out[i]["clean_text"] for i in range(5))


def test_script_detect(spark):
    from article_extractor_spark.operators.textstats import script_detect

    docs = spark.createDataFrame(
        [(0, "hello plain english text"),
         (1, "这是一段中文文本内容测试"),
         (2, "Привет мир это кириллица"),
         (3, "مرحبا بالعالم هذا نص عربي"),
         (4, "12345 !!! ???"), (5, None)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["pred_script"] for r in script_detect(docs).collect()}
    assert rows[0] == "latin"
    assert rows[1] == "cjk"
    assert rows[2] == "cyrillic"
    assert rows[3] == "arabic"
    assert rows[4] == "unknown" and rows[5] == "unknown"


def test_scrub_pii(spark):
    from article_extractor_spark.operators.textstats import scrub_pii

    docs = spark.createDataFrame(
        [(0, "mail a.b+c@ex-ample.org and 10.0.0.1 or +1 (555) 123-4567 end"),
         (1, "no pii here"), (2, None)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    r0 = rows[0]
    assert (r0["n_email"], r0["n_ipv4"], r0["n_phone"]) == (1, 1, 1)
    assert "<EMAIL>" in r0["clean_text"] and "<IP>" in r0["clean_text"]
    assert "<PHONE>" in r0["clean_text"]
    assert "a.b+c@" not in r0["clean_text"] and "10.0.0.1" not in r0["clean_text"]
    assert rows[1]["clean_text"] == "no pii here"
    assert rows[2]["clean_text"] == ""         # NULL text treated as ''


def test_chunk_containment(spark):
    """Asymmetric containment: a doc quoting half of another scores 1.0
    on the smaller doc even when symmetric overlap is low; unrelated docs
    produce nothing; the df cap drops degenerate chunks."""
    from article_extractor_spark.operators.dedup import chunk_containment_pairs

    base = "x" * 64 + "y" * 64 + "z" * 64 + "w" * 64   # 4 chunks
    quote = "x" * 64 + "y" * 64                          # contained: 2/2
    other = "q" * 256
    docs = spark.createDataFrame(
        [(0, base), (1, quote), (2, other)], "doc_id long, text string")
    rows = {(r["a_id"], r["b_id"]): r
            for r in chunk_containment_pairs(docs, threshold=0.5).collect()}
    assert set(rows) == {(0, 1)}
    assert rows[(0, 1)]["containment"] == 1.0
    assert rows[(0, 1)]["n_shared"] == 2 and rows[(0, 1)]["na"] == 4

    # df cap binds: chunk shared by many docs is dropped
    clones = spark.createDataFrame(
        [(i, "b" * 64) for i in range(10)], "doc_id long, text string")
    assert chunk_containment_pairs(clones, threshold=0.5).count() == 45
    assert chunk_containment_pairs(clones, threshold=0.5,
                                   max_chunk_df=5).count() == 0


def test_chunk_containment_short_docs(spark):
    """Docs shorter than chunk_len emit NO chunks (contract: full chunks
    only, tail ignored) — identical short docs, empty docs, and NULL-text
    docs must never be flagged as duplicates.  Regression for Spark's
    descending sequence(1, 0) == [1, 0] footgun."""
    from article_extractor_spark.operators.dedup import chunk_containment_pairs

    docs = spark.createDataFrame(
        [(0, "short dup"), (1, "short dup"),       # identical, < 64 chars
         (2, ""), (3, ""),                          # identical empty
         (4, None), (5, None),                      # NULL text
         (6, "a" * 64), (7, "a" * 64 + "tail!")],   # one real full chunk
        "doc_id long, text string")
    rows = {(r["a_id"], r["b_id"]): r
            for r in chunk_containment_pairs(docs, threshold=0.5).collect()}
    # ONLY the pair with a genuine shared 64-char chunk survives; the
    # tail of doc 7 contributes nothing (n_chunks == 1 on both sides)
    assert set(rows) == {(6, 7)}
    assert rows[(6, 7)]["na"] == 1 and rows[(6, 7)]["nb"] == 1
    assert rows[(6, 7)]["containment"] == 1.0


def test_asof_join_null_values_and_duplicate_right_rows(spark):
    """DuckDB ASOF semantics: the LATEST matching right row wins even when
    its value columns are NULL (no carry-forward of an older row's value);
    multiple right_vals always come from the same row; duplicate right
    (key, ts) rows resolve deterministically to the greatest value struct."""
    import datetime

    from article_extractor_spark.operators.joins import asof_join

    T = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 0, T(10)), (2, 1, T(10)), (3, 2, T(10))],
        "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(0, T(2), 100, "old"),  (0, T(5), None, None),   # latest is NULL-valued
         (1, T(4), 200, "a"),    (1, T(4), 201, "b"),     # dup (key, ts)
         (2, T(3), None, "only_v2")],                     # mixed-null columns
        "k long, ts timestamp, v1 long, v2 string")
    out = {r["event_id"]: (r["v1"], r["v2"]) for r in asof_join(
        left, right, key="k", right_vals=("v1", "v2")).collect()}
    assert out[1] == (None, None)        # latest row's NULLs, not (100, 'old')
    assert out[2] == (201, "b")          # greatest struct of the tied pair
    assert out[3] == (None, "only_v2")   # both columns from the same row
    # inner keeps event 1: a right row MATCHED even though its values are NULL
    inner = asof_join(left, right, key="k", right_vals=("v1", "v2"), how="inner")
    assert {r["event_id"] for r in inner.collect()} == {1, 2, 3}


def test_stratified_sample_properties(spark):
    """Deterministic, rate-monotone (superset property), rate-accurate,
    and strata-isolated."""
    from article_extractor_spark.operators.textstats import stratified_sample

    docs = spark.createDataFrame(
        [(i, "t", "en" if i % 2 == 0 else "zh") for i in range(2000)],
        "doc_id long, text string, lang string")
    lo = {r["doc_id"] for r in
          stratified_sample(docs, {"en": 0.2, "zh": 1.0}).collect()}
    lo2 = {r["doc_id"] for r in
           stratified_sample(docs, {"en": 0.2, "zh": 1.0}).collect()}
    hi = {r["doc_id"] for r in
          stratified_sample(docs, {"en": 0.6, "zh": 1.0}).collect()}
    assert lo == lo2                 # deterministic across runs
    assert lo <= hi                  # threshold monotonicity
    assert all(i in hi for i in range(1, 2000, 2))  # zh kept at 1.0
    n_en = sum(1 for i in lo if i % 2 == 0)
    assert 120 <= n_en <= 280        # ~20% of 1000, generous CI
    # unlisted stratum drops by default
    none = stratified_sample(docs, {"en": 0.5}).where("lang = 'zh'").count()
    assert none == 0


def test_pack_sequences(spark):
    """Two-level distributed prefix sum == straight sequential cumsum
    (analytic case incl. a doc spanning a pack boundary and an excluded
    empty doc), and the heavy window is bucket-partitioned (the corpus
    never funnels through one task)."""
    from article_extractor_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(0, "a " * 3000), (1, ""), (2, "b " * 2000), (3, "c " * 100)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            pack_sequences(docs, ctx_len=4096, num_buckets=2).collect()}
    assert 1 not in rows                       # empty doc occupies no pack
    assert rows[0]["global_start"] == 0
    assert (rows[0]["pack_first"], rows[0]["pack_last"]) == (0, 0)
    assert rows[2]["global_start"] == 3000
    assert (rows[2]["pack_first"], rows[2]["pack_last"]) == (0, 1)  # spans
    assert rows[3]["global_start"] == 5000
    assert (rows[3]["pack_first"], rows[3]["pack_last"]) == (1, 1)

    # cross-check vs a single global cumsum on a bigger random-ish corpus
    import itertools
    texts = [(i, "w " * ((i * 37) % 200 + 1)) for i in range(300)]
    big = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: (r["global_start"], r["pack_first"], r["pack_last"])
           for r in pack_sequences(big, ctx_len=512, num_buckets=7).collect()}
    cum = 0
    for i, t in texts:
        n = len(t.split())
        assert got[i] == (cum, cum // 512, (cum + n - 1) // 512), i
        cum += n

    plan = pack_sequences(big, ctx_len=512)._jdf.queryExecution() \
        .executedPlan().toString()
    # the per-row window must be partitioned (partitionBy _b); only the
    # K-row bucket-base window may be global
    import re
    heavy = [l for l in plan.splitlines()
             if "Window" in l and "n_tokens" in l and "_b" not in l]
    assert not heavy, heavy


def test_kmeans_converges_on_separable_data(spark):
    """Two tight, well-separated groups: after one refinement every
    member lands with its group's centroid and the empty seeds drop."""
    from article_extractor_spark.operators.similarity import kmeans

    rows = []
    for i in range(10):           # group A: near [1, 0]
        rows.append((i, [1.0, 0.01 * i]))
    for i in range(10, 20):       # group B: near [0, 1]
        rows.append((i, [0.01 * (i - 10), 1.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["centroid_id"]
           for r in kmeans(emb, num_centroids=2, n_iter=2).collect()}
    a = {out[i] for i in range(10)}
    b = {out[i] for i in range(10, 20)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_pq_encode(spark):
    """Every vector's codes match a brute-force Python reference that
    replicates the md5(id) seed order, L2 subspace distances, and
    lowest-code tie-breaking."""
    import hashlib

    from article_extractor_spark.operators.similarity import pq_encode

    vecs = [(i, [float(i)] * 8) for i in range(4)]
    vecs.append((10, [0.0, 0.0, 0.0, 0.0, 3.0, 3.0, 3.0, 3.0]))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["codes"] for r in
           pq_encode(emb, num_subspaces=2, codebook_size=4).collect()}

    seeds = [v for _, v in sorted(
        vecs, key=lambda t: (hashlib.md5(str(t[0]).encode()).hexdigest(), t[0])
    )[:4]]
    for vid, v in vecs:
        want = []
        for s in range(2):
            sub = v[s * 4:(s + 1) * 4]
            dists = [sum((x - c) ** 2 for x, c in
                         zip(sub, seed[s * 4:(s + 1) * 4])) for seed in seeds]
            want.append(dists.index(min(dists)))   # lowest code wins ties
        assert out[vid] == want, (vid, out[vid], want)


def test_ivf_topk(spark):
    from article_extractor_spark.operators.similarity import (brute_force_topk,
                                                              ivf_topk)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    ivf = ivf_topk(emb, q, k=10, num_centroids=8, n_probes=2).collect()
    assert 0 < len(ivf) <= 10
    assert [r["rank"] for r in ivf] == list(range(1, len(ivf) + 1))
    brute_ids = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    # probing 2/8 lists should still recover some of the true top-10
    assert any(r["vec_id"] in brute_ids for r in ivf)


def test_lsh_multiprobe_improves_recall(spark):
    """Hamming-1 multi-probe must never lose candidates vs single-bucket
    probing, and on the seeded corpus it must strictly improve recall@10
    for at least one query (near-boundary vectors live one sign flip away)."""
    from article_extractor_spark.operators.similarity import (brute_force_topk,
                                                              lsh_topk)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    brute = {}
    for r in brute_force_topk(emb, q, k=10).collect():
        brute.setdefault(r["q_id"], set()).add(r["vec_id"])

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["q_id"], set()).add(r["vec_id"])
        per_q = {qid: len(got.get(qid, set()) & ids) / len(ids)
                 for qid, ids in brute.items()}
        return per_q

    single = recall(lsh_topk(emb, q, k=10, num_planes=6, multiprobe=False))
    multi = recall(lsh_topk(emb, q, k=10, num_planes=6, multiprobe=True))
    assert all(multi[qid] >= single[qid] for qid in brute)
    assert sum(multi.values()) > sum(single.values())


def test_real_codec_seam(spark):
    """The day a codec exists, decode_image_real must slot into the SAME
    Arrow plumbing the stub uses (VERDICT #7 seam proof).  Skipped in this
    container (no PIL); the stub itself stays untouched."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from article_extractor_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_image_real, decode_media)

    buf = io.BytesIO()
    PIL_Image.new("RGB", (37, 21)).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), "image/png")], MEDIA_SCHEMA)

    def codec(data, kind):
        return decode_image_real(data)

    row = decode_media(media, decoder=codec).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (37, 21, 1)
    assert row["n_bytes"] == len(png)


def test_decode_image_real_raises_without_codec():
    """In codec-less environments the real decoder must raise
    NotImplementedError (declared stub contract), not silently fake."""
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL installed here; the raise path is for codec-less envs")
    except ImportError:
        pass
    from article_extractor_spark.operators.multimodal import decode_image_real

    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG fake")


def test_gopher_repetition(spark):
    """Hand-checkable Gopher repetition fractions; short/empty/NULL docs
    yield zeros (no bigrams, no lines), never NULL-bigram rows."""
    from article_extractor_spark.operators.textstats import gopher_repetition

    docs = spark.createDataFrame(
        [(0, "dup line\ndup line\nunique one"),
         (1, "a b a b a b"),          # 'a b' bigram dominates
         (2, "one"),                   # single token: no bigrams
         (3, ""), (4, None)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}
    r0 = rows[0]
    assert r0["n_lines"] == 3
    assert r0["frac_dup_lines"] == round(1 - 2 / 3, 6)
    assert r0["frac_chars_dup_lines"] == round(16 / 26, 6)  # 2x'dup line'=16 of 26
    r1 = rows[1]
    assert r1["n_bigrams"] == 5
    assert r1["top_bigram_frac"] == 0.6            # 'a b' 3 of 5
    for d in (2, 3, 4):
        assert rows[d]["n_bigrams"] == 0 and rows[d]["top_bigram_frac"] == 0.0
    assert rows[2]["n_lines"] == 1 and rows[3]["n_lines"] == 0


def test_c4_filters(spark):
    """Line-keep rule (terminal punctuation + >=3 words), lorem/brace
    rejection, and the document keep decision."""
    from article_extractor_spark.operators.textstats import c4_filters

    good = "This is a proper sentence with enough words to pass easily."
    docs = spark.createDataFrame(
        [(0, good + "\nshort.\nno punct line here"),
         (1, "Lorem Ipsum dolor sit amet consectetur adipiscing elit sed do."),
         (2, "function f() { return 1; } with many extra words here today."),
         (3, "tiny doc."),
         (4, None)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in c4_filters(docs).collect()}
    assert rows[0]["n_lines"] == 3 and rows[0]["n_kept_lines"] == 1
    assert rows[0]["keep"] == 1
    assert rows[1]["has_lorem"] == 1 and rows[1]["keep"] == 0
    assert rows[2]["has_brace"] == 1 and rows[2]["keep"] == 0
    assert rows[3]["keep"] == 0          # under min_doc_words
    assert rows[4]["n_words"] == 0 and rows[4]["keep"] == 0


def test_normalize_urls(spark):
    """Canonicalization: scheme/host case, www., default ports, fragments,
    tracking params, param sort, trailing slash; non-URLs pass through."""
    from article_extractor_spark.operators.weburl import normalize_urls

    cases = [
        (0, "HTTP://WWW.Example.COM:80/a/b/?b=2&utm_source=x&a=1#frag",
         "http://example.com/a/b?a=1&b=2"),
        (1, "https://example.com:443/", "https://example.com/"),
        (2, "https://example.com:8443/x", "https://example.com:8443/x"),
        (3, "https://news.example.com./path/", "https://news.example.com/path"),
        (4, "https://example.com?gclid=abc&ref=tw", "https://example.com/"),
        (5, "not a url at all", "not a url at all"),
        (6, None, None),
    ]
    docs = spark.createDataFrame([(i, u) for i, u, _ in cases],
                                 "doc_id long, url string")
    got = {r["url"]: r["url_norm"]
           for r in normalize_urls(docs).collect()}
    for _, url, want in cases:
        assert got[url] == want, (url, got[url], want)


def test_domain_stats(spark):
    from article_extractor_spark.operators.weburl import domain_stats

    docs = spark.createDataFrame(
        [(0, "https://www.a.com/x"), (1, "http://a.com/x/"),
         (2, "https://a.com/y"), (3, "https://b.com/")],
        "doc_id long, url string")
    rows = {r["host"]: r for r in domain_stats(docs).collect()}
    assert rows["a.com"]["n_pages"] == 3
    # /x and /x/ canonicalize together BUT schemes differ (http vs https)
    assert rows["a.com"]["n_distinct_urls"] == 3
    assert rows["b.com"]["n_pages"] == 1


def test_unigram_logprob(spark):
    """Hand-checked corpus unigram surprisal: rarer tokens score higher;
    quantization matches the documented 1e-6 policy; empty docs -> 0."""
    import math

    from article_extractor_spark.operators.textstats import unigram_logprob

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "c"), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}

    def qv(p):  # the operator's per-instance quantization (no final
        return round(-math.log2(p) * 1e6) / 1e6  # round — IEEE-exact)

    total = 5  # a:3 b:1 c:1
    exp0 = ((3 * round(-math.log2(3 / 5) * 1e6)
             + round(-math.log2(1 / 5) * 1e6)) / 1e6) / 4
    assert rows[0]["n_tokens"] == 4
    assert abs(rows[0]["avg_neg_log2p"] - exp0) < 1e-9
    assert rows[1]["avg_neg_log2p"] == qv(1 / 5)
    assert rows[2]["n_tokens"] == 0 and rows[2]["avg_neg_log2p"] == 0.0
    # rarer-token doc is more surprising than the common-token doc
    assert rows[1]["avg_neg_log2p"] > rows[0]["avg_neg_log2p"]


def test_tfidf_keywords(spark):
    from article_extractor_spark.operators.textstats import tfidf_keywords

    docs = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry"),
         (2, "cherry cherry cherry")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["rank"]): r
           for r in tfidf_keywords(docs, k=2).collect()}
    assert out[(0, 1)]["token"] == "apple"      # unique to doc 0, tf 2
    assert out[(0, 2)]["token"] == "banana"
    assert out[(2, 1)]["token"] == "cherry"
    # scores ordered within a doc
    assert out[(0, 1)]["tfidf"] > out[(0, 2)]["tfidf"]


def test_merge_latest_and_new_docs(spark):
    """Upsert semantics: newest ts wins, incoming wins exact ties, new
    keys insert; new_docs returns only unseen keys."""
    from article_extractor_spark.operators.incremental import (merge_latest,
                                                               new_docs)

    existing = spark.createDataFrame(
        [("u1", 10, "old1"), ("u2", 20, "old2"), ("u3", 30, "old3")],
        "url string, ts long, body string")
    incoming = spark.createDataFrame(
        [("u1", 50, "new1"),    # strictly newer -> replaces
         ("u2", 20, "new2"),    # exact tie -> incoming wins
         ("u3", 5, "stale3"),   # older -> corpus row kept
         ("u4", 99, "new4")],   # brand new -> inserted
        "url string, ts long, body string")
    got = {r["url"]: r["body"] for r in
           merge_latest(existing, incoming, key="url", ts="ts").collect()}
    assert got == {"u1": "new1", "u2": "new2", "u3": "old3", "u4": "new4"}

    fresh = new_docs(incoming, existing, key="url")
    assert {r["url"] for r in fresh.collect()} == {"u4"}


def test_ensure_min_partitions_conditional(spark):
    """Repartitions a 1-split input up to the task-slot count, but is a
    NO-OP when the input is already parallel (the 100 TB plan must not
    gain an extra exchange)."""
    from article_extractor_spark.operators.dedup import ensure_min_partitions

    small = spark.createDataFrame([(i,) for i in range(100)], "doc_id long") \
        .coalesce(1)
    assert small.rdd.getNumPartitions() == 1
    boosted = ensure_min_partitions(small)
    assert boosted.rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism
    assert boosted.count() == 100

    wide = spark.createDataFrame([(i,) for i in range(100)], "doc_id long") \
        .repartition(64)
    assert ensure_min_partitions(wide) is wide  # untouched plan object


def test_random_projection(spark):
    """Matches a manual computation with the same hash-derived ±1 weights
    and quantization; deterministic across invocations."""
    from article_extractor_spark.operators.similarity import (_plane_weights,
                                                              random_projection)

    vecs = [(0, [1.0, -2.0, 0.5]), (1, [0.0, 0.0, 0.0]), (2, [0.1234567, 1.0, -1.0])]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: [r[f"c{j}"] for j in range(2)]
           for r in random_projection(emb, out_dims=2, dims=3).collect()}
    ws = _plane_weights(2, 3)
    scale = 1.0 / (2 ** 0.5)
    for vid, v in vecs:
        want = [sum(round(x * 1e6) * int(w) for x, w in zip(v, ws[j]))
                / 1e6 * scale for j in range(2)]
        assert out[vid] == want, (vid, out[vid], want)
    again = {r["vec_id"]: [r[f"c{j}"] for j in range(2)]
             for r in random_projection(emb, out_dims=2, dims=3).collect()}
    assert again == out


def test_decontaminate(spark):
    """Overlap ratios vs a one-doc eval set; zero-shingle and zero-overlap
    docs get explicit zeros (never NULL)."""
    from article_extractor_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "the quick brown fox jumps over a lazy dog"),
         (2, "completely different content about spark engines"),
         (3, ""), (4, None)],
        "doc_id long, text string")
    ev = docs.where(F.col("doc_id") == 0)
    rows = {r["doc_id"]: r for r in
            decontaminate(docs, ev, threshold=0.2).collect()}
    assert rows[0]["n_shingles"] == 7 and rows[0]["overlap_ratio"] == 1.0
    assert rows[0]["contaminated"] == 1
    # doc 1 shares 4 of its 7 trigrams with doc 0
    assert rows[1]["n_overlap"] == 4
    assert rows[1]["overlap_ratio"] == round(4 / 7, 6)
    assert rows[1]["contaminated"] == 1
    # no overlap: explicit zeros, not NULL
    assert rows[2]["n_overlap"] == 0 and rows[2]["overlap_ratio"] == 0.0
    assert rows[2]["contaminated"] == 0
    for d in (3, 4):
        assert rows[d]["n_shingles"] == 0 and rows[d]["overlap_ratio"] == 0.0


def test_classifier_score(spark):
    """Score equals the Python-recomputed hashed-weight mean; empty/NULL
    docs score 0 with keep=0."""
    import hashlib

    from article_extractor_spark.operators.textstats import (
        CLF_DIM, CLF_WEIGHTS, classifier_score)

    docs = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "Spark ENGINES ftw"),
         (2, ""), (3, None)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in classifier_score(docs).collect()}

    def expected(text):
        toks = [t for t in text.lower().split() if t]
        s = sum(CLF_WEIGHTS[int(hashlib.md5(t.encode()).hexdigest()[:6], 16)
                            % CLF_DIM] for t in toks)
        return s / (100.0 * len(toks)) if toks else 0.0

    for d, text in ((0, "the quick brown fox"), (1, "Spark ENGINES ftw")):
        assert rows[d]["clf_score"] == expected(text)
        assert rows[d]["keep"] == int(expected(text) > 0)
    for d in (2, 3):
        assert rows[d]["n_tokens"] == 0 and rows[d]["clf_score"] == 0.0
        assert rows[d]["keep"] == 0


def test_mixture_weights(spark):
    """Hand-checked temperature-0.5 weights and integer planned counts."""
    from article_extractor_spark.operators.textstats import mixture_weights

    docs = spark.createDataFrame(
        [(0, "a", "web"), (1, "b", "web"), (2, "c", "books"),
         (3, "d", "books"), (4, "e", "code")],
        "doc_id long, text string, source string")
    rows = {r["source"]: r for r in
            mixture_weights(docs, budget=10).collect()}
    s2, s1 = round(2 ** 0.5 * 1e6), 1_000_000   # quantized sqrt weights
    tot = 2 * s2 + s1
    assert rows["web"]["mix_weight"] == round(s2 / tot, 6)
    assert rows["code"]["mix_weight"] == round(s1 / tot, 6)
    assert rows["web"]["planned_docs"] == (10 * s2) // tot == 3
    assert rows["code"]["planned_docs"] == (10 * s1) // tot == 2
    assert sum(r["n_docs"] for r in rows.values()) == 5


def test_extract_outlinks_and_pagerank(spark):
    """Edge list drops relative/self links; 3 quantized PageRank
    iterations match the hand-computed fixed-point arithmetic."""
    from article_extractor_spark.operators.linkgraph import (
        extract_outlinks, host_pagerank)

    html_a = ('<a href="https://b.com/1">l</a><a href="/rel">r</a>'
              '<a href="https://a.com/self">s</a>'
              '<a href="https://c.com/2">m</a>')
    pages = spark.createDataFrame(
        [("https://a.com/x", html_a), ("https://b.com/y",
          '<a href="https://a.com/3">l</a>')],
        "url string, html string")
    edges_df = extract_outlinks(pages)
    edges = {(r["src_host"], r["dst_host"]): r["n_links"]
             for r in edges_df.collect()}
    assert edges == {("a.com", "b.com"): 1, ("a.com", "c.com"): 1,
                     ("b.com", "a.com"): 1}

    # binary html column decodes to the same edge list
    pages_bin = pages.select("url", F.encode("html", "UTF-8").alias("html"))
    edges_bin = {(r["src_host"], r["dst_host"]): r["n_links"]
                 for r in extract_outlinks(pages_bin).collect()}
    assert edges_bin == edges

    # hand-computed quantized ranks: a has 2 outlinks (split), b has 1,
    # c is dangling (receives, never emits)
    pr = {r["host"]: r["rank_micro"]
          for r in host_pagerank(edges_df, iterations=3).collect()}
    assert pr == {"a.com": 638750, "b.com": 421468, "c.com": 421468}
    ranks = host_pagerank(edges_df, iterations=3).collect()
    assert all(r["pagerank"] == round(r["rank_micro"] / 1e6, 6)
               for r in ranks)


def test_blocklist_filter(spark):
    """Parent-domain suffixes block subdomains; blocked_by reports the
    most general (shortest) matching entry; unrelated hosts pass."""
    from article_extractor_spark.operators.weburl import blocklist_filter

    urls = spark.createDataFrame(
        [(0, "https://a.b.example.com/x"),      # blocked via example.com
         (1, "https://sub.bad.org/y"),          # blocked via bad.org
         (2, "https://bad.org/z"),              # exact match
         (3, "https://notbad.org/w"),           # suffix chain never 'bad.org'
         (4, "https://example.com.evil.net/v")],  # example.com not a suffix
        "doc_id long, url string")
    blocked = spark.createDataFrame(
        [("example.com",), ("bad.org",), ("b.example.com",)], "host string")
    rows = {r["doc_id"]: r for r in blocklist_filter(urls, blocked).collect()}
    assert rows[0]["blocked"] == 1 and rows[0]["blocked_by"] == "example.com"
    assert rows[1]["blocked"] == 1 and rows[1]["blocked_by"] == "bad.org"
    assert rows[2]["blocked"] == 1 and rows[2]["blocked_by"] == "bad.org"
    assert rows[3]["blocked"] == 0 and rows[3]["blocked_by"] is None
    assert rows[4]["blocked"] == 0


def test_new_op_plan_shapes(spark):
    """Pin the scale-critical plan shapes of the late-round operators:
    classifier inference is a pure projection (zero Exchange); the
    blocklist join is an equi-join (never nested-loop); decontaminate
    and PageRank have no cartesian anywhere."""
    from article_extractor_spark.operators.dedup import decontaminate
    from article_extractor_spark.operators.linkgraph import (
        extract_outlinks, host_pagerank)
    from article_extractor_spark.operators.textstats import classifier_score
    from article_extractor_spark.operators.weburl import blocklist_filter

    docs = spark.createDataFrame(
        [(i, "some words here to score") for i in range(40)],
        "doc_id long, text string")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    assert "Exchange" not in plan(classifier_score(docs)), \
        plan(classifier_score(docs))[:500]

    urls = docs.select("doc_id", F.concat(
        F.lit("https://h"), F.col("doc_id").cast("string"),
        F.lit(".example.com/p")).alias("url"))
    blocked = spark.createDataFrame([("h1.example.com",)], "host string")
    p = plan(blocklist_filter(urls, blocked))
    assert "Cartesian" not in p and "BroadcastNestedLoop" not in p

    p = plan(decontaminate(docs, docs.limit(5)))
    assert "Cartesian" not in p and "BroadcastNestedLoop" not in p

    pages = urls.select("url", F.lit(
        '<a href="https://x.com/1">l</a>').alias("html"))
    p = plan(host_pagerank(extract_outlinks(pages), iterations=2))
    assert "Cartesian" not in p and "BroadcastNestedLoop" not in p


def test_gopher_quality(spark):
    """Hand-checked Gopher quality rules: a clean 50-word doc passes;
    bullet-dominated, too-short, and NULL docs fail."""
    from article_extractor_spark.operators.textstats import gopher_quality

    clean = "the and " + "word " * 48          # 50 words, 2 stopwords
    docs = spark.createDataFrame(
        [(0, clean),
         (1, "- the and " + "word " * 48),     # one line, 100% bullet
         (2, "tiny doc"),                       # < 50 words
         (3, None)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    r0 = rows[0]
    assert r0["n_words"] == 50
    assert r0["mean_word_len"] == round((3 + 3 + 48 * 4) / 50, 6)
    assert r0["frac_alpha_words"] == 1.0 and r0["n_stopwords"] == 2
    assert r0["keep"] == 1
    r1 = rows[1]
    assert r1["frac_bullet_lines"] == 1.0 and r1["keep"] == 0
    assert rows[2]["n_words"] == 2 and rows[2]["keep"] == 0
    assert rows[3]["n_words"] == 0 and rows[3]["keep"] == 0


def test_kmv_distinct_tokens(spark):
    """KMV sketch matches a Python replication: kth-hash estimate for a
    large group, exact small-range rule for a tiny group, and the
    __all__ row built from the merged per-group sketches."""
    import hashlib

    from article_extractor_spark.operators.sketches import (
        HASH_SPACE, kmv_distinct_tokens)

    words_a = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(0, words_a, "a"), (1, "tiny set", "b"), (2, None, "b")],
        "doc_id long, text string, source string")
    k = 8
    rows = {r["source"]: r for r in
            kmv_distinct_tokens(docs, k=k).collect()}

    def h(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16)

    ha = sorted(h(f"w{i}") for i in range(40))
    kth = ha[k - 1]
    assert rows["a"]["exact_distinct"] == 40
    assert rows["a"]["kth_hash"] == kth
    assert rows["a"]["est_distinct"] == ((k - 1) * HASH_SPACE) // kth
    # small-range rule: fewer than k distinct -> estimate is exact
    assert rows["b"]["exact_distinct"] == 2
    assert rows["b"]["est_distinct"] == 2
    # __all__ = k smallest of the union of all group hashes
    hall = sorted(set(ha + [h("tiny"), h("set")]))
    assert rows["__all__"]["exact_distinct"] == 42
    assert rows["__all__"]["kth_hash"] == hall[k - 1]


def test_blocklist_filter_randomized(spark):
    """200 random multi-label hosts vs a random suffix blocklist must
    match a brute-force Python reference (dot-boundary suffix rule)."""
    import random

    from article_extractor_spark.operators.weburl import blocklist_filter

    rng = random.Random(7)
    hosts = []
    for i in range(200):
        labels = [f"l{rng.randrange(6)}"
                  for _ in range(rng.randrange(0, 3))]
        labels += [f"d{rng.randrange(12)}", rng.choice(["com", "org", "net"])]
        hosts.append(".".join(labels))
    blocked = set()
    for h in rng.sample(hosts, 12):
        parts = h.split(".")
        i = rng.randrange(len(parts))
        blocked.add(".".join(parts[i:]))
    blocked |= {"never.example", "x0.zz"}
    blocked = sorted(blocked)

    def ref(host):
        m = [b for b in blocked if host == b or host.endswith("." + b)]
        return min(m, key=len) if m else None

    urls = spark.createDataFrame(
        [(i, f"https://{h}/p") for i, h in enumerate(hosts)],
        "doc_id long, url string")
    bdf = spark.createDataFrame([(b,) for b in blocked], "host string")
    rows = {r["doc_id"]: r for r in blocklist_filter(urls, bdf).collect()}
    assert len(rows) == 200
    for i, h in enumerate(hosts):
        exp = ref(h)
        assert rows[i]["blocked_by"] == exp, (h, exp, rows[i])
        assert rows[i]["blocked"] == int(exp is not None)


def test_kmv_randomized(spark):
    """Random 3-source corpus: sketch output must equal an exact Python
    replication (hash, per-group k-min, union-merged __all__)."""
    import hashlib
    import random

    from article_extractor_spark.operators.sketches import (
        HASH_SPACE, kmv_distinct_tokens)

    rng = random.Random(11)
    rows_in, by_grp = [], {}
    for i in range(120):
        grp = rng.choice(["a", "b", "c"])
        toks = [f"t{rng.randrange(500)}" for _ in range(rng.randrange(0, 30))]
        rows_in.append((i, " ".join(toks), grp))
        by_grp.setdefault(grp, set()).update(toks)
    k = 16

    def h(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16)

    docs = spark.createDataFrame(rows_in, "doc_id long, text string, source string")
    out = {r["source"]: r for r in kmv_distinct_tokens(docs, k=k).collect()}
    all_hashes = set()
    for grp, toks in by_grp.items():
        hs = sorted({h(t) for t in toks})
        all_hashes.update(hs)
        exp_kth = hs[min(k, len(hs)) - 1]
        exp_est = (len(hs) if len(hs) < k
                   else ((k - 1) * HASH_SPACE) // hs[k - 1])
        assert out[grp]["exact_distinct"] == len(hs)
        assert out[grp]["kth_hash"] == exp_kth
        assert out[grp]["est_distinct"] == exp_est
    hs = sorted(all_hashes)
    assert out["__all__"]["exact_distinct"] == len(hs)
    assert out["__all__"]["kth_hash"] == hs[min(k, len(hs)) - 1]


def test_png_codec_roundtrip():
    """Pure-stdlib PNG codec: encode/decode round-trips for every color
    type, size, and scanline filter (incl. per-row cycling); malformed
    inputs raise ValueError."""
    import random

    import pytest as _pytest

    from article_extractor_spark.core.png import (PNG_SIGNATURE, decode_png,
                                                  encode_png)

    rng = random.Random(3)
    for ct, ch in ((0, 1), (2, 3), (6, 4)):
        for (w, h) in ((1, 1), (7, 3), (16, 9)):
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            for ft in (0, 1, 2, 3, 4, None):
                out = decode_png(encode_png(w, h, px, ct, ft))
                assert out == (w, h, ch, px), (ct, w, h, ft)
    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(4, 2, bytes(24), 2, 0)
    with _pytest.raises(ValueError):
        decode_png(good[:20])              # truncated mid-chunk
    assert good[:8] == PNG_SIGNATURE


def test_decode_image_real_png_no_pil(spark):
    """decode_image_real handles PNG without PIL, and plugs into the
    Arrow decode path via the decoder seam."""
    from article_extractor_spark.core.png import encode_png
    from article_extractor_spark.operators.multimodal import (
        decode_image_real, decode_media)

    png = encode_png(5, 4, bytes(range(60)), 2, None)
    assert decode_image_real(png) == (5, 4, 1)

    media = spark.createDataFrame(
        [(0, "image", bytearray(png), "image/png")],
        "media_id long, kind string, content binary, mime string")
    rows = decode_media(
        media, decoder=lambda data, kind: decode_image_real(data)).collect()
    assert rows[0]["width"] == 5 and rows[0]["height"] == 4
    assert rows[0]["n_frames"] == 1


def test_wav_roundtrip_stats(spark):
    """WAV round-trip through the Arrow path: stats equal a direct
    Python recomputation of the synthesized PCM signal."""
    from article_extractor_spark.operators.multimodal import \
        wav_roundtrip_stats

    docs = spark.createDataFrame([(0, "x"), (7, "y")],
                                 "doc_id long, text string")
    rows = {r["media_id"]: r for r in wav_roundtrip_stats(docs).collect()}
    for mid in (0, 7):
        n = mid % 64 + 16
        sig = [((mid * 131 + i * i * 37) % 20001) - 10000 for i in range(n)]
        r = rows[mid]
        assert r["sample_rate"] == 8000 + (mid % 4) * 4000
        assert r["n_samples"] == n and r["n_channels"] == 1
        assert r["sum_abs"] == sum(abs(s) for s in sig)
        assert r["peak"] == max(abs(s) for s in sig)


def test_dup_spans(spark):
    """Winnow guarantee: docs sharing a substring longer than
    k + window - 1 must produce a shared-span pair; unrelated docs
    must not; repeated spans within one doc count once."""
    from article_extractor_spark.operators.dedup import dup_spans

    shared = "the exact same forty character passage here!"   # 44 chars
    docs = spark.createDataFrame(
        [(0, f"unique alpha prologue. {shared} and an alpha tail"),
         (1, f"other beta intro text.. {shared} plus beta ending"),
         (2, "completely different content with no overlap at all, "
             "long enough to produce spans of its own"),
         (3, f"gamma {shared} {shared} gamma")],   # repeats in one doc
        "doc_id long, text string")
    rows = {(r["a_id"], r["b_id"]): r["n_shared_spans"]
            for r in dup_spans(docs, k=24, window=8).collect()}
    assert (0, 1) in rows and rows[(0, 1)] >= 1
    assert (0, 3) in rows and (1, 3) in rows
    assert not any(2 in pair for pair in rows)
    # doc 3's duplicated passage may only add DISTINCT span values:
    # its shared count with 0 can't exceed the span inventory of doc 0
    assert rows[(0, 3)] <= rows[(0, 1)] + len(shared)


def test_robots_filter(spark):
    """Google matching semantics: longest prefix wins, Allow beats
    Disallow on a length tie, no matching rule means allowed."""
    from article_extractor_spark.operators.weburl import robots_filter

    urls = spark.createDataFrame(
        [(0, "https://a.com/private/file"),    # longest: disallow /private/
         (1, "https://a.com/private/ok/x"),    # longer allow overrides
         (2, "https://a.com/tie/x"),           # equal length: allow wins
         (3, "https://a.com/other"),           # only '/' disallow... no:
         (4, "https://b.com/anything"),        # host without rules
         (5, "https://a.com/")],               # bare path
        "doc_id long, url string")
    rules = spark.createDataFrame(
        [("a.com", "disallow", "/private/"),
         ("a.com", "allow", "/private/ok/"),
         ("a.com", "allow", "/tie/"),
         ("a.com", "disallow", "/tie/")],
        "host string, rule string, prefix string")
    rows = {r["doc_id"]: r for r in robots_filter(urls, rules).collect()}
    assert rows[0]["allowed"] == 0
    assert rows[0]["matched_prefix"] == "/private/"
    assert rows[1]["allowed"] == 1
    assert rows[1]["matched_prefix"] == "/private/ok/"
    assert rows[2]["allowed"] == 1 and rows[2]["matched_rule"] == "allow"
    assert rows[3]["allowed"] == 1 and rows[3]["matched_rule"] is None
    assert rows[4]["allowed"] == 1
    assert rows[5]["path"] == "/" and rows[5]["allowed"] == 1


def test_normalize_text(spark):
    """NFC composes combining marks, controls are stripped (keeping
    newline/tab-as-space), whitespace runs collapse, NULL == ''."""
    from article_extractor_spark.operators.textstats import normalize_text

    docs = spark.createDataFrame(
        [(0, "café and Ångström"),
         (1, "bell\x07here  double\t\tspaced "),
         (2, "already clean"),
         (3, None)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert rows[0]["text_norm"] == "café and Ångström"
    assert rows[0]["changed"] == 1
    assert rows[0]["n_chars_after"] == rows[0]["n_chars_before"] - 3
    assert rows[1]["text_norm"] == "bellhere double spaced"
    assert rows[2]["changed"] == 0 and rows[2]["text_norm"] == "already clean"
    assert rows[3]["text_norm"] == "" and rows[3]["n_chars_before"] == 0


def test_minhash_probe_pairs(spark, docs):
    """Probe join is new x index only: the new batch's exact dup in the
    index is found with every band shared; index-internal dup pairs
    (0, 1) must NOT appear."""
    from article_extractor_spark.operators.dedup import minhash_probe_pairs

    new = docs.where(F.col("doc_id") == 1)     # dup of index doc 0
    index = docs.where(F.col("doc_id") != 1)
    pairs = {(r["new_id"], r["index_id"]): r["n_shared_bands"]
             for r in minhash_probe_pairs(new, index,
                                          num_bands=16).collect()}
    assert pairs[(1, 0)] == 16
    assert all(n == 1 for (n, _i) in pairs)    # only the new doc probes


def test_image_phash(spark):
    """The hash equals a direct Python recomputation from the pixel
    formula (bypassing PNG entirely) — proving the codec round-trip
    inside the operator is lossless; hash is within 16 bits."""
    from article_extractor_spark.operators.multimodal import image_phash

    docs = spark.createDataFrame([(3, "x"), (12, "y")],
                                 "doc_id long, text string")
    rows = {r["media_id"]: r for r in image_phash(docs).collect()}
    for mid in (3, 12):
        w, h = mid % 16 + 4, mid % 8 + 3
        cs = [[0] * 4 for _ in range(4)]
        cc = [[0] * 4 for _ in range(4)]
        total = 0
        for y in range(h):
            for x in range(w):
                g = (299 * ((x * 7 + y * 13 + mid) % 256)
                     + 587 * ((x * 3 + y * 5 + 2 * mid) % 256)
                     + 114 * ((x + y + 3 * mid) % 256))
                total += g
                cs[(4 * y) // h][(4 * x) // w] += g
                cc[(4 * y) // h][(4 * x) // w] += 1
        exp = 0
        for ci in range(4):
            for cj in range(4):
                if cs[ci][cj] * (w * h) > total * cc[ci][cj]:
                    exp |= 1 << (ci * 4 + cj)
        r = rows[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["phash"] == exp and 0 <= r["phash"] < (1 << 16)
        assert r["n_bright"] == bin(exp).count("1")


def test_parse_robots_txt(spark):
    """Group tracking: consecutive agent lines share a group, a new
    agent line after rules opens a fresh group, non-matching groups
    contribute nothing, comments and empty Disallow are dropped."""
    from article_extractor_spark.operators.weburl import parse_robots_txt

    body = ("User-agent: badbot\n"
            "Disallow: /\n"
            "User-agent: googlebot\n"
            "User-agent: *\n"          # shares group with googlebot
            "Disallow: /private/  # inline comment\n"
            "Allow: /private/ok\n"
            "Disallow:\n"              # empty -> no rule
            "User-agent: otherbot\n"   # new group, not us
            "Disallow: /also-not-us\n")
    robots = spark.createDataFrame([("a.com", body)],
                                   "host string, content string")
    rules = {(r["rule"], r["prefix"])
             for r in parse_robots_txt(robots).collect()}
    assert rules == {("disallow", "/private/"), ("allow", "/private/ok")}


def test_audio_frame_stats(spark):
    """Per-frame energy equals a direct recomputation from the signal
    formula; partial last frame kept; silence flag integer-exact."""
    import math

    from article_extractor_spark.operators.multimodal import \
        audio_frame_stats

    docs = spark.createDataFrame([(5, "x")], "doc_id long, text string")
    rows = sorted(audio_frame_stats(docs).collect(),
                  key=lambda r: r["frame_idx"])
    mid, n = 5, 5 % 64 + 16                     # 21 samples -> frames 16+5
    sig = [((mid * 131 + i * i * 37) % 20001) - 10000 for i in range(n)]
    assert [r["n_samples"] for r in rows] == [16, 5]
    for f, r in enumerate(rows):
        fr = sig[f * 16:(f + 1) * 16]
        ssq = sum(s * s for s in fr)
        assert r["ssq"] == ssq
        assert r["rms"] == math.sqrt(ssq / len(fr))
        assert r["silent"] == int(ssq < 3000 * 3000 * len(fr))
