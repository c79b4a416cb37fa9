"""Round-4 additions: baseline-JPEG codec, YUV4MPEG2 container, the
single-pass winnow rewrite, duplicated-span interval merging, and the
recall gate."""
import random

import pytest
from pyspark.sql import SparkSession

from article_extractor_spark.core.jpeg import (decode_jpeg_gray,
                                               encode_jpeg_gray)
from article_extractor_spark.core.y4m import decode_y4m, encode_y4m
from article_extractor_spark.operators.dedup import _winnow_positions


# --------------------------------------------------------------- JPEG

def _const_block_image(mid):
    w, h = 16 + (mid % 2) * 8, 16
    px = bytearray(w * h)
    for by in range(h // 8):
        for bx in range(w // 8):
            v = (mid * 7 + bx * 31 + by * 17) % 256
            for y in range(8):
                row = (by * 8 + y) * w + bx * 8
                for x in range(8):
                    px[row + x] = v
    return w, h, bytes(px)


def test_jpeg_constant_blocks_roundtrip_exactly():
    for mid in (0, 1, 7, 42, 199, 255):
        w, h, px = _const_block_image(mid)
        dw, dh, out = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
        assert (dw, dh) == (w, h)
        assert out == px


def test_jpeg_general_content_lossy_but_close():
    rng = random.Random(7)
    w, h = 24, 16
    px = bytes(rng.randrange(256) for _ in range(w * h))
    dw, dh, out = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
    assert (dw, dh) == (w, h)
    mae = sum(abs(a - b) for a, b in zip(px, out)) / len(px)
    assert 0 < mae < 12  # lossy (DCT quant), but a working codec


def test_jpeg_non_multiple_of_8_dims():
    rng = random.Random(11)
    w, h = 21, 13  # forces edge replication on encode, clipping on decode
    px = bytes(rng.randrange(256) for _ in range(w * h))
    dw, dh, out = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
    assert (dw, dh) == (w, h) and len(out) == w * h


def test_jpeg_smooth_gradient_high_fidelity():
    # low-frequency content should survive almost unharmed
    w, h = 32, 32
    px = bytes((x + y) * 2 % 256 for y in range(h) for x in range(w))
    _, _, out = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
    mae = sum(abs(a - b) for a, b in zip(px, out)) / len(px)
    assert mae < 6


def test_jpeg_rejects_garbage_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x89PNG not a jpeg")
    # flip SOF0 (FFC0) to SOF2 (FFC2, progressive) — must be refused,
    # not silently mis-decoded
    w, h, px = _const_block_image(3)
    data = bytearray(encode_jpeg_gray(w, h, px))
    data[data.index(b"\xFF\xC0")  + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(data))


def test_jpeg_dc_prediction_across_blocks():
    # strongly varying DC path: values chosen to span several magnitude
    # categories so DC diffs exercise multi-bit Huffman codes
    w, h = 40, 8
    vals = [0, 255, 8, 240, 120]
    px = bytearray(w * h)
    for bx, v in enumerate(vals):
        for y in range(8):
            for x in range(8):
                px[y * w + bx * 8 + x] = v
    _, _, out = decode_jpeg_gray(encode_jpeg_gray(w, h, bytes(px)))
    assert out == bytes(px)


# --------------------------------------------------------------- Y4M

def test_y4m_c444_roundtrip():
    w, h = 12, 6
    frames = []
    for f in range(3):
        y = bytes((x + 2 * yy + 3 * f) % 256
                  for yy in range(h) for x in range(w))
        cb = bytes((2 * x + yy + f) % 256
                   for yy in range(h) for x in range(w))
        cr = bytes((x + yy + 2 * f) % 256
                   for yy in range(h) for x in range(w))
        frames.append((y, cb, cr))
    dw, dh, fps, cs, out = decode_y4m(
        encode_y4m(w, h, frames, (30, 1), "C444"))
    assert (dw, dh, fps, cs) == (w, h, (30, 1), "C444")
    assert out == frames


def test_y4m_c420_plane_geometry():
    w, h = 10, 6
    cw, ch = 5, 3
    fr = [(bytes(w * h), bytes(range(cw * ch)), bytes(cw * ch))]
    out = decode_y4m(encode_y4m(w, h, fr, (25, 1), "C420jpeg"))
    assert out[4] == fr


def test_y4m_header_param_order_and_extensions():
    # parameters may appear in any order; X-params must be skipped
    raw = (b"YUV4MPEG2 C444 Xcustom=1 F24:1 H2 W3 Ip A1:1\n"
           b"FRAME\n" + bytes(6) + bytes(6) + bytes(6))
    w, h, fps, cs, frames = decode_y4m(raw)
    assert (w, h, fps, cs) == (3, 2, (24, 1), "C444")
    assert len(frames) == 1


def test_y4m_truncated_frame_raises():
    w, h = 4, 2
    data = encode_y4m(w, h, [(bytes(8), bytes(8), bytes(8))])
    with pytest.raises(ValueError):
        decode_y4m(data[:-3])
    with pytest.raises(ValueError):
        decode_y4m(b"MJPG nope")


# ------------------------------------------------- winnow equivalence

def _winnow_reference(t, k, window):
    """Direct transliteration of the PRE-round-4 Catalyst chain:
    per window j, leftmost position of the window minimum."""
    from hashlib import md5
    n = len(t) - k + 1
    if n < 1:
        return []
    hs = [int(md5(t[i:i + k].encode("utf-8")).hexdigest()[:15], 16)
          for i in range(n)]
    sel = set()
    for j in range(max(n - window + 1, 1)):
        win = hs[j:j + window]
        sel.add(j + win.index(min(win)))
    return sorted(sel)


def test_winnow_matches_reference_semantics():
    rng = random.Random(42)
    alphabet = "abcab é"  # tiny alphabet forces hash ties + non-ASCII
    for trial in range(200):
        n = rng.randrange(0, 60)
        t = "".join(rng.choice(alphabet) for _ in range(n))
        for k, w in ((3, 4), (5, 8), (24, 8)):
            assert _winnow_positions(t, k, w) == _winnow_reference(t, k, w), (
                t, k, w)


def test_winnow_guarantee_shared_substring_detected():
    # any shared substring of length >= k + window - 1 must yield at
    # least one shared selected span
    rng = random.Random(9)
    k, w = 8, 4
    shared = "THE-COMMON-BOILERPLATE-PASSAGE"  # len 30 >= 8+4-1
    for _ in range(20):
        a = "".join(rng.choice("xyz") for _ in range(40)) + shared
        b = shared + "".join(rng.choice("uvw") for _ in range(40))
        spans_a = {a[i:i + k] for i in _winnow_positions(a, k, w)}
        spans_b = {b[i:i + k] for i in _winnow_positions(b, k, w)}
        assert spans_a & spans_b


# ------------------------------------------- interval merge (Spark)

@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-r4-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_dup_span_ranges_merges_intervals(spark):
    from article_extractor_spark.operators.dedup import dup_span_ranges

    boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR DAILY UPDATES AND MORE"
    rows = [
        (1, "unique prefix one   " + boiler),
        (2, "another beginning " + boiler + " trailing tail two"),
        (3, "totally unrelated text with no duplicate passage at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.doc_id, r.span_start, r.span_end)
           for r in dup_span_ranges(df, k=8, window=4).collect()}
    docs = {d for d, _, _ in got}
    assert docs == {1, 2}
    # each doc's merged range must lie inside the boilerplate region and
    # intervals within a doc must not overlap
    for rows_doc in (1, 2):
        ivs = sorted((s, e) for d, s, e in got if d == rows_doc)
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert s2 > e1 + 1
    text1 = rows[0][1]
    start1 = text1.index(boiler) + 1
    for d, s, e in got:
        if d == 1:
            assert s >= start1 and e <= len(text1)


def test_ann_recall_counts_bounded(spark):
    import __spark_entry__ as entry

    out = entry.q_ann_recall(spark, "/root/testdata/sf0.001").collect()
    assert {r.method for r in out} == {"lsh", "ivf_refined"}
    assert all(0 <= r.n_hits <= r.k_total == 5 for r in out)
    assert len(out) == 6  # 3 queries x 2 methods


# ---------------------------------------------- round-4b operators

def test_jsonl_file_roundtrip_and_corrupt_line(spark, tmp_path):
    from article_extractor_spark.sources.jsonl import (DOC_JSON_SCHEMA,
                                                       docs_to_jsonl,
                                                       read_jsonl,
                                                       write_jsonl)

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "hello world", "en", "srcA", 11),
         (2, None, "de", None, 0),
         (3, 'quo"tes and \n newline', "fr", "srcB", 21)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    structured = docs.select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text"),
        F.struct("lang", "source").alias("meta"),
        F.array(F.col("n_chars"),
                F.length(F.coalesce("text", F.lit(""))).cast("bigint"))
        .alias("stats"))
    path = str(tmp_path / "shards")
    write_jsonl(structured, path)
    # the in-row serializer must agree with the file-based datasource:
    # parsing its lines yields the same rows
    inrow = docs_to_jsonl(docs).select("line")
    assert inrow.count() == 3
    # drop a corrupt line in as its own shard (appending to an existing
    # part file would invalidate its Hadoop .crc sidecar): PERMISSIVE
    # must keep the job alive and surface it in _corrupt_record
    with open(path + "/part-extra.json", "w") as f:
        f.write('{"doc_id": broken\n')
    # cache() first: Spark disallows queries whose referenced columns are
    # ONLY the internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD)
    back = read_jsonl(spark, path, DOC_JSON_SCHEMA).cache()
    ok = back.where("_corrupt_record IS NULL").count()
    bad = back.where("_corrupt_record IS NOT NULL").count()
    assert (ok, bad) == (3, 1)
    texts = {r.j["doc_id"]: r.j["text"] for r in
             back.where("_corrupt_record IS NULL")
             .selectExpr("struct(doc_id, text) AS j").collect()}
    assert texts[3] == 'quo"tes and \n newline'
    assert texts[2] == ""


def test_bloom_no_false_negatives(spark):
    import __spark_entry__ as entry

    rows = entry.q_bloom_filter(spark, "/root/testdata/sf0.001").collect()
    # every true member must be bloom-positive
    assert all(r.in_bloom == 1 for r in rows if r.is_member == 1)
    members = sum(r.is_member for r in rows)
    assert members > 0


def test_hll_matches_python_reference(spark):
    import hashlib

    from article_extractor_spark.operators.sketches import \
        hll_distinct_tokens

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{j}" for j in range(i * 7, i * 7 + 50)), "s0")
         for i in range(6)],
        "doc_id bigint, text string, source string")
    got = {r.source: r for r in hll_distinct_tokens(docs).collect()}
    # python reference for the 's0' group
    regs = {}
    for i in range(6):
        for j in range(i * 7, i * 7 + 50):
            tok = f"tok{j}"
            h = int(hashlib.md5(f"hll:{tok}".encode()).hexdigest()[:15], 16)
            b, w = h % 64, h // 64
            rho = 55 if w == 0 else 55 - w.bit_length()
            regs[b] = max(regs.get(b, 0), rho)
    assert got["s0"].n_buckets == len(regs)
    assert got["s0"].sum_rho == sum(regs.values())
    expect_h = (sum(1 << (55 - r) for r in regs.values())
                + (64 - len(regs)) * (1 << 55))
    assert got["s0"].harmonic_scaled == expect_h
    # single group: __all__ must equal it
    assert got["__all__"].harmonic_scaled == expect_h
    # estimator sanity: ~85 distinct tokens, HLL m=64 is coarse (~13%
    # typical error) — just require the right order of magnitude
    n_true = len({f"tok{j}" for i in range(6)
                  for j in range(i * 7, i * 7 + 50)})
    assert 0.5 * n_true < got["s0"].est_distinct < 2.0 * n_true


def test_sentence_chunks_boundaries(spark):
    from article_extractor_spark.operators.textstats import sentence_chunks

    text = "One two three. Four five! Six? " + "x" * 50 + ". Tail here"
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    out = sentence_chunks(df, chunk_chars=20).collect()
    # chunk lens sum to total sentence chars (delimiters excluded)
    import re
    sents = [s for s in re.split(r"[.!?]+\s+", text) if s]
    assert sum(r.chunk_len for r in out) == sum(len(s) for s in sents)
    assert sum(r.n_sents for r in out) == len(sents)
    # a sentence never straddles: every chunk_idx = floor(prefix/20)
    pre = 0
    expect = {}
    for s in sents:
        ci = pre // 20
        n, l = expect.get(ci, (0, 0))
        expect[ci] = (n + 1, l + len(s))
        pre += len(s)
    assert {r.chunk_idx: (r.n_sents, r.chunk_len) for r in out} == expect


def test_dup_span_removal_surgery(spark):
    from article_extractor_spark.operators.dedup import remove_dup_spans

    boiler = "SHARED-BOILERPLATE-PASSAGE-FOR-REMOVAL-TEST"
    rows = [(1, "alpha start " + boiler + " alpha end"),
            (2, "beta opening " + boiler + " beta closing"),
            (3, "nothing duplicated in this one at all")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           remove_dup_spans(df, k=8, window=4).collect()}
    import hashlib
    # doc 3 untouched
    assert out[3].removed_chars == 0
    assert out[3].cleaned_md5 == hashlib.md5(rows[2][1].encode()).hexdigest()
    # docs 1-2: cleaned shorter by removed_chars, consistent lengths
    for d in (1, 2):
        r = out[d]
        assert r.removed_chars > 0
        assert r.cleaned_len == r.orig_len - r.removed_chars
        # the shared passage core must be gone from the cleaned doc:
        # removal covers at least the winnow-guaranteed interior
        assert r.removed_chars >= len(boiler) - 2 * (8 + 4 - 2)


def test_host_hits_ranking_sane(spark):
    from article_extractor_spark.operators.linkgraph import host_hits

    edges = spark.createDataFrame(
        [("huba", "auth1", 3), ("huba", "auth2", 1),
         ("hubb", "auth1", 2), ("lone", "auth2", 1)],
        "src_host string, dst_host string, n_links bigint")
    out = {r.host: r for r in host_hits(edges, iterations=2).collect()}
    # auth1 receives more weighted hub mass than auth2
    assert out["auth1"].authority_micro == 1_000_000  # max-normalized top
    assert out["auth2"].authority_micro < out["auth1"].authority_micro
    # huba links to both strong authorities -> top hub
    assert out["huba"].hub_micro == 1_000_000
    # pure authorities have no outlinks -> zero hub score
    assert out["auth1"].hub_micro == 0 and out["auth2"].hub_micro == 0


# --------------------------------------------------------------- PDF

def test_pdf_roundtrip_layout_order():
    from article_extractor_spark.core.pdf import encode_pdf, extract_pdf_text

    p1 = [(300.0, 700.0, "right column"),
          (50.0, 700.0, "left column"),
          (50.0, 680.0, "second line")]
    p2 = [(50.0, 700.0, "page two")]
    pages = extract_pdf_text(encode_pdf([p1, p2]))
    assert pages == ["left column right column\nsecond line", "page two"]


def test_pdf_string_escapes_and_parens():
    from article_extractor_spark.core.pdf import encode_pdf, extract_pdf_text

    s = r"parens (nested (deep)) back\slash and \n literal"
    out = extract_pdf_text(encode_pdf([[(10.0, 100.0, s)]]))
    assert out[0] == s


def test_pdf_text_operators_interpreted():
    """Hand-written (non-encoder) content stream: TD/T*/TL/'/TJ must all
    place text on the right lines — the interpreter is general, not just
    a mirror of the encoder's Td/Tj output."""
    from article_extractor_spark.core.pdf import (_interpret_text,
                                                  _reading_order)

    content = (b"BT /F1 12 Tf 14 TL 50 700 Td (first) Tj T* (second) Tj "
               b"(third) ' [(fou) -120 (rth)] TJ ET")
    assert _reading_order(_interpret_text(content)) == \
        "first\nsecond\nthird fourth"
    # TD sets leading implicitly; Tm positions absolutely
    content2 = (b"BT 100 700 Td (a) Tj 0 -20 TD (b) Tj T* (c) Tj "
                b"1 0 0 1 300 700 Tm (a2) Tj ET")
    assert _reading_order(_interpret_text(content2)) == "a a2\nb\nc"


def test_pdf_rejects_garbage():
    from article_extractor_spark.core.pdf import extract_pdf_text

    with pytest.raises(ValueError):
        extract_pdf_text(b"not a pdf at all")


def test_decode_image_real_jpeg_seam(spark):
    """decode_image_real now handles baseline JPEG via the built-in
    codec (no PIL needed), through the same Arrow plumbing as the stub."""
    from article_extractor_spark.core.jpeg import encode_jpeg_gray
    from article_extractor_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                              decode_image_real,
                                                              decode_media)

    jpg = encode_jpeg_gray(24, 16, bytes(range(256)) + bytes(128))
    assert decode_image_real(jpg) == (24, 16, 1)
    media = spark.createDataFrame(
        [(1, "image", bytearray(jpg), "image/jpeg")], MEDIA_SCHEMA)
    row = decode_media(
        media, decoder=lambda d, k: decode_image_real(d)).collect()[0]
    assert (row.width, row.height, row.n_frames) == (24, 16, 1)


def test_crawl_schedule_politeness_invariants(spark):
    from article_extractor_spark.operators.weburl import crawl_schedule

    rows = [(i, "h1.com" if i < 6 else "h2.com", 1000 + (i % 2))
            for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id bigint, host string, ts bigint")
    out = sorted(crawl_schedule(df, min_delay=5).collect(),
                 key=lambda r: (r.host, r.slot))
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    for host, rs in by_host.items():
        for a, b in zip(rs, rs[1:]):
            assert b.slot - a.slot >= 5  # politeness gap
        for r in rs:
            assert r.slot >= r.ts       # never before request time
            assert r.wait == r.slot - r.ts
    # closed form equals the sequential fold
    for host, rs in by_host.items():
        prev = None
        for r in rs:
            expect = r.ts if prev is None else max(r.ts, prev + 5)
            assert r.slot == expect, (host, r)
            prev = r.slot


def test_quality_bins_exact_quartiles(spark):
    from article_extractor_spark.operators.textstats import quality_bins

    # 8 docs with strictly increasing word counts -> strictly increasing
    # quality -> exactly 2 docs per quartile
    rows = [(i, "the " * (10 * (i + 1))) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = sorted(quality_bins(df).collect(), key=lambda r: r.quality_micro)
    assert [r.bin for r in out] == [1, 1, 2, 2, 3, 3, 4, 4]
    # equal scores must share a bin
    df2 = spark.createDataFrame(
        [(i, "identical text for every doc") for i in range(10)],
        "doc_id bigint, text string")
    bins = {r.bin for r in quality_bins(df2).collect()}
    assert bins == {1}


# --------------------------------------------- codec fuzz robustness

def test_codec_fuzz_mutated_bytes_fail_clean():
    """Bit-flipped / truncated valid files must either decode or raise a
    clean exception (never hang, never segfault-style corruption)."""
    import struct
    import zlib

    from article_extractor_spark.core.jpeg import encode_jpeg_gray, decode_jpeg_gray
    from article_extractor_spark.core.pdf import encode_pdf, extract_pdf_text
    from article_extractor_spark.core.y4m import encode_y4m, decode_y4m

    rng = random.Random(1234)
    jpg = encode_jpeg_gray(*(_const_block_image(5)[:2]),
                           _const_block_image(5)[2])
    y4m = encode_y4m(4, 2, [(bytes(8), bytes(8), bytes(8))])
    pdf = encode_pdf([[(50.0, 700.0, "fuzz target text")]])
    ok = {"jpeg": 0, "y4m": 0, "pdf": 0}
    for name, data, dec in (("jpeg", jpg, decode_jpeg_gray),
                            ("y4m", y4m, decode_y4m),
                            ("pdf", pdf, extract_pdf_text)):
        for _ in range(120):
            buf = bytearray(data)
            mode = rng.randrange(3)
            if mode == 0:  # flip a byte
                i = rng.randrange(len(buf))
                buf[i] ^= 1 << rng.randrange(8)
            elif mode == 1:  # truncate
                del buf[rng.randrange(1, len(buf)):]
            else:  # splice garbage
                i = rng.randrange(len(buf))
                buf[i:i] = bytes(rng.randrange(256) for _ in range(5))
            try:
                dec(bytes(buf))
                ok[name] += 1
            except (ValueError, KeyError, IndexError, EOFError,
                    zlib.error, struct.error, OverflowError):
                pass
    # decoders must survive; some mutations still decode (e.g. flipped
    # pixel bits) — just require no other exception type escaped
    assert all(v >= 0 for v in ok.values())


def test_dedup_keep_best_selects_highest_quality(spark):
    from article_extractor_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "doc_id bigint")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id bigint, cluster_id bigint")
    scores = spark.createDataFrame(
        [(1, 10), (2, 90), (3, 50), (4, 70)],
        "doc_id bigint, quality_micro bigint")
    out = {r.doc_id: r for r in
           dedup_keep_best(docs, clusters, scores).collect()}
    assert out[2].keep == 1 and out[1].keep == 0   # best of cluster 1
    assert out[1].kept_id == 2
    assert out[3].keep == 1                         # singleton in labels
    assert out[4].keep == 1 and out[4].cluster_id == 4  # unlabeled doc
    # tie-break: equal scores -> min id survives
    scores2 = spark.createDataFrame(
        [(1, 50), (2, 50), (3, 1), (4, 1)],
        "doc_id bigint, quality_micro bigint")
    out2 = {r.doc_id: r for r in
            dedup_keep_best(docs, clusters, scores2).collect()}
    assert out2[1].keep == 1 and out2[2].keep == 0


# --------------------------- tag-index invalidation contract (r4c)

def test_tag_index_invalidation_per_mutation_kind():
    """Every structural/text mutation kind must invalidate the xpath
    tag index and the get_content memo — a future mutation path that
    bypasses the version counter would silently serve stale scans."""
    from article_extractor_spark.core.dom import Node, parse_html
    from article_extractor_spark.core.xpath import Context

    def q(doc, xp):
        return Context(doc).find_nodes(xp)

    doc = parse_html("<html><body><div id='a'><p>one</p></div>"
                     "<span>s</span></body></html>")
    assert len(q(doc, "//p")) == 1

    # add_child
    body = q(doc, "//body")[0]
    body.add_child(Node.new_element("p", doc))
    assert len(q(doc, "//p")) == 2

    # set_name
    q(doc, "//span")[0].set_name("p")
    assert len(q(doc, "//p")) == 3

    # unlink
    q(doc, "//p")[0].unlink()
    assert len(q(doc, "//p")) == 2

    # insert_before
    ref = q(doc, "//p")[0]
    ref.get_parent().insert_before(Node.new_element("p", doc), ref)
    assert len(q(doc, "//p")) == 3

    # replace_child_node
    tgt = q(doc, "//p")[-1]
    tgt.get_parent().replace_child_node(Node.new_element("em", doc), tgt)
    assert len(q(doc, "//p")) == 2
    assert len(q(doc, "//em")) == 1

    # set_content must invalidate the subtree-text memo — including on
    # ANCESTORS of the mutated node (body's memo covers the div)
    body2 = q(doc, "//body")[0]
    before = body2.get_content()
    div = q(doc, "//div")[0]
    div.set_content("changed text")
    assert body2.get_content() != before
    assert "changed text" in body2.get_content()
    # TEXT-node set_content path (direct .text write) invalidates too
    warm = body2.get_content()
    div.get_child_nodes()[0].set_content("rewritten")
    assert "rewritten" in body2.get_content() and warm != body2.get_content()


def test_tag_index_not_shared_across_documents():
    from article_extractor_spark.core.dom import parse_html
    from article_extractor_spark.core.xpath import Context

    d1 = parse_html("<html><body><p>a</p></body></html>")
    d2 = parse_html("<html><body><p>b</p><p>c</p></body></html>")
    assert len(Context(d1).find_nodes("//p")) == 1
    assert len(Context(d2).find_nodes("//p")) == 2
    # interleaved re-query after mutating only d2
    Context(d2).find_nodes("//p")[0].unlink()
    assert len(Context(d1).find_nodes("//p")) == 1
    assert len(Context(d2).find_nodes("//p")) == 1
