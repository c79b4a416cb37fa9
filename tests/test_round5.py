"""Round-5 additions: color JPEG (YCbCr 4:2:0), JPEG phash routing,
PDF /Filter array form, host_hits empty-graph guard, mutation-counter
ordering, and (added below as the round progresses) BPE tokenization,
foreign-PDF fixtures, and the e2e curation chain."""

import random
import struct

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-round5-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


# ---------------------------------------------------------------- jpeg color

def test_palette_roundtrips_ycbcr_exactly():
    """Every palette triple must survive rgb -> ycbcr -> rgb unchanged —
    the premise of the jpeg_color_decode formula oracle."""
    from article_extractor_spark.core.jpeg import rgb_to_ycbcr, ycbcr_to_rgb
    from article_extractor_spark.operators.multimodal import JPEG_PALETTE

    assert len(JPEG_PALETTE) == 8
    assert len(set(JPEG_PALETTE)) == 8
    for rgb in JPEG_PALETTE:
        assert ycbcr_to_rgb(*rgb_to_ycbcr(*rgb)) == rgb


def test_color_jpeg_constant_mcu_roundtrip_exact():
    from article_extractor_spark.core.jpeg import (decode_jpeg,
                                                   encode_jpeg_color)
    from article_extractor_spark.operators.multimodal import JPEG_PALETTE

    w, h = 48, 32
    rgb = bytearray(w * h * 3)
    for my in range(h // 16):
        for mx in range(w // 16):
            c = JPEG_PALETTE[(mx * 5 + my * 3) % 8]
            for y in range(16):
                for x in range(16):
                    o = ((my * 16 + y) * w + mx * 16 + x) * 3
                    rgb[o:o + 3] = bytes(c)
    dw, dh, nc, out = decode_jpeg(encode_jpeg_color(w, h, bytes(rgb)))
    assert (dw, dh, nc) == (w, h, 3)
    assert out == bytes(rgb)


def test_color_jpeg_odd_dimensions():
    """Non-multiple-of-16 dims exercise edge replication in both the
    luma MCU fill and the chroma subsample; decoded size must match and
    the constant color must survive."""
    from article_extractor_spark.core.jpeg import (decode_jpeg,
                                                   encode_jpeg_color)

    w, h = 19, 13
    c = (255, 156, 0)
    rgb = bytes(c) * (w * h)
    dw, dh, nc, out = decode_jpeg(encode_jpeg_color(w, h, rgb))
    assert (dw, dh, nc) == (w, h, 3)
    assert out == rgb


def test_color_jpeg_lossy_on_general_content_but_bounded():
    from article_extractor_spark.core.jpeg import (decode_jpeg,
                                                   encode_jpeg_color)

    rnd = random.Random(7)
    w = h = 24
    # smooth gradient: codec should track it closely
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            rgb += bytes((min(255, 4 * x + 2 * y), min(255, 3 * y),
                          min(255, 200 - 2 * x if 200 - 2 * x > 0 else 0)))
    dw, dh, nc, out = decode_jpeg(encode_jpeg_color(w, h, bytes(rgb)))
    assert (dw, dh, nc) == (w, h, 3)
    mse = sum((a - b) ** 2 for a, b in zip(out, rgb)) / len(rgb)
    assert 0 < mse < 400, mse
    # pure noise is the worst case but must still decode to same shape
    noise = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    dw, dh, nc, out2 = decode_jpeg(encode_jpeg_color(w, h, noise))
    assert (dw, dh, nc) == (w, h, 3)


def test_decode_jpeg_handles_gray_and_inconsistent_streams():
    from article_extractor_spark.core.jpeg import (decode_jpeg,
                                                   decode_jpeg_gray,
                                                   encode_jpeg_gray)

    w, h = 16, 8
    px = bytes((i * 7) % 256 for i in range(w * h))
    data = encode_jpeg_gray(w, h, px)
    dw, dh, nc, raw = decode_jpeg(data)
    assert (dw, dh, nc) == (w, h, 1)
    assert raw == decode_jpeg_gray(data)[2]
    # SOF0 flipped to SOF2 over a sequential scan header (Ss=0, Se=63)
    # is an invalid progressive stream: must be rejected cleanly, not
    # misdecoded (a progressive DC scan requires Se=0, T.81 G.1)
    prog = data.replace(b"\xFF\xC0", b"\xFF\xC2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    # a DRI segment whose interval never divides an MCU index inside this
    # 2-MCU image is consistent with a marker-free entropy stream: the
    # decoder must accept it and produce identical pixels (restart
    # support landed in round 5)
    dri = data[:2] + b"\xFF\xDD\x00\x04\x00\x08" + data[2:]
    assert decode_jpeg(dri)[3] == raw
    # ... but an interval of 1 demands RST markers the stream lacks
    dri_bad = data[:2] + b"\xFF\xDD\x00\x04\x00\x01" + data[2:]
    with pytest.raises(ValueError):
        decode_jpeg(dri_bad)


def test_decode_image_real_falls_back_on_unsupported_jpeg():
    """ADVICE r4: an FF D8 payload the built-in codec cannot parse must
    not raise ValueError when PIL could handle it; without PIL the
    declared NotImplementedError seam fires (not a codec crash)."""
    from article_extractor_spark.operators.multimodal import \
        decode_image_real

    bogus = b"\xFF\xD8\xFF\xC2" + b"\x00\x08" + b"\x00" * 32
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        with pytest.raises(Exception):  # PIL also rejects truncated junk
            decode_image_real(bogus)
    else:
        with pytest.raises(NotImplementedError):
            decode_image_real(bogus)


def test_jpeg_color_corruption_fails_clean():
    """Bit flips in the entropy segment must raise or change pixels —
    never crash the interpreter or hang."""
    from article_extractor_spark.core.jpeg import (decode_jpeg,
                                                   encode_jpeg_color)

    w = h = 16
    rgb = bytes((150, 0, 255)) * (w * h)
    data = bytearray(encode_jpeg_color(w, h, rgb))
    rnd = random.Random(3)
    for _ in range(25):
        mut = bytearray(data)
        i = rnd.randrange(len(mut) - 3)
        mut[i] ^= 1 << rnd.randrange(8)
        try:
            decode_jpeg(bytes(mut))
        except (ValueError, IndexError, KeyError, struct.error):
            pass


# ---------------------------------------------------------------- pdf filter

def test_pdf_filter_array_form():
    """/Filter [/FlateDecode] (array form, ISO 32000-1 7.3.8.2) must
    parse identically to the single-name form."""
    from article_extractor_spark.core.pdf import extract_pdf_text

    # hand-built minimal PDF whose stream dict uses the array form
    # (patching the writer's output would shift every xref offset)
    import zlib
    content = b"BT /F1 12 Tf 72 720 Td (array filter ok) Tj ET"
    comp = zlib.compress(content)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
        4: (b"<< /Length " + str(len(comp)).encode()
            + b" /Filter [/FlateDecode] >>\nstream\n" + comp
            + b"\nendstream"),
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i in range(1, 5):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + objs[i] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 5\n" + b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n"
            + str(xref_at).encode() + b"\n%%EOF\n")
    pages = extract_pdf_text(bytes(out))
    assert pages == ["array filter ok"]


# ------------------------------------------------------------ host_hits guard

def test_host_hits_empty_edges(spark):
    """ADVICE r4: an empty edge list must yield an empty (or all-zero)
    result, not an unparseable 'DIV None' AnalysisException."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from article_extractor_spark.operators.linkgraph import host_hits

    schema = StructType([
        StructField("src_host", StringType()),
        StructField("dst_host", StringType()),
        StructField("n_links", LongType()),
    ])
    empty = spark.createDataFrame([], schema)
    assert host_hits(empty).count() == 0


def test_host_hits_zero_scores(spark):
    """All-zero n_links weights: max is 0 — must short-circuit to zero
    scores instead of dividing by zero into NULLs."""
    from article_extractor_spark.operators.linkgraph import host_hits

    edges = spark.createDataFrame(
        [("a.com", "b.com", 0), ("b.com", "c.com", 0)],
        "src_host string, dst_host string, n_links long")
    rows = host_hits(edges).collect()
    assert len(rows) == 3
    assert all(r.authority_micro == 0 and r.hub_micro == 0 for r in rows)


# ------------------------------------------------------- mutation counter

def test_mutver_bumps_after_mutation():
    """ADVICE r4: the version must change only once the structural
    change is visible, so a cache keyed on the pre-mutation version can
    never capture the post-mutation tree (and vice versa)."""
    from article_extractor_spark.core import dom

    d = dom.Document()
    root = dom.Node.new_element("div", d)
    d.set_root_element(root)
    child = dom.Node.new_element("p", d)

    before = dom._MUTVER
    root.add_child(child)
    assert dom._MUTVER > before
    # get_content memo keyed on the current version must see the child
    t = dom.Node.new_text("x", d)
    child.add_child(t)
    assert root.get_content() == "x"
    ver = dom._MUTVER
    assert root.get_content() == "x"  # memo hit, version unchanged
    assert dom._MUTVER == ver
    child.unlink()
    assert root.get_content() == ""


# ---------------------------------------------------------------- bpe

def _sequential_apply_reference(word):
    """Independent BPE reference: apply merges one at a time in training
    order (subword-nmt apply_bpe shape) — equivalent to the operator's
    greedy lowest-rank loop by BPE construction, implemented differently
    on purpose."""
    from article_extractor_spark.data.bpe_vocab import MERGES, VOCAB

    vid = {t: i for i, t in enumerate(VOCAB)}
    parts = list(word)
    for a, b in MERGES:
        out, i = [], 0
        while i < len(parts):
            if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return [vid.get(p, 0) for p in parts]


def test_bpe_greedy_equals_sequential_apply_randomized():
    from article_extractor_spark.operators.tokenizer import (_tables,
                                                             bpe_encode_word)

    ranks, vocab = _tables()
    rnd = random.Random(55)
    alphabet = "abcdefghijklmnopqrstuvwyz019,.!XQ "
    for _ in range(500):
        w = "".join(rnd.choice(alphabet)
                    for _ in range(rnd.randrange(1, 24))).strip()
        if not w:
            continue
        for piece in w.split():
            assert bpe_encode_word(piece, ranks, vocab) == \
                _sequential_apply_reference(piece), piece


def test_bpe_known_words_single_token():
    """Fully-trained words must come out as exactly one id, and that id
    must map back to the word in the vocab."""
    from article_extractor_spark.data.bpe_vocab import VOCAB
    from article_extractor_spark.operators.tokenizer import (_tables,
                                                             bpe_encode_word)

    ranks, vocab = _tables()
    for w in ("spark", "query", "filter", "customer", "window", "table"):
        ids = bpe_encode_word(w, ranks, vocab)
        assert len(ids) == 1 and VOCAB[ids[0]] == w, (w, ids)


def test_bpe_unknown_chars_are_unk():
    from article_extractor_spark.operators.tokenizer import (UNK_ID,
                                                             _tables,
                                                             bpe_encode_word)

    ranks, vocab = _tables()
    assert bpe_encode_word("ZZZ", ranks, vocab) == [UNK_ID] * 3
    assert bpe_encode_word("42", ranks, vocab) == [UNK_ID] * 2


def test_bpe_token_ids_dataframe(spark):
    from article_extractor_spark.operators.tokenizer import bpe_token_ids

    df = spark.createDataFrame(
        [(0, "spark query"), (1, ""), (2, None), (3, "zz spark")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in bpe_token_ids(df).collect()}
    assert rows[0].n_bpe_tokens == 2
    assert rows[1].token_ids == [] and rows[2].token_ids == []
    assert rows[3].n_bpe_tokens == 3  # z z spark


def test_pack_counts_matches_pack_sequences(spark):
    """pack_sequences must be exactly pack_counts over the regex counts
    (the refactor cannot change packing semantics)."""
    from article_extractor_spark.operators.packing import (TOKEN_RE,
                                                           pack_counts,
                                                           pack_sequences)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, ("word " * (i % 7)).strip()) for i in range(40)],
        "doc_id long, text string")
    a = sorted(pack_sequences(df, ctx_len=10).collect())
    counts = df.select(
        "doc_id",
        F.size(F.expr(
            f"regexp_extract_all(coalesce(text, ''), '{TOKEN_RE}', 0)"
        )).cast("long").alias("n_tokens"))
    b = sorted(pack_counts(counts, ctx_len=10).collect())
    assert a == b


# ---------------------------------------------------------------- e2e chain

def test_e2e_reference_invariants():
    """Structural invariants of the e2e_curation reference (the Spark
    side is value-pinned to it by the driver gate): mirror records never
    survive dedup, clusters are exactly {1,2}-sized, packing offsets are
    contiguous and start at 0."""
    import __spark_entry__ as entry

    rows = entry._expected_e2e_values("/root/testdata/sf0.001")
    assert rows, "reference produced no survivors"
    offset = entry.E2E_MIRROR_OFFSET
    assert all(r[0] < offset for r in rows), "a mirror record survived"
    sizes = {r[1] for r in rows}
    assert sizes <= {1, 2}, sizes
    assert 2 in sizes, "no mirror dup collapsed (dedup stage had no work)"
    # survivors with cluster_size 2 must be every-7th docs (the mirrors)
    assert all(r[0] % 7 == 0 for r in rows if r[1] == 2)
    cum = 0
    for r in rows:
        rid, size, n_words, n_bpe, gs, pf, pl = r
        assert n_words >= entry.E2E_MIN_WORDS
        assert n_bpe > 0
        assert gs == cum
        assert pf == gs // entry.E2E_CTX
        assert pl == (gs + n_bpe - 1) // entry.E2E_CTX
        cum += n_bpe


# ---------------------------------------------------------------- foreign pdf

def _foreign_pdf_bytes():
    from article_extractor_spark.core.pdf import encode_pdf_foreign

    page1 = [(300.0, 700.0, "right col"),
             (50.0, 700.0, "left col"),
             (50.0, 680.0, "caf\x80 stra\x82e \x81rger")]
    page2 = [(50.0, 700.0, "second page"), (50.0, 680.0, "end.")]
    return encode_pdf_foreign(
        [page1, page2],
        {0x80: "eacute", 0x81: "adieresis", 0x82: "germandbls"})


def test_foreign_pdf_extracts_with_accents_and_layout():
    from article_extractor_spark.core.pdf import extract_pdf_text

    pages = extract_pdf_text(_foreign_pdf_bytes())
    assert pages == ["left col right col\ncafé straße ärger",
                     "second page\nend."]


def test_foreign_pdf_structure_is_actually_foreign():
    """The fixture must really exercise the foreign structure classes —
    if the writer regresses to the primary writer's layout, this fails
    before the parser is even involved."""
    data = _foreign_pdf_bytes()
    assert data.startswith(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3")
    assert b"/Filter [/FlateDecode]" in data
    assert b"% object follows" in data
    # split xref: two subsection headers
    # rindex of bare b"xref" would find "startxref" — anchor on newline
    xref = data[data.rindex(b"\nxref\n"):data.rindex(b"trailer")]
    import re
    subs = re.findall(rb"^(\d+) (\d+)\s*$", xref, re.M)
    assert len(subs) == 2, subs
    # hex string present in the uncompressed second content stream
    assert re.search(rb"<[0-9a-f]{6,}> Tj", data), "no hex-string run"
    # indirect /Length reference
    assert re.search(rb"/Length \d+ 0 R", data)


def test_foreign_pdf_fuzz_fails_clean():
    """Truncations and bit flips over the foreign layout must raise
    clean errors, never hang or return silently-wrong page counts."""
    from article_extractor_spark.core.pdf import extract_pdf_text

    data = _foreign_pdf_bytes()
    good = extract_pdf_text(data)
    rnd = random.Random(11)
    for _ in range(40):
        mut = bytearray(data)
        op = rnd.randrange(3)
        if op == 0:
            mut = mut[:rnd.randrange(20, len(mut))]
        elif op == 1:
            mut[rnd.randrange(len(mut))] ^= 1 << rnd.randrange(8)
        else:
            i = rnd.randrange(len(mut) - 40)
            del mut[i:i + rnd.randrange(1, 40)]
        try:
            got = extract_pdf_text(bytes(mut))
            assert isinstance(got, list)
        except Exception as e:
            assert not isinstance(e, (MemoryError, RecursionError)), e


def test_pdf_hex_string_and_comments_parse():
    from article_extractor_spark.core.pdf import _parse_object

    v, _ = _parse_object(b"  % comment\n <48656C6C6F> ", 0)
    assert v == "Hello"
    d, _ = _parse_object(b"<< /A 1 % inline\n /B <4869> >>", 0)
    assert d == {"/A": 1, "/B": "Hi"}


# ------------------------------------------------------------- semantic dedup

def test_semantic_dedup_drops_higher_id_within_cluster_near_dups(spark):
    """SemDeDup pruning rule: a vector with a lower-id near-duplicate
    (cosine >= threshold) in its own k-means cluster is dropped; exact
    dups always share a cluster (identical assignment), so the higher id
    of every exact pair never survives.  Orthogonal vectors survive
    regardless of cluster."""
    from article_extractor_spark.operators.semdedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),   # exact dup of 1 -> dropped
        (3, [0.9, 0.1, 0.0, 0.0]),   # cos(1,3) ~ 0.9937 -> dropped
        (4, [0.0, 1.0, 0.0, 0.0]),   # orthogonal -> kept
        (5, [0.0, 0.0, 1.0, 0.0]),   # orthogonal -> kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, num_centroids=2, n_iter=1, threshold=0.95)
    kept = {r.vec_id for r in out.collect()}
    assert kept == {1, 4, 5}


def test_semantic_dedup_threshold_one_keeps_non_identical(spark):
    """At threshold just above any non-identical pair's cosine only exact
    duplicates are pruned."""
    from article_extractor_spark.operators.semdedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),             # exact dup -> dropped
        (3, [0.9999, 0.01]),         # cosine 0.99995 < 0.99999 -> kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, num_centroids=1, n_iter=1, threshold=0.99999)
    assert {r.vec_id for r in out.collect()} == {1, 3}


# ---------------------------------------------------------- bigram LM filter

def test_bigram_logprob_is_context_sensitive(spark):
    """Scrambling word order preserves the unigram distribution but must
    raise the bigram surprisal — the property that makes the CCNet-style
    filter catch shuffled/garbled text that unigram scoring passes."""
    from article_extractor_spark.operators.lm import bigram_logprob
    from article_extractor_spark.operators.textstats import unigram_logprob

    fluent = "the cat sat on the mat and the dog sat on the rug"
    words = fluent.split()
    scrambled = " ".join(words[::2] + words[1::2])  # same bag of words
    # several fluent docs + one scrambled: the corpus-trained model is
    # dominated by fluent transitions, so the scrambled doc's pairs are
    # rare even though its own bigrams also enter the training counts
    rows = [(i, fluent) for i in range(1, 6)] + [(6, scrambled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {r.doc_id: r.avg_neg_log2p for r in unigram_logprob(df).collect()}
    assert abs(uni[1] - uni[6]) < 1e-9  # unigram model can't tell
    big = {r.doc_id: r.avg_neg_log2p for r in bigram_logprob(df).collect()}
    assert big[6] > big[1]              # bigram model can


def test_bigram_logprob_short_docs_zero(spark):
    from article_extractor_spark.operators.lm import bigram_logprob

    df = spark.createDataFrame(
        [(1, "word"), (2, ""), (3, None), (4, "two words")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in bigram_logprob(df).collect()}
    assert rows[1].n_bigrams == 0 and rows[1].avg_neg_log2p == 0.0
    assert rows[2].n_bigrams == 0 and rows[3].n_bigrams == 0
    assert rows[4].n_bigrams == 1 and rows[4].avg_neg_log2p > 0.0


# ------------------------------------------------------- leakage-safe splits

def test_train_split_host_disjoint(spark):
    """Every group lands in exactly one split, regardless of its docs."""
    from article_extractor_spark.operators.splits import train_split

    rows = [(i, f"h{i % 7}", 100 + i) for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = train_split(df, cap=5).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.source, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())
    # 70 rows in, 70 rows out (cap flags, never drops)
    assert len(out) == 70
    assert sum(r.kept for r in out) == 7 * 5


def test_train_split_threshold_property(spark):
    """Growing val_pct only moves groups train->val: existing val groups
    stay val (append-only split growth, same hash, bigger threshold)."""
    from article_extractor_spark.operators.splits import assign_split

    rows = [(i, f"host{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    small = {r.source: r.split for r in
             assign_split(df, val_pct=5, test_pct=0).collect()}
    big = {r.source: r.split for r in
           assign_split(df, val_pct=20, test_pct=0).collect()}
    for host, s in small.items():
        if s == "val":
            assert big[host] == "val"


def test_cap_per_group_deterministic_order(spark):
    """Rank is n_chars DESC then doc_id ASC — ties break identically on
    every run/partitioning."""
    from article_extractor_spark.operators.splits import cap_per_group

    rows = [(1, "h", 50), (2, "h", 90), (3, "h", 90), (4, "h", 10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r.doc_id: r.grp_rank for r in cap_per_group(df, cap=2).collect()}
    assert got == {2: 1, 3: 2, 1: 3, 4: 4}


# ------------------------------------------------------ markdown rendering

def test_markdown_structural_elements():
    from article_extractor_spark.core.markdown import html_to_markdown

    html = ("<body><h2>A  Title</h2><p>Text <strong>bold</strong> "
            '<em>it</em> <code>c()</code> <a href="https://x/y">lnk</a> '
            '<img src="i.png" alt="p q"></p>'
            "<ul><li>one</li><li>two</li></ul>"
            "<ol><li>f</li><li>s</li></ol>"
            "<blockquote><p>q1</p></blockquote>"
            "<pre>raw\n  code</pre>"
            "<table><tr><th>h</th></tr><tr><td>v|w</td></tr></table>"
            "<hr></body>")
    assert html_to_markdown(html) == (
        "## A Title\n\n"
        "Text **bold** *it* `c()` [lnk](https://x/y) ![p q](i.png)\n\n"
        "- one\n- two\n\n"
        "1. f\n2. s\n\n"
        "> q1\n\n"
        "```\nraw\n  code\n```\n\n"
        "| h |\n| --- |\n| v\\|w |\n\n"
        "---")


def test_markdown_whitespace_invariance():
    """Formatting-only HTML differences must render identically — the
    property that makes markdown output stable for dedup."""
    from article_extractor_spark.core.markdown import html_to_markdown

    a = "<body><h1>T</h1><p>one two</p></body>"
    b = "<body>\n  <h1>\n    T\n  </h1>\n  <p>\n one\n\ttwo </p>\n</body>"
    assert html_to_markdown(a) == html_to_markdown(b) == "# T\n\none two"


def test_markdown_edge_inputs():
    from article_extractor_spark.core.markdown import html_to_markdown

    assert html_to_markdown("") == ""
    assert html_to_markdown(None) == ""
    assert html_to_markdown("<p></p>") == ""
    assert html_to_markdown("<script>x()</script><p>ok</p>") == "ok"
    # unknown inline elements render their children, never nothing
    assert html_to_markdown("<p><foo>kept</foo></p>") == "kept"
    # br is a line break within the paragraph block
    assert html_to_markdown("<p>a<br>b</p>") == "a\nb"


def test_markdown_stats_spark(spark):
    from article_extractor_spark.operators.render import markdown_stats

    rows = [("u1", "<h1>T</h1><p>body</p><ul><li>x</li></ul>"),
            ("u2", ""), ("u3", None)]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r.url: r for r in markdown_stats(df).collect()}
    assert got["u1"].n_lines == 5  # "# T", "", "body", "", "- x"
    assert got["u1"].n_heading_lines == 1 and got["u1"].n_list_lines == 1
    assert got["u2"].md_bytes == 0 and got["u2"].n_lines == 0
    assert got["u3"].md_bytes == 0  # NULL html -> '' sentinel, total hash


# ---------------------------------------------------- distributed BPE train

def _naive_bpe(freqs, n):
    """Full-recount reference trainer (scripts/train_bpe.py semantics)."""
    import collections
    words = collections.Counter()
    for w, f in freqs:
        words[tuple(w)] += f
    merges = []
    for _ in range(n):
        pairs = collections.Counter()
        for sym, freq in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freq
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append((best[0], best[1], pairs[best]))
        new_words = collections.Counter()
        for sym, freq in words.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] += freq
        words = new_words
    return merges


def test_bpe_train_incremental_equals_recount():
    """The operator's incremental pair-delta loop must agree with the
    naive full-recount reference merge-for-merge (randomized)."""
    import random

    from article_extractor_spark.operators.vocab import _train_merges

    rng = random.Random(11)
    for _ in range(60):
        freqs = [("".join(rng.choice("abcx") for _ in range(rng.randint(1, 8))),
                  rng.randint(1, 9)) for _ in range(rng.randint(1, 30))]
        n = rng.randint(1, 20)
        assert _train_merges(freqs, n) == _naive_bpe(freqs, n)


def test_bpe_train_spark_end_to_end(spark):
    from article_extractor_spark.operators.vocab import bpe_train

    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "low lowest! new newer")],
        "doc_id long, text string")
    got = [(r.rank, r.left, r.right, r.freq)
           for r in bpe_train(df, n_merges=3).collect()]
    # corpus pretokens: low x4, lower, lowest x2, '!', new, newer
    # pair (l,o) and (o,w) both appear 7x -> tie broken to the
    # lexicographically greatest pair (o,w); then (l,ow) 7x; then
    # (low,e) in lower+lowest+newer? no - 'e' follows 'low' only in
    # lower/lowest (3 words: lower 1 + lowest 2 = 3)
    assert got[0] == (0, "o", "w", 7)
    assert got[1] == (1, "l", "ow", 7)
    assert got[2] == (2, "low", "e", 3)


def test_bpe_train_top_k_cap_deterministic(spark):
    """top_k bounds driver state; selection is (freq DESC, word ASC)."""
    from article_extractor_spark.operators.vocab import word_counts

    df = spark.createDataFrame(
        [(1, "aa bb aa cc bb aa")], "doc_id long, text string")
    rows = [(r.word, r.freq) for r in word_counts(df, top_k=2).collect()]
    assert rows == [("aa", 3), ("bb", 2)]


# ------------------------------------------------------- perceptron training

def _naive_perceptron(rows, n_iter):
    """Pure-Python batch perceptron twin of classify.perceptron_train:
    rows = (y, x0..x3); returns [(iter, n_mis, w0..w3)]."""
    w = [0, 0, 0, 0]
    out = []
    for t in range(n_iter):
        mis = [r for r in rows
               if r[0] * sum(w[i] * r[1 + i] for i in range(4)) <= 0]
        upd = [sum(r[0] * r[1 + i] for r in mis) for i in range(4)]
        w = [w[i] + upd[i] for i in range(4)]
        out.append((t, len(mis), *w))
    return out


def test_perceptron_train_matches_naive(spark):
    from article_extractor_spark.operators.classify import perceptron_train

    docs = [
        (1, "the cat and the dog sat on the mat", "en"),
        (2, "der hund und die katze", "de"),
        (3, "to be or not to be that is the question", "en"),
        (4, "el perro y el gato en la casa", "es"),
        (5, "", "en"),
        (6, None, "fr"),
    ]
    df = spark.createDataFrame(
        [(i, t, lang, len(t) if t else 0) for i, t, lang in docs],
        "doc_id long, text string, lang string, n_chars long")

    en = {"the", "and", "of", "to", "in", "is", "that", "for", "with", "on"}
    rows = []
    for _, t, lang, n in [(i, t, lang, len(t) if t else 0)
                          for i, t, lang in docs]:
        # python str.split() drops empty strings — same token definition
        # as the operator's filtered split
        toks = (t or "").lower().split()
        rows.append((1 if lang == "en" else -1, 1,
                     sum(1 for w in toks if w in en), len(toks), n))
    got = [tuple(r) for r in perceptron_train(df, n_iter=4).collect()]
    assert got == _naive_perceptron(rows, 4)


def test_perceptron_converges_on_separable(spark):
    """On a linearly separable toy set, n_mis must reach 0 and the
    weights must then freeze (no updates from an empty mis set... note
    margin<=0 means a zero-weight restart flags everything; separable
    here means it settles after enough iterations)."""
    from article_extractor_spark.operators.classify import perceptron_train

    df = spark.createDataFrame(
        [(1, "the the the the", "en", 400),
         (2, "x", "de", 1)],
        "doc_id long, text string, lang string, n_chars long")
    res = [tuple(r) for r in perceptron_train(df, n_iter=6).collect()]
    # once n_mis hits 0 the weights never change again
    frozen = None
    for row in res:
        if row[1] == 0:
            if frozen is None:
                frozen = row[2:]
            assert row[2:] == frozen


# ------------------------------------------------------------ count-min

def test_cms_overestimates_and_bounds(spark):
    from article_extractor_spark.operators.cms import cms_build, cms_point_query

    df = spark.createDataFrame(
        [(1, "a b a c a b zz"), (2, "b c d a")],
        "doc_id long, text string")
    sketch = cms_build(df)
    assert sketch.count() <= 4 * 64  # d*w hard cap, corpus-independent
    # every row of the sketch sums to the total token count
    import pyspark.sql.functions as F
    per_row = {r["row"]: r["s"] for r in
               sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    assert per_row == {0: 11, 1: 11, 2: 11, 3: 11}

    got = {r.word: (r.true_cnt, r.est_cnt, r.overestimate_ok)
           for r in cms_point_query(df, ["a", "b", "d", "nope"]).collect()}
    assert got["a"][0] == 4 and got["b"][0] == 3 and got["d"][0] == 1
    assert got["nope"][0] == 0
    for w, (t, e, ok) in got.items():
        assert ok and e >= t


# ------------------------------------------------------------------ bm25

def test_bm25_matches_python_reference(spark):
    import math

    from article_extractor_spark.operators.search import bm25_topk

    docs = [(1, "the data of the analysis"), (2, "data data data"),
            (3, "with the analysis"), (4, "nothing relevant here"),
            (5, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ["the", "data", "with", "analysis"]

    toks = {i: (t or "").lower().split() for i, t in docs}
    n = len(docs)
    total = sum(len(v) for v in toks.values())
    avgdl = float(total) / float(n)
    dfreq = {q: sum(1 for v in toks.values() if q in v) for q in terms}
    exp = {}
    for i, v in toks.items():
        s, m = 0, 0
        for q in terms:
            tf = v.count(q)
            if not tf:
                continue
            m += 1
            idf = math.log(1.0 + (float(n) - dfreq[q] + 0.5)
                           / (dfreq[q] + 0.5))
            tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * len(v)) / avgdl))
            # Spark round is half-up; Python round is half-even — use
            # floor(x+0.5) which matches half-up for positives
            s += math.floor(idf * tfn * 1e6 + 0.5)
            m = m
        if m:
            exp[i] = (m, s)
    got = {r.doc_id: (r.matched_terms, r.score_micro)
           for r in bm25_topk(df, terms, k=10).collect()}
    assert got == exp


def test_bm25_topk_truncates_and_orders(spark):
    from article_extractor_spark.operators.search import bm25_topk

    df = spark.createDataFrame(
        [(i, "target " * (i + 1)) for i in range(20)],
        "doc_id long, text string")
    rows = bm25_topk(df, ["target"], k=5).collect()
    assert len(rows) == 5
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)


# ------------------------------------------------------------------ dsir

def test_dsir_prefers_target_distribution(spark):
    from article_extractor_spark.operators.dsir import dsir_weights

    # target (en) docs share bigrams; the out-of-distribution doc does not
    rows = [(1, "alpha beta alpha beta alpha beta", "en"),
            (2, "alpha beta alpha beta", "en"),
            (3, "gamma delta gamma delta gamma delta", "de"),
            (4, "alpha beta alpha beta", "de"),  # raw doc, target-like text
            (5, "x", "en")]                      # < 2 tokens -> (0, 0)
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: (r.n_grams, r.logweight_micro)
           for r in dsir_weights(df).collect()}
    assert got[5] == (0, 0)
    # at toy scale the +256 smoothing mass pushes every log-ratio
    # negative; the signal is RELATIVE: per-gram weight of target-like
    # grams must beat out-of-distribution grams
    assert got[1][1] / got[1][0] > got[3][1] / got[3][0]
    assert got[4][1] / got[4][0] > got[3][1] / got[3][0]
    # identical text => identical weight regardless of the doc's own lang
    assert got[4] == got[2]


def test_dsir_matches_python_reference(spark):
    import hashlib
    import math

    from article_extractor_spark.operators.dsir import dsir_weights

    rows = [(1, "a b c a b", "en"), (2, "c a b", "de"), (3, "b b b b", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def bucket(w1, w2):
        h = hashlib.md5(f"dsir:{w1} {w2}".encode()).hexdigest()[:15]
        return int(h, 16) % 256

    grams = []
    for i, t, lang in rows:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            grams.append((i, lang == "en", bucket(a, b)))
    ct, cr = {}, {}
    for _, is_t, b in grams:
        cr[b] = cr.get(b, 0) + 1
        if is_t:
            ct[b] = ct.get(b, 0) + 1
    tt = sum(ct.values())
    tr = sum(cr.values())
    lrq = {b: math.floor((math.log(ct.get(b, 0) + 1.0)
                          - math.log(float(tt + 256))
                          - math.log(cr[b] + 1.0)
                          + math.log(float(tr + 256))) * 1e6
                         + 0.5) for b in cr}
    exp = {}
    for i, _, _ in rows:
        mine = [lrq[b] for d, _, b in grams if d == i]
        exp[i] = (len(mine), sum(mine))
    got = {r.doc_id: (r.n_grams, r.logweight_micro)
           for r in dsir_weights(df).collect()}
    assert got == exp


# ------------------------------------------------------------- quantiles

def test_quantile_sketch_guarantee_random(spark):
    import random

    from article_extractor_spark.operators.quantiles import quantile_sketch

    rng = random.Random(7)
    vals = [rng.randint(0, 10 ** rng.randint(0, 6)) for _ in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "n_chars long")
    sv = sorted(vals)
    n = len(vals)
    for r in quantile_sketch(df, percentiles=(10, 50, 90, 99)).collect():
        rank = max(1, -(-r.p * n // 100))
        assert r.rank == rank
        true = sv[rank - 1]
        assert r.true_val == true
        assert r.est >= true
        if true >= 1:
            assert r.est <= 2 * true - 1
        assert r.within_2x


def test_quantile_sketch_nonpositive_bucket(spark):
    from article_extractor_spark.operators.quantiles import quantile_sketch

    df = spark.createDataFrame([(0,), (0,), (0,), (5,)], "n_chars long")
    got = {r.p: (r.est, r.true_val, r.within_2x)
           for r in quantile_sketch(df, percentiles=(50, 99)).collect()}
    assert got[50] == (0, 0, True)   # rank 2 -> bucket 0, exact
    assert got[99] == (7, 5, True)   # rank 4 -> bucket 3 upper bound


def test_cms_guarantee_random_corpora(spark):
    """est >= true must hold for every probe on arbitrary corpora —
    the CMS structural guarantee (collisions only inflate)."""
    import random

    from article_extractor_spark.operators.cms import cms_point_query

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(50)]
    for trial in range(3):
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(0, 40))))
                for i in range(30)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        probes = rng.sample(vocab, 8) + ["absent_zz"]
        truth = {}
        for _, t in docs:
            for w in t.split():
                truth[w] = truth.get(w, 0) + 1
        for r in cms_point_query(df, probes).collect():
            assert r.true_cnt == truth.get(r.word, 0)
            assert r.est_cnt >= r.true_cnt and r.overestimate_ok


def test_bm25_and_cms_input_hygiene(spark):
    """Duplicate probes/terms must not double-count; empty query raises."""
    import pytest as _pytest

    from article_extractor_spark.operators.cms import cms_point_query
    from article_extractor_spark.operators.search import bm25_topk

    df = spark.createDataFrame([(1, "a b a"), (2, "b c")],
                               "doc_id long, text string")
    with _pytest.raises(ValueError):
        bm25_topk(df, [])
    dup = bm25_topk(df, ["a", "A", "a"], k=5).collect()
    single = bm25_topk(df, ["a"], k=5).collect()
    assert [(r.doc_id, r.matched_terms, r.score_micro) for r in dup] == \
           [(r.doc_id, r.matched_terms, r.score_micro) for r in single]
    rows = cms_point_query(df, ["a", "a", "b"]).collect()
    assert sorted(r.word for r in rows) == ["a", "b"]


def test_heavy_hitters_exact_and_filtering(spark):
    """Output must equal the exact GROUP BY/HAVING truth (the CMS
    no-false-negative property) on random corpora and thresholds."""
    import random

    from article_extractor_spark.operators.cms import heavy_hitters

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(40)]
    weights = [rng.randint(1, 20) for _ in vocab]
    docs = [(i, " ".join(rng.choices(vocab, weights=weights, k=50)))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    truth = {}
    for _, t in docs:
        for w in t.split():
            truth[w] = truth.get(w, 0) + 1
    for thr in (5, 60, 10_000):
        got = {r.token: r.cnt for r in heavy_hitters(df, thr).collect()}
        assert got == {w: c for w, c in truth.items() if c >= thr}, thr


def test_cms_nondefault_width_and_depth(spark):
    """Width/depth parameters must thread through build, probes, and
    heavy hitters consistently (regression: _bucket_expr once hardcoded
    WIDTH, violating est>=true at width != 64)."""
    from article_extractor_spark.operators.cms import (cms_build,
                                                       cms_point_query,
                                                       heavy_hitters)

    df = spark.createDataFrame(
        [(1, "x y x z x y"), (2, "y z q x")], "doc_id long, text string")
    for d, width in ((2, 8), (3, 128)):
        sketch = cms_build(df, d=d, width=width)
        assert sketch.count() <= d * width
        got = {r.word: (r.true_cnt, r.est_cnt, r.overestimate_ok)
               for r in cms_point_query(df, ["x", "q", "nope"],
                                        d=d, width=width).collect()}
        assert got["x"][0] == 4 and got["q"][0] == 1 and got["nope"][0] == 0
        assert all(ok and e >= t for t, e, ok in got.values())
        hh = {r.token: r.cnt
              for r in heavy_hitters(df, 3, d=d, width=width).collect()}
        assert hh == {"x": 4, "y": 3}
