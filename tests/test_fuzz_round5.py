"""Hypothesis property fuzz for the round-5 free-surface modules —
same posture as tests/test_fuzz.py: codecs must round-trip exactly on
arbitrary valid input and FAIL CLEAN (typed error, no hang, no silent
garbage) on arbitrary bytes; sniffers/parsers must never raise on any
input.  Pure-Python surfaces only (no Spark session — these run in
milliseconds per example)."""

from hypothesis import given, settings, strategies as st

from article_extractor_spark.core.charset import (decode_html,
                                                  normalize_label,
                                                  sniff_charset)
from article_extractor_spark.core.gif import (GifError, decode_gif,
                                              encode_gif, lzw_compress,
                                              lzw_decompress)

# ------------------------------------------------------------- GIF


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=3000),
       st.integers(min_value=2, max_value=8))
def test_lzw_roundtrip_any_bytes(data, mcs):
    # clamp symbols into the alphabet for this code size
    n_sym = 1 << mcs
    clamped = bytes(b % n_sym for b in data)
    comp = lzw_compress(clamped, mcs)
    assert lzw_decompress(comp, mcs, max(len(clamped), 1)) == clamped


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_lzw_decompress_garbage_fails_clean(data):
    try:
        out = lzw_decompress(data, 4, 10_000)
        assert len(out) <= 10_000
    except GifError:
        pass


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=24),
       st.integers(min_value=1, max_value=24),
       st.integers(min_value=2, max_value=256),
       st.data())
def test_gif_roundtrip_any_frame(w, h, n_colors, data):
    pal = [(i % 256, (i * 5) % 256, (i * 11) % 256)
           for i in range(n_colors)]
    idx = bytes(data.draw(st.integers(0, n_colors - 1))
                for _ in range(w * h))
    out = decode_gif(encode_gif(w, h, [idx], pal))
    assert out["width"] == w and out["height"] == h
    exp = b"".join(bytes(pal[i]) for i in idx)
    assert out["frames"][0] == exp


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_gif_decode_arbitrary_bytes_fails_clean(data):
    try:
        out = decode_gif(data)
        # decoded something: invariants must hold
        assert out["n_frames"] >= 1
        assert len(out["frames"][0]) == 3 * out["width"] * out["height"]
    except GifError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=10, max_size=400), st.data())
def test_gif_mutated_valid_file_fails_clean(payload, data):
    # start from a VALID gif, then corrupt — the adversarial shape
    w, h = 7, 5
    idx = bytes(b % 4 for b in payload[:w * h].ljust(w * h, b"\x00"))
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    g = bytearray(encode_gif(w, h, [idx], pal))
    n_flips = data.draw(st.integers(1, 6))
    for _ in range(n_flips):
        pos = data.draw(st.integers(0, len(g) - 1))
        g[pos] ^= 1 << data.draw(st.integers(0, 7))
    try:
        out = decode_gif(bytes(g))
        assert len(out["frames"][0]) == 3 * out["width"] * out["height"]
    except GifError:
        pass


# ----------------------------------------------------------- charset


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=2000),
       st.one_of(st.none(), st.text(max_size=60)))
def test_sniff_and_decode_never_raise(data, content_type):
    enc = sniff_charset(data, content_type)
    assert isinstance(enc, str) and enc
    text, used = decode_html(data, content_type)
    assert isinstance(text, str) and used


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30))
def test_normalize_label_total(label):
    out = normalize_label(label)
    assert out is None or isinstance(out, str)
    if out is not None:
        # every returned codec must actually decode bytes
        assert b"ab".decode(out, "replace")


# ----------------------------------------------------- sitemap/feed


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=800))
def test_xml_sources_never_raise_driverside(xml):
    """The JVM-side parsers are exercised in their own test files; the
    regex building blocks here must at least be valid patterns over
    arbitrary text driver-side (catches catastrophic pattern edits)."""
    import re

    from article_extractor_spark.sources.feed import (_ATOM_ALT_LINK,
                                                      _ENTRY_BLOCK,
                                                      _ITEM_BLOCK)
    from article_extractor_spark.sources.sitemap import (_SITEMAP_BLOCK,
                                                         _URL_BLOCK)

    for pat in (_URL_BLOCK, _SITEMAP_BLOCK, _ITEM_BLOCK, _ENTRY_BLOCK,
                _ATOM_ALT_LINK):
        re.findall(pat, xml)  # must terminate quickly, never raise


# ------------------------------------------------------------ unigram


@settings(max_examples=120, deadline=None)
@given(st.data())
def test_viterbi_is_optimal_vs_enumeration(data):
    """The integer-DP Viterbi segmentation scores >= every possible
    segmentation (brute-enumerated for short words), and its pieces
    concatenate back to the word."""
    from article_extractor_spark.operators.unigram import _viterbi

    alphabet = "ab"
    pieces = data.draw(st.lists(
        st.text(alphabet=alphabet, min_size=1, max_size=3),
        min_size=1, max_size=6, unique=True))
    vocab = {p: data.draw(st.integers(-10**9, -1)) for p in pieces}
    word = data.draw(st.text(alphabet=alphabet, min_size=1, max_size=6))
    max_len = max(len(p) for p in vocab)
    got = _viterbi(word, vocab, max_len)

    def all_segs(w):
        if not w:
            yield []
            return
        for i in range(1, len(w) + 1):
            if w[:i] in vocab:
                for rest in all_segs(w[i:]):
                    yield [w[:i]] + rest

    best = None
    for seg in all_segs(word):
        s = sum(vocab[p] for p in seg)
        if best is None or s > best:
            best = s
    if best is None:
        assert got is None
    else:
        assert got is not None and "".join(got) == word
        assert sum(vocab[p] for p in got) == best


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.data())
def test_gif_interlaced_roundtrip_any_size(w, h, data):
    pal = [(0, 0, 0), (80, 90, 100), (200, 10, 30), (255, 255, 255)]
    idx = bytes(data.draw(st.integers(0, 3)) for _ in range(w * h))
    out = decode_gif(encode_gif(w, h, [idx], pal, interlace=True))
    assert out["frames"][0] == b"".join(bytes(pal[i]) for i in idx)
