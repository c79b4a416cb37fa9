"""Unigram-LM tokenizer (operators/unigram.py): the full distributed
training loop (seed -> EM -> prune -> EM) and Viterbi encoding pinned
against an independent pure-Python replica.  The per-word 1e-6
quantize-before-sum and integer nano-logprobs make every traced
quantity layout-independent, so the comparison is exact, not
approximate.  Corpus is ASCII-space-only (Java vs Python \\s parity,
same stance as test_hashclf)."""

import math
import re
from collections import Counter

import pytest

NANO = 1_000_000_000
MICRO = 1_000_000
PRETOKEN = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]")


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-unigram-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


CORPUS = [
    (1, "the cat sat on the mat the cat ran"),
    (2, "banana banana banana band bandana"),
    (3, "low lower lowest slow slowest 123 45"),
    (4, "the theme thesis then the the the"),
    (5, "cats eat bananas, dogs eat bones!"),
]

VS, MPL, SEED, ITERS, SHRINK = 24, 6, 60, 2, 0.75


# ---------------------------------------------------- oracle trainer

def _o_word_counts(docs, top_k=100_000):
    c = Counter()
    for _, t in docs:
        c.update(PRETOKEN.findall(t))
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]


def _o_seed(words, max_piece_len, seed_size):
    w = Counter()
    for word, f in words:
        for i in range(len(word)):
            for j in range(i + 1, min(len(word), i + max_piece_len) + 1):
                w[word[i:j]] += f
    top = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    seed = dict(top)
    for p, wt in w.items():
        if len(p) == 1:
            seed[p] = wt
    return seed


def _lse(acc, v, NEG=float("-inf")):
    if v == NEG:
        return acc
    if acc == NEG:
        return v
    return max(acc, v) + math.log1p(math.exp(-abs(acc - v)))


def _o_fb(word, freq, vocab, max_len):
    n = len(word)
    NEG = float("-inf")
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = NEG
        for j in range(max(0, i - max_len), i):
            q = vocab.get(word[j:i])
            if q is not None and alpha[j] != NEG:
                acc = _lse(acc, alpha[j] + q / NANO)
        alpha[i] = acc
    if alpha[n] == NEG:
        return {}
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = NEG
        for k in range(i + 1, min(n, i + max_len) + 1):
            q = vocab.get(word[i:k])
            if q is not None and beta[k] != NEG:
                acc = _lse(acc, q / NANO + beta[k])
        beta[i] = acc
    out = {}
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            q = vocab.get(word[j:i])
            if q is None or alpha[j] == NEG or beta[i] == NEG:
                continue
            post = math.exp(alpha[j] + q / NANO + beta[i] - alpha[n])
            p = word[j:i]
            out[p] = out.get(p, 0.0) + post * freq
    return out


def _o_estep(words, vocab, max_len):
    total = Counter()
    for w, f in words:
        for p, v in _o_fb(w, f, vocab, max_len).items():
            m = round(v * MICRO)
            if m:
                total[p] += m
    return dict(total)


def _o_normalize(counts, required):
    floored = {p: max(c, 1) if p in required else c
               for p, c in counts.items()}
    floored = {p: c for p, c in floored.items() if c > 0}
    tot = sum(floored.values())
    return {p: round(math.log(c / tot) * NANO)
            for p, c in floored.items()}


def _o_train(docs, vocab_size, max_piece_len, seed_size, em_iters,
             shrink, trace=None):
    words = _o_word_counts(docs)
    seed = _o_seed(words, max_piece_len, seed_size)
    required = {p for p in seed if len(p) == 1}
    total = sum(seed.values())
    vocab = {p: round(math.log(wt / total) * NANO)
             for p, wt in seed.items()}
    while True:
        counts = {}
        for _ in range(em_iters):
            counts = _o_estep(words, vocab, max_piece_len)
            if trace is not None:
                trace.append(dict(counts))
            vocab = _o_normalize(counts, required)
        if len(vocab) <= vocab_size:
            break
        target = max(vocab_size, int(math.ceil(len(vocab) * shrink)))
        optional = sorted((counts.get(p, 0), p)
                          for p in vocab if p not in required)
        for _, p in optional[:len(vocab) - target]:
            del vocab[p]
    return {p: vocab[p] for p in sorted(vocab)}


def _o_viterbi(word, vocab, max_len):
    n = len(word)
    best = [None] * (n + 1)
    best[0] = 0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        b, bj = None, -1
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            q = vocab.get(word[j:i])
            if q is None:
                continue
            if b is None or best[j] + q > b:
                b, bj = best[j] + q, j
        best[i], back[i] = b, bj
    if best[n] is None:
        return None
    out = []
    i = n
    while i > 0:
        out.append(word[back[i]:i])
        i = back[i]
    return out[::-1]


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


@pytest.fixture(scope="module")
def trained(spark):
    from article_extractor_spark.operators.unigram import unigram_train

    trace = []
    vdf = unigram_train(_df(spark, CORPUS), vocab_size=VS,
                        max_piece_len=MPL, seed_size=SEED,
                        em_iters=ITERS, shrink=SHRINK, trace=trace)
    return vdf, trace


# ------------------------------------------------------------- tests

def test_training_trace_bit_for_bit(trained):
    _, trace = trained
    otrace = []
    _o_train(CORPUS, VS, MPL, SEED, ITERS, SHRINK, trace=otrace)
    assert len(trace) == len(otrace) and len(trace) >= ITERS
    for got, exp in zip(trace, otrace):
        assert got == exp


def test_final_vocab_matches_oracle(trained):
    vdf, _ = trained
    got = {r["piece"]: r["logprob_nano"] for r in vdf.collect()}
    exp = _o_train(CORPUS, VS, MPL, SEED, ITERS, SHRINK)
    assert got == exp
    assert len(got) <= VS
    # ids dense in sorted-piece order
    ids = [(r["id"], r["piece"]) for r in vdf.collect()]
    assert sorted(ids) == list(enumerate(sorted(got)))


def test_frequent_words_become_single_pieces(trained):
    vdf, _ = trained
    pieces = {r["piece"] for r in vdf.collect()}
    assert "the" in pieces  # 8 occurrences
    assert "banana" in pieces or "anana" in pieces  # heavy substring


def test_encode_matches_oracle_and_roundtrips(spark, trained):
    from article_extractor_spark.operators.unigram import unigram_encode

    vdf, _ = trained
    rows = vdf.collect()
    vocab = {r["piece"]: r["logprob_nano"] for r in rows}
    ids = {r["piece"]: r["id"] for r in rows}
    rid = {v: k for k, v in ids.items()}
    max_len = max(len(p) for p in vocab)
    enc = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"]) for r in
           unigram_encode(_df(spark, CORPUS), vdf).collect()}
    for did, text in CORPUS:
        exp = []
        for w in PRETOKEN.findall(text):
            seg = _o_viterbi(w, vocab, max_len)
            exp.extend(ids[p] for p in seg) if seg else exp.append(-1)
        toks, n = enc[did]
        assert toks == exp and n == len(exp)
        # round-trip: pieces concatenate back to the pretokenized words
        assert "".join(rid[t] for t in toks if t >= 0) == \
            "".join(w for w in PRETOKEN.findall(text)
                    if _o_viterbi(w, vocab, max_len))


def test_unseen_char_is_unk(spark, trained):
    from article_extractor_spark.operators.unigram import unigram_encode

    vdf, _ = trained
    out = unigram_encode(
        _df(spark, [(9, "zzzüq the")]), vdf).collect()[0]
    toks = list(out["tokens"])
    # the word with the unseen char collapses to one UNK, "the" encodes
    assert -1 in toks and toks[-1] != -1


def test_training_is_deterministic(spark, trained):
    from article_extractor_spark.operators.unigram import unigram_train

    vdf, _ = trained
    again = unigram_train(_df(spark, CORPUS), vocab_size=VS,
                          max_piece_len=MPL, seed_size=SEED,
                          em_iters=ITERS, shrink=SHRINK)
    assert sorted(map(tuple, vdf.collect())) == \
        sorted(map(tuple, again.collect()))
