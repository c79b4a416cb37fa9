"""Hashed-feature perceptron (operators/hashclf.py): training in the
classifier_score inference feature space, pinned bit-for-bit against
an INDEPENDENT pure-Python oracle, plus the row-identity proof that
``score_with_weights`` IS the existing inference path.

The corpus is ASCII-whitespace-only on purpose: Java's regex ``\\s``
(Spark split) is ASCII [ \\t\\n\\x0B\\f\\r] while Python's ``\\s`` is
Unicode — the oracle splits on the JAVA class so the token definitions
agree by construction, same stance as the DuckDB oracles take.
"""

import hashlib
import re
from collections import Counter

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-hashclf-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


# ------------------------------------------------------- pure-Python oracle

_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _bucket(token: str, dim: int) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:6], 16) % dim


def _feats(text, dim):
    toks = [t for t in _JAVA_WS.split((text or "").lower()) if t]
    return Counter(_bucket(t, dim) for t in toks), len(toks)


def _train(docs, n_iter, dim, init=None):
    """(text, lang) rows -> [(iter, n_mis, weights_after)]"""
    w = list(init) if init is not None else [0] * dim
    trace = []
    for it in range(n_iter):
        upd = [0] * dim
        n_mis = 0
        for text, lang in docs:
            c, _ = _feats(text, dim)
            y = 1 if lang == "en" else -1
            if y * sum(w[b] * v for b, v in c.items()) <= 0:
                n_mis += 1
                for b, v in c.items():
                    upd[b] += y * v
        w = [w[i] + upd[i] for i in range(dim)]
        trace.append((it, n_mis, list(w)))
    return trace


def _score(text, weights, scale):
    c, n = _feats(text, len(weights))
    if n == 0:
        return n, 0.0, 0
    sq = sum(weights[b] * v for b, v in c.items())
    s = float(sq) / (scale * n)
    return n, s, int(s > 0.0)


# an imbalanced, separable-ish corpus with every edge the tokenizer has:
# empty text, NULL text, tab/newline/CR whitespace, mixed case, repeated
# tokens, punctuation-glued tokens, a doc that is pure whitespace
CORPUS = (
    [(f"d{i:03d}", "the quick brown fox jumps over the lazy dog "
      + "word" + str(i % 7), "en") for i in range(14)]
    + [(f"e{i:03d}", "The\tQuick   brown\nfox,\r\njumps!  over the dog.",
        "en") for i in range(6)]
    + [(f"g{i:03d}", "der schnelle braune fuchs springt ueber den hund "
        + "wort" + str(i % 5), "de") for i in range(9)]
    + [(f"f{i:03d}", "le renard brun rapide saute par-dessus le chien",
        "fr") for i in range(5)]
    + [("empty", "", "en"), ("nulls", None, "de"), ("ws", " \t\r\n ", "fr"),
       ("one", "fox", "en"), ("rep", "dog dog dog dog", "de")]
)


def _df(spark):
    return spark.createDataFrame(
        [(d, t, g) for d, t, g in CORPUS], "doc_id string, text string, lang string")


# ------------------------------------------------------------------- tests

def test_training_trace_matches_python_oracle_exactly(spark):
    from article_extractor_spark.operators.hashclf import perceptron_hashed

    dim = 64
    got = perceptron_hashed(_df(spark), n_iter=3, dim=dim).collect()
    want = _train([(t, g) for _, t, g in CORPUS], 3, dim)
    assert len(got) == 3 * dim
    by_iter = {}
    for r in got:
        by_iter.setdefault(r["iter"], {})[r["bucket"]] = (r["n_mis"], r["w"])
    for it, n_mis, w in want:
        rows = by_iter[it]
        assert len(rows) == dim
        assert {nm for nm, _ in rows.values()} == {n_mis}
        assert [rows[b][1] for b in range(dim)] == w


def test_training_small_dim_matches_oracle(spark):
    from article_extractor_spark.operators.hashclf import perceptron_hashed

    dim = 8
    got = perceptron_hashed(_df(spark), n_iter=4, dim=dim).collect()
    want = _train([(t, g) for _, t, g in CORPUS], 4, dim)
    final = {r["bucket"]: r["w"] for r in got if r["iter"] == 3}
    assert [final[b] for b in range(dim)] == want[3][2]
    assert {r["n_mis"] for r in got if r["iter"] == 0} == {want[0][1]}


def test_training_learns_the_separable_corpus(spark):
    """Error count must strictly drop from the zero model on this
    linearly-separable-by-vocabulary corpus — training does work, not
    just agree with the oracle."""
    from article_extractor_spark.operators.hashclf import perceptron_hashed

    got = perceptron_hashed(_df(spark), n_iter=3, dim=64).collect()
    n0 = next(r["n_mis"] for r in got if r["iter"] == 0)
    n2 = next(r["n_mis"] for r in got if r["iter"] == 2)
    assert n0 == len(CORPUS)  # zero weights misclassify everything
    assert n2 < n0


def test_score_with_clf_weights_is_row_identical_to_classifier_score(spark):
    """The drop-in claim, pinned: parameterized inference with the
    stock weight table IS textstats.classifier_score, row for row,
    bit for bit (clf_score compared with ==, not approx)."""
    from article_extractor_spark.operators.hashclf import score_with_weights
    from article_extractor_spark.operators.textstats import (CLF_WEIGHTS,
                                                             classifier_score)

    df = _df(spark)
    a = sorted(classifier_score(df).collect())
    b = sorted(score_with_weights(df, list(CLF_WEIGHTS), scale=100.0).collect())
    assert a == b
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_trained_model_scores_match_python_oracle(spark):
    """End-to-end drop-in: train distributed, score distributed with
    the trained weights, match the pure-Python pipeline exactly."""
    from article_extractor_spark.operators.hashclf import (perceptron_hashed,
                                                           score_with_weights)

    dim = 64
    trace = perceptron_hashed(_df(spark), n_iter=3, dim=dim).collect()
    w = [0] * dim
    for r in trace:
        if r["iter"] == 2:
            w[r["bucket"]] = r["w"]
    got = {r["doc_id"]: (r["n_tokens"], r["clf_score"], r["keep"])
           for r in score_with_weights(_df(spark), w, scale=1.0).collect()}
    for doc_id, text, _ in CORPUS:
        assert got[doc_id] == _score(text, w, 1.0), doc_id


def test_trained_keep_aligns_with_training_labels(spark):
    """The trained filter must actually separate: every doc the final
    model keeps/rejects agrees with the python-oracle margin sign, and
    accuracy on the training corpus beats the all-reject baseline."""
    from article_extractor_spark.operators.hashclf import (perceptron_hashed,
                                                           score_with_weights)

    dim = 64
    w = [0] * dim
    for r in perceptron_hashed(_df(spark), n_iter=3, dim=dim).collect():
        if r["iter"] == 2:
            w[r["bucket"]] = r["w"]
    kept = {r["doc_id"]: r["keep"]
            for r in score_with_weights(_df(spark), w, scale=1.0).collect()}
    correct = sum(1 for d, t, g in CORPUS
                  if kept[d] == (1 if g == "en" else 0))
    n_en = sum(1 for _, _, g in CORPUS if g == "en")
    assert correct > max(n_en, len(CORPUS) - n_en)


def test_overflow_guard_fires_beyond_int64_envelope(spark):
    from article_extractor_spark.operators.hashclf import perceptron_hashed

    with pytest.raises(OverflowError):
        perceptron_hashed(_df(spark), n_iter=1, dim=64,
                          init=[1 << 41] + [0] * 63)


def test_init_length_validated(spark):
    from article_extractor_spark.operators.hashclf import perceptron_hashed

    with pytest.raises(ValueError):
        perceptron_hashed(_df(spark), n_iter=1, dim=64, init=[0] * 8)


def test_randomized_corpus_trace_matches_oracle(spark):
    """300 docs of seed-fixed random tokens (embedded ASCII controls,
    repeated words, zipf-ish lengths, random labels) — the training
    trace must still match the pure-Python oracle bit-for-bit at a
    non-default dim.  Catches tokenizer/hash drift the hand-built
    corpus might miss."""
    import random as _random

    from article_extractor_spark.operators.hashclf import perceptron_hashed

    rng = _random.Random(0xC0FFEE)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789.,;!?'\"-_/()"
    ws = [" ", "  ", "\t", "\n", "\r\n", "\x0b", "\f", " \t "]
    vocab = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randint(1, 12)))
             for _ in range(120)]
    docs = []
    for i in range(300):
        n = rng.randint(0, 40)
        toks = [rng.choice(vocab) for _ in range(n)]
        text = "".join(t + rng.choice(ws) for t in toks) or ""
        lang = rng.choice(["en", "en", "de", "fr", "xx"])
        docs.append((f"r{i:04d}", text if rng.random() > 0.02 else None,
                     lang))
    df = spark.createDataFrame(docs, "doc_id string, text string, lang string")
    dim = 16
    got = perceptron_hashed(df, n_iter=3, dim=dim).collect()
    want = _train([(t, g) for _, t, g in docs], 3, dim)
    for it, n_mis, w in want:
        rows = {r["bucket"]: (r["n_mis"], r["w"])
                for r in got if r["iter"] == it}
        assert {nm for nm, _ in rows.values()} == {n_mis}, it
        assert [rows[b][1] for b in range(dim)] == w, it
