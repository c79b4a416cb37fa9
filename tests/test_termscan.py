"""Aho-Corasick term scanning (operators/termscan.py): automaton
matches == naive str.find oracle on overlapping/nested dictionaries,
randomized corpora, word-boundary gating, caps — plus per-doc stats
parity and a pure-automaton hypothesis property."""

import random

import pytest
from hypothesis import given, settings, strategies as st

from article_extractor_spark.operators.termscan import (_scan,
                                                        build_automaton)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-termscan-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _naive(text, terms, word_boundary=False):
    hits = []
    for ti, term in enumerate(terms):
        start = text.find(term)
        while start != -1:
            end = start + len(term)
            ok = True
            if word_boundary:
                before = text[start - 1] if start > 0 else ""
                after = text[end] if end < len(text) else ""
                if (before and (before.isalnum() or before == "_")) or \
                        (after and (after.isalnum() or after == "_")):
                    ok = False
            if ok:
                hits.append((ti, start, end))
            start = text.find(term, start + 1)
    return sorted(hits)


CLASSIC = ["he", "she", "his", "hers"]


def test_classic_overlapping_dictionary():
    auto = build_automaton(CLASSIC)
    text = "ushers in the shed washed his hershey"
    assert sorted(_scan(text, auto)) == _naive(text, CLASSIC)


def test_word_boundary_gate():
    auto = build_automaton(CLASSIC)
    text = "she sells; ushers watched his_hers, hers."
    assert sorted(_scan(text, auto, word_boundary=True)) == \
        _naive(text, CLASSIC, word_boundary=True)


def test_empty_term_rejected():
    with pytest.raises(ValueError):
        build_automaton(["ok", ""])


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_automaton_matches_naive_property(data):
    alphabet = "abc"
    terms = data.draw(st.lists(
        st.text(alphabet=alphabet, min_size=1, max_size=4),
        min_size=1, max_size=8, unique=True))
    text = data.draw(st.text(alphabet=alphabet, max_size=60))
    auto = build_automaton(terms)
    assert sorted(_scan(text, auto)) == _naive(text, terms)


def test_spark_matches_and_stats(spark):
    rng = random.Random(31337)
    terms = ["bad", "verybad", "ad", "dword", "xx"]
    docs = []
    for i in range(40):
        docs.append((i, "".join(rng.choice("abdorwvexy ")
                                for _ in range(rng.randint(0, 120)))))
    docs.append((99, "verybad ad xx verybadxx"))
    docs.append((100, None))
    from article_extractor_spark.operators.termscan import (term_matches,
                                                            term_stats)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")

    got = sorted((r["doc_id"], r["term"], r["pos"]) for r in
                 term_matches(df, tdf).collect())
    exp = []
    sorted_terms = sorted(terms)  # the module sorts its dictionary
    for did, t in docs:
        for ti, s, _ in _naive(t or "", sorted_terms):
            exp.append((did, sorted_terms[ti], s))
    assert got == sorted(exp)

    stats = {r["doc_id"]: r for r in term_stats(df, tdf).collect()}
    from collections import defaultdict
    byd = defaultdict(list)
    for did, term, pos in exp:
        byd[did].append((pos, term))
    for did, t in docs:
        hits = sorted(byd.get(did, []))
        s = stats[did]
        assert s["n_matches"] == len(hits)
        assert s["n_distinct_terms"] == len({t for _, t in hits})
        assert s["first_term"] == (hits[0][1] if hits else None)


def test_match_cap_is_deterministic(spark):
    from article_extractor_spark.operators.termscan import term_matches

    df = spark.createDataFrame([(1, "ab" * 500)],
                               "doc_id long, text string")
    tdf = spark.createDataFrame([("ab",)], "term string")
    got = term_matches(df, tdf, max_matches_per_doc=10).collect()
    assert [r["pos"] for r in got] == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]


def test_large_dictionary_scales(spark):
    """10k terms — the regime where a regex alternation dies; the
    automaton builds in O(total term chars) and scans linearly."""
    rng = random.Random(7)
    terms = list({"".join(rng.choice("abcdef") for _ in range(
        rng.randint(3, 8))) for _ in range(10_000)})
    from article_extractor_spark.operators.termscan import term_stats

    docs = [(i, "".join(rng.choice("abcdef ")
                        for _ in range(400))) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = {r["doc_id"]: r["n_matches"] for r in
            term_stats(df, tdf).collect()}
    # spot-verify two docs against the naive oracle
    sorted_terms = sorted(terms)
    for did in (0, 7):
        text = dict(docs)[did]
        assert rows[did] == len(_naive(text, sorted_terms))
