"""Distributed suffix arrays (operators/suffixarray.py), oracled
against brute-force Python: full suffix permutation, exact duplicated
length-L positions / merged spans, and exact longest repeated
substring — including a fixed-seed randomized corpus so the prune +
sentinel machinery is exercised on inputs nobody hand-shaped.

Corpora are ASCII/BMP on purpose: Spark compares strings in binary
UTF-8 order, Python in codepoint order — identical orders (UTF-8
preserves codepoint order), asserted directly by the char-rank test.
"""

import random

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("aes-suffixarray-tests")
        # doubling rounds are many small jobs: fewer shuffle partitions
        # cut per-job task overhead, which dominates at fixture scale
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


# ------------------------------------------------------- Python oracles

def _oracle_suffix_array(docs):
    """docs: [(doc_id, text)] -> [(doc_id, off, sa)] with equal
    suffixes tie-broken by (doc-id dense rank, off)."""
    # dense doc rank over DISTINCT ids, same as _did_map
    ids = sorted({d for d, _ in docs})
    dr = {d: i for i, d in enumerate(ids)}
    suf = [(t[o:], dr[d], o, d)
           for d, t in docs for o in range(len(t))]
    suf.sort(key=lambda s: (s[0], s[1], s[2]))
    return sorted((d, o, i) for i, (_, _, o, d) in enumerate(suf))


def _oracle_dup_positions(docs, L):
    """Exact duplicated length-L window starts, brute force."""
    from collections import Counter, defaultdict

    wins = Counter()
    where = defaultdict(list)
    for d, t in docs:
        for o in range(len(t) - L + 1):
            w = t[o:o + L]
            wins[w] += 1
            where[w].append((d, o))
    out = []
    for w, c in wins.items():
        if c >= 2:
            out.extend(where[w])
    return sorted(out)


def _oracle_spans(docs, L):
    """Merged maximal intervals (overlap-or-touch) per doc."""
    from collections import defaultdict

    byd = defaultdict(list)
    for d, o in _oracle_dup_positions(docs, L):
        byd[d].append(o)
    spans = []
    for d, offs in byd.items():
        offs.sort()
        start, last = offs[0], offs[0]
        for o in offs[1:]:
            if o > last + L:
                spans.append((d, start, last + L))
                start = o
            last = o
        spans.append((d, start, last + L))
    return sorted(spans)


def _oracle_longest(docs):
    """(length, sorted occurrence list of the winning class) where the
    winner among maximal-length classes is the one containing the
    lexicographically-least (did, off) — matching grp order only loosely,
    so the test checks length exactly and occurrences set membership."""
    best = 0
    from collections import defaultdict

    for L in range(1, max((len(t) for _, t in docs), default=0) + 1):
        if _oracle_dup_positions(docs, L):
            best = L
    return best


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


CORPUS = [
    (10, "the cat sat on the mat"),
    (20, "the cat sat on a hat"),
    (30, "banana bandana"),
    (40, ""),
    (50, "xyz"),
    (60, "the cat sat on the mat"),   # exact dup of doc 10
]


# ------------------------------------------------------- tests

def test_char_ranks_match_python_order(spark):
    from article_extractor_spark.operators.suffixarray import (
        corpus_positions)

    pos = corpus_positions(_df(spark, CORPUS)).collect()
    # rebuild char -> rank from positions via doc text lookup
    texts = dict(CORPUS)
    dids = {i: d for i, d in enumerate(sorted(texts))}
    seen = {}
    for r in pos:
        ch = texts[dids[r["did"]]][r["off"]]
        if ch in seen:
            assert seen[ch] == r["rank"], f"rank split for {ch!r}"
        seen[ch] = r["rank"]
    # dense + ordered like Python's sorted()
    ordered = sorted(seen, key=lambda c: seen[c])
    assert ordered == sorted(seen)
    assert sorted(seen.values()) == list(range(len(seen)))


def test_suffix_array_matches_bruteforce(spark):
    from article_extractor_spark.operators.suffixarray import suffix_array

    got = sorted((r["doc_id"], r["off"], r["sa"]) for r in
                 suffix_array(_df(spark, CORPUS)).collect())
    assert got == _oracle_suffix_array(CORPUS)


@pytest.mark.parametrize("L", [1, 4, 7])
def test_duplicated_positions_exact(spark, L):
    from article_extractor_spark.operators.suffixarray import (
        duplicated_positions)

    rows = duplicated_positions(_df(spark, CORPUS), L).collect()
    got = sorted((r["doc_id"], r["off"]) for r in rows)
    assert got == _oracle_dup_positions(CORPUS, L)
    # grp is a true equality class: same window text within a class,
    # different across classes
    texts = dict(CORPUS)
    bygrp = {}
    for r in rows:
        w = texts[r["doc_id"]][r["off"]:r["off"] + L]
        bygrp.setdefault(r["grp"], set()).add(w)
    classes = list(bygrp.values())
    assert all(len(c) == 1 for c in classes)
    flat = [next(iter(c)) for c in classes]
    assert len(flat) == len(set(flat))


def test_exact_dup_spans_merge(spark):
    from article_extractor_spark.operators.suffixarray import (
        exact_dup_spans)

    L = 4
    got = sorted((r["doc_id"], r["span_start"], r["span_end"]) for r in
                 exact_dup_spans(_df(spark, CORPUS), L).collect())
    assert got == _oracle_spans(CORPUS, L)


def test_longest_repeat_exact(spark):
    from article_extractor_spark.operators.suffixarray import (
        longest_repeat)

    res = longest_repeat(_df(spark, CORPUS))
    assert res["length"] == _oracle_longest(CORPUS)
    # the full doc-10/doc-60 duplicate is the longest repeat
    assert res["length"] == len("the cat sat on the mat")
    texts = dict(CORPUS)
    strs = {texts[d][o:o + res["length"]] for d, o in res["occurrences"]}
    assert len(strs) == 1 and len(res["occurrences"]) >= 2


def test_no_repeat_and_empty_corpus(spark):
    from article_extractor_spark.operators.suffixarray import (
        duplicated_positions, longest_repeat)

    uniq = [(1, "abcdefg")]  # all chars distinct: nothing repeats
    assert longest_repeat(_df(spark, uniq)) == {
        "length": 0, "occurrences": []}
    assert duplicated_positions(_df(spark, uniq), 2).count() == 0
    empty = [(1, ""), (2, "")]
    assert longest_repeat(_df(spark, empty)) == {
        "length": 0, "occurrences": []}


def test_within_doc_repeat(spark):
    from article_extractor_spark.operators.suffixarray import (
        duplicated_positions, longest_repeat)

    docs = [(7, "abcabcabc")]
    got = sorted((r["doc_id"], r["off"]) for r in
                 duplicated_positions(_df(spark, docs), 3).collect())
    assert got == _oracle_dup_positions(docs, 3)
    # longest repeat inside one doc: "abcabc" at 0 and 3
    res = longest_repeat(_df(spark, docs))
    assert res["length"] == 6
    assert res["occurrences"] == [(7, 0), (7, 3)]


def test_randomized_corpus_parity(spark):
    """Fixed-seed random corpus over a 3-letter alphabet (dense with
    repeats) — positions AND spans AND longest length all match brute
    force; exercises prune + sentinel paths on unshaped input."""
    from article_extractor_spark.operators.suffixarray import (
        duplicated_positions, exact_dup_spans, longest_repeat)

    rng = random.Random(0xA55)
    docs = [(i, "".join(rng.choice("abc")
                        for _ in range(rng.randint(0, 40))))
            for i in range(12)]
    df = _df(spark, docs)
    for L in (2, 5):
        got = sorted((r["doc_id"], r["off"]) for r in
                     duplicated_positions(df, L).collect())
        assert got == _oracle_dup_positions(docs, L), f"L={L}"
    L = 5
    got = sorted((r["doc_id"], r["span_start"], r["span_end"]) for r in
                 exact_dup_spans(df, L).collect())
    assert got == _oracle_spans(docs, L)
    assert longest_repeat(df)["length"] == _oracle_longest(docs)


def test_agrees_with_winnowed_span_superset(spark):
    """Cross-check vs the engine's winnowed path: every EXACT
    duplicated position of length >= the winnow window must fall
    inside some winnowed dup span's covered area is NOT guaranteed
    (winnowing samples) — but the reverse holds: winnowed dup spans
    (which are verified by span-text equality) only mark text whose
    k-gram repeats, so each winnowed span k-gram start must appear in
    the exact duplicated-position set at L = k."""
    from article_extractor_spark.operators.dedup import (
        winnowed_span_positions)
    from article_extractor_spark.operators.suffixarray import (
        duplicated_positions)

    docs = [(1, "zz the quick brown fox jumps over the lazy dog zz"),
            (2, "aa the quick brown fox jumps over the lazy dog bb"),
            (3, "unrelated text with no long overlap at all here")]
    df = _df(spark, docs)
    k, window = 8, 4
    spans = winnowed_span_positions(df, k=k, window=window)
    dup_sp = (spans.groupBy("span").count().where("count >= 2")
                   .join(spans, "span"))
    # _pos is 1-based (substr convention); suffixarray offsets 0-based
    winnowed = sorted((r["doc_id"], r["_pos"] - 1) for r in
                      dup_sp.select("doc_id", "_pos").collect())
    assert winnowed, "test premise: the shared sentence must winnow"
    exact = set((r["doc_id"], r["off"]) for r in
                duplicated_positions(df, k).collect())
    missing = [p for p in winnowed if p not in exact]
    assert not missing, missing


def test_remove_exact_dup_spans(spark):
    from article_extractor_spark.operators.suffixarray import (
        duplicated_positions, remove_exact_dup_spans)

    L = 6
    rows = {r["doc_id"]: r for r in remove_exact_dup_spans(
        _df(spark, CORPUS), L).collect()}
    assert set(rows) == {d for d, _ in CORPUS}

    # independent oracle: per-class min (doc-rank, off) survives,
    # other windows union-removed per doc
    dups = duplicated_positions(_df(spark, CORPUS), L).collect()
    rank = {d: i for i, d in enumerate(sorted({x for x, _ in CORPUS}))}
    from collections import defaultdict
    bygrp = defaultdict(list)
    for r in dups:
        bygrp[r["grp"]].append((rank[r["doc_id"]], r["off"],
                                r["doc_id"]))
    losers = defaultdict(set)
    for grp, occ in bygrp.items():
        occ.sort()
        for _, off, did in occ[1:]:
            losers[did].update(range(off, off + L))
    texts = dict(CORPUS)
    for did, text in CORPUS:
        cut = sorted(losers.get(did, set()))
        exp = "".join(ch for i, ch in enumerate(text)
                      if i not in losers.get(did, set()))
        got = rows[did]
        assert got["cleaned_text"] == exp, did
        assert got["n_removed_chars"] == len(
            [i for i in cut if i < len(text)])
    # doc 10 vs 60 are identical: exactly one of them keeps its text
    kept = [rows[d]["cleaned_text"] == texts[d] for d in (10, 60)]
    assert sorted(kept) == [False, True]
