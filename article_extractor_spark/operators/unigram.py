"""Distributed unigram-LM tokenizer training + Viterbi encoding
(Kudo 2018, the SentencePiece unigram model) — the second real subword
family next to BPE (operators/vocab.py trains, operators/tokenizer.py
applies).

Architecture (the same split every production trainer uses, and the
same one vocab.py pinned): corpus-sized work is WORD COUNTING, one
JVM-side pretokenize -> explode -> groupBy shuffle, capped to a
deterministic top-K word table.  Everything iterative then runs over
that BOUNDED table: the E-step is an Arrow-batched forward-backward
over each word's segmentation lattice (per-word independent — a pure
map), followed by ONE piece-keyed aggregation whose output is at most
vocab-size rows; the M-step is a driver-side renormalization of that
vocab-size vector.  At 100 TB the corpus is touched exactly once.

Exactness policy (the engine's quantize-before-sum discipline, as in
bm25/dsir): per-word expected piece counts are quantized to 1e-6
micro-units BEFORE the distributed sum, so partition layout can never
change a result bit; piece log-probs are carried as integer nano-units
(round(log p * 1e9)).  Viterbi encoding runs its DP entirely on those
integer nano-logprobs — ties broken by preferring the LONGER trailing
piece — so segmentations are integer-exact and the pure-Python oracle
in tests/test_unigram.py pins training traces and encodings
bit-for-bit.

Simplifications vs the SentencePiece implementation, stated honestly:
plain maximum-likelihood EM (no digamma/Bayesian correction), pruning
by smallest expected count with single-character pieces protected
(rather than loss-if-removed), and the seed vocabulary is the top-K
frequency-weighted substrings (<= max_piece_len) of the word table.

Unregistered as a driver query this round (the 50-key verification
window is saturated — NOTES.md); pytest-oracled like hashclf and
suffixarray, registration queued for a future round's window.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from article_extractor_spark.operators.vocab import word_counts

NANO = 1_000_000_000
MICRO = 1_000_000


# ------------------------------------------------------------ lattice

def _forward_backward(word: str, freq: int, vocab: dict,
                      max_len: int) -> dict:
    """Expected piece counts for one word under the current model.
    ``vocab`` maps piece -> integer nano-logprob.  Returns
    {piece: float expected count * freq}; empty when the word has no
    segmentation (some char missing from the vocab)."""
    n = len(word)
    NEG = float("-inf")
    lp = {}
    edges = [[] for _ in range(n + 1)]  # edges[i]: (j, piece, logp)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            q = vocab.get(piece)
            if q is not None:
                lpv = q / NANO
                edges[i].append((j, piece, lpv))
                lp[(j, i)] = lpv
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = NEG
        for j, _, lpv in edges[i]:
            v = alpha[j] + lpv
            if v != NEG:
                acc = v if acc == NEG else (
                    max(acc, v) + math.log1p(math.exp(-abs(acc - v))))
        alpha[i] = acc
    if alpha[n] == NEG:
        return {}
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = NEG
        for k in range(i + 1, min(n, i + max_len) + 1):
            lpv = lp.get((i, k))
            if lpv is None:
                continue
            v = lpv + beta[k]
            if v != NEG:
                acc = v if acc == NEG else (
                    max(acc, v) + math.log1p(math.exp(-abs(acc - v))))
        beta[i] = acc
    out: dict = {}
    z = alpha[n]
    for i in range(1, n + 1):
        for j, piece, lpv in edges[i]:
            post = math.exp(alpha[j] + lpv + beta[i] - z)
            out[piece] = out.get(piece, 0.0) + post * freq
    return out


def _viterbi(word: str, vocab: dict, max_len: int) -> list | None:
    """Best segmentation by integer nano-logprob sum; ties prefer the
    longer trailing piece (smaller split point).  None when the word
    has no segmentation under the vocab."""
    n = len(word)
    best = [None] * (n + 1)
    best[0] = 0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        b, bj = None, -1
        # j ascending = longest trailing piece first; strict > keeps it
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            q = vocab.get(word[j:i])
            if q is None:
                continue
            v = best[j] + q
            if b is None or v > b:
                b, bj = v, j
        best[i], back[i] = b, bj
    if best[n] is None:
        return None
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    return pieces[::-1]


# ------------------------------------------------------------- seed

def seed_pieces(words: DataFrame, max_piece_len: int = 8,
                seed_size: int = 2000) -> DataFrame:
    """Candidate pieces: every substring (length <= max_piece_len) of
    the word table weighted by word frequency, top seed_size by
    (weight DESC, piece ASC), UNION all single characters (guaranteed
    coverage).  Pure JVM substring explosion — no Python."""
    subs = words.select(
        F.explode(F.expr(
            f"flatten(transform(sequence(1, char_length(word)), "
            f"i -> transform(sequence(i, least(char_length(word), "
            f"i + {max_piece_len - 1})), "
            f"j -> substring(word, i, j - i + 1))))")).alias("piece"),
        F.col("freq"))
    weighted = (subs.groupBy("piece")
                    .agg(F.sum("freq").cast("bigint").alias("weight")))
    top = (weighted.orderBy(F.col("weight").desc(),
                            F.col("piece").asc())
                   .limit(seed_size))
    chars = (weighted.where(F.length("piece") == 1))
    return top.unionByName(chars).groupBy("piece").agg(
        F.max("weight").alias("weight"))


# ---------------------------------------------------------- training

def _normalize(counts: dict, required: set) -> dict:
    """M-step: micro-counts -> integer nano-logprobs.  Required pieces
    (single chars) are floored to 1 micro-unit so coverage never dies;
    zero-count optional pieces are dropped by the caller."""
    floored = {p: max(c, 1) if p in required else c
               for p, c in counts.items()}
    floored = {p: c for p, c in floored.items() if c > 0}
    total = sum(floored.values())
    return {p: round(math.log(c / total) * NANO)
            for p, c in floored.items()}


def _estep(words: DataFrame, vocab: dict, max_len: int) -> dict:
    """One distributed E-step: per-word forward-backward, per-word
    1e-6 quantization, ONE piece-keyed integer sum."""
    import pandas as pd

    spark = words.sparkSession
    bv = spark.sparkContext.broadcast(vocab)

    def fn(batches):
        for pdf in batches:
            acc: dict = {}
            for w, f in zip(pdf["word"], pdf["freq"]):
                exp_counts = _forward_backward(
                    w, int(f), bv.value, max_len)
                for p, v in exp_counts.items():
                    m = round(v * MICRO)
                    if m:
                        acc[p] = acc.get(p, 0) + m
            yield pd.DataFrame(
                {"piece": pd.Series(list(acc), dtype="object"),
                 "micro": pd.Series(list(acc.values()),
                                    dtype="int64")})

    rows = (words.mapInPandas(fn, "piece string, micro bigint")
                 .groupBy("piece")
                 .agg(F.sum("micro").cast("bigint").alias("micro"))
                 .collect())
    return {r["piece"]: int(r["micro"]) for r in rows}


def unigram_train(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 400, max_piece_len: int = 8,
                  seed_size: int = 2000, top_k_words: int = 100_000,
                  em_iters: int = 2, shrink: float = 0.75,
                  trace: list | None = None) -> DataFrame:
    """Train a unigram tokenizer; returns (id, piece, logprob_nano)
    with ids dense in piece order (deterministic).  ``trace``, when a
    list, receives {piece: micro_count} per E-step for the oracle."""
    spark = df.sparkSession
    words = word_counts(df, text_col, top_k=top_k_words) \
        .localCheckpoint(eager=True)
    seed = seed_pieces(words, max_piece_len, seed_size).collect()
    required = {r["piece"] for r in seed if len(r["piece"]) == 1}
    total = sum(r["weight"] for r in seed)
    vocab = {r["piece"]: round(math.log(r["weight"] / total) * NANO)
             for r in seed}
    while True:
        counts: dict = {}
        for _ in range(em_iters):
            counts = _estep(words, vocab, max_piece_len)
            if trace is not None:
                trace.append(dict(counts))
            vocab = _normalize(counts, required)
        if len(vocab) <= vocab_size:
            break
        # prune: drop lowest-expected-count optional pieces, ties by
        # piece ASC dropped first — fully deterministic
        target_now = max(vocab_size,
                         int(math.ceil(len(vocab) * shrink)))
        optional = sorted(
            ((counts.get(p, 0), p) for p in vocab if p not in required))
        to_drop = len(vocab) - target_now
        for _, p in optional[:to_drop]:
            del vocab[p]
    rows = [(i, p, vocab[p]) for i, p in enumerate(sorted(vocab))]
    return spark.createDataFrame(
        rows, "id int, piece string, logprob_nano bigint")


# ---------------------------------------------------------- encoding

def unigram_encode(df: DataFrame, vocab_df: DataFrame,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Viterbi-encode documents with a trained vocab: (doc_id, tokens
    array<int>, n_tokens).  Words with no segmentation emit a single
    -1 (UNK).  Integer nano-logprob DP — bit-exact, no float compares.
    The vocab is collected once (vocab-size rows) and broadcast."""
    import re

    import pandas as pd

    from article_extractor_spark.operators.vocab import PRETOKEN_SQL

    spark = df.sparkSession
    rows = vocab_df.collect()
    vocab = {r["piece"]: int(r["logprob_nano"]) for r in rows}
    ids = {r["piece"]: int(r["id"]) for r in rows}
    max_len = max((len(p) for p in vocab), default=1)
    # the SQL regex doubles the backslash for Spark's literal layer;
    # Python's re wants it single
    pretoken = re.compile(PRETOKEN_SQL.replace("\\\\", "\\"))
    bv = spark.sparkContext.broadcast((vocab, ids, max_len))

    d = df.select(F.col(id_col).cast("bigint").alias("_id"),
                  F.coalesce(F.col(text_col), F.lit("")).alias("_t"))

    def fn(batches):
        vv, ii, ml = bv.value
        for pdf in batches:
            out_ids, out_toks, out_n = [], [], []
            for did, t in zip(pdf["_id"], pdf["_t"]):
                toks: list = []
                for w in pretoken.findall(t):
                    seg = _viterbi(w, vv, ml)
                    if seg is None:
                        toks.append(-1)
                    else:
                        toks.extend(ii[p] for p in seg)
                out_ids.append(did)
                out_toks.append(toks)
                out_n.append(len(toks))
            yield pd.DataFrame({
                "_id": pd.Series(out_ids, dtype="int64"),
                "tokens": pd.Series(out_toks, dtype="object"),
                "n_tokens": pd.Series(out_n, dtype="int64")})

    return (d.mapInPandas(
                fn, "_id bigint, tokens array<int>, n_tokens bigint")
             .withColumnRenamed("_id", id_col))
