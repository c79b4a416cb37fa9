"""Distributed BPE vocabulary TRAINING (Sennrich et al. 2016).

`operators/tokenizer.py` applies a pre-trained vocab; this module
trains one as a Spark job, completing the subword story end-to-end.

Architecture — the one production tokenizer trainers use (and the only
one that scales): the corpus-sized work is WORD COUNTING, which runs
distributed (JVM-side pretokenize regex -> explode -> groupBy word);
the merge loop then operates on the word-frequency table, whose size
is the DISTINCT vocabulary (bounded via a deterministic top-K by
(count DESC, word ASC) — TakeOrderedAndProject, never a global sort),
not the corpus.  At 100 TB the count stage is one shuffle over ~10^6
distinct words per partition-combine; the driver holds K rows, period.

The driver-side merge loop here is the INCREMENTAL algorithm (pair
counts updated by delta on only the words containing the merged pair,
via an inverted pair->words index) — O(affected words) per merge
instead of a full recount.  The value oracle replays training with the
naive full-recount reference (scripts/train_bpe.py semantics), so the
two independent algorithms must agree merge-for-merge, frequency-for-
frequency.  Tie-break matches the reference trainer: highest count,
then lexicographically greatest pair."""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# NB: doubled backslash — Spark SQL string literals consume one level
# of escaping, so '\\s' in the expr string reaches the regex as \s
PRETOKEN_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def word_counts(df: DataFrame, text_col: str = "text",
                top_k: int = 100_000) -> DataFrame:
    """Distributed (word, freq) over the pretokenized corpus, capped to
    the top_k by (freq DESC, word ASC) — fully deterministic."""
    return (df
            .select(F.explode(F.expr(
                f"regexp_extract_all(coalesce({text_col}, ''), "
                f"'{PRETOKEN_SQL}', 0)")).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("word").asc())
            .limit(top_k))


def _segment(sym: Tuple[str, ...], pair: Tuple[str, str]) -> Tuple[str, ...]:
    out: List[str] = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _train_merges(freqs: List[Tuple[str, int]],
                  n_merges: int) -> List[Tuple[str, str, int]]:
    """Incremental greedy BPE over a (word, freq) list: returns
    (left, right, pair_freq_at_merge) per merge, in order."""
    words: Dict[Tuple[str, ...], int] = {}
    for w, f in freqs:
        sym = tuple(w)
        words[sym] = words.get(sym, 0) + f
    pair_counts: Counter = Counter()
    index: Dict[Tuple[str, str], set] = {}
    for sym, f in words.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_counts[p] += f
            index.setdefault(p, set()).add(sym)
    merges: List[Tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        best_count = pair_counts[best]
        if best_count <= 0:
            break
        merges.append((best[0], best[1], best_count))
        # delta-update: only words containing the merged pair change
        for sym in list(index.get(best, ())):
            f = words.pop(sym, None)
            if f is None:
                continue
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = index.get(p)
                if s is not None:
                    s.discard(sym)
                    if not s:
                        del index[p]
            new = _segment(sym, best)
            # if `new` collides with an existing word its pairs are
            # already indexed with that word's count; either way the
            # delta this step contributes is exactly f per occurrence
            words[new] = words.get(new, 0) + f
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] += f
                index.setdefault(p, set()).add(new)
    return merges


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 60, top_k: int = 100_000) -> DataFrame:
    """Train BPE merges over the corpus; emit (rank, left, right, freq).

    Spark does the corpus-sized counting; the merge loop sees only the
    capped distinct-word table (driver state = K rows, invariant to
    corpus size)."""
    spark = df.sparkSession
    freqs = [(r["word"], r["freq"]) for r in word_counts(
        df, text_col=text_col, top_k=top_k).collect()]
    merges = _train_merges(freqs, n_merges)
    rows = [(i, a, b, c) for i, (a, b, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, freq bigint")
