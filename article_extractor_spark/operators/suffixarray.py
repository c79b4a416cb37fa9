"""Distributed suffix arrays and EXACT duplicated-substring detection.

``dedup.dup_spans`` (the Lee-et-al substring-dedup family in this
engine) is the cheap path: winnowed k-gram fingerprints select
candidate spans, verified by span-text equi-join.  This module is the
exact counterpart, built the way the dedup literature defines the
problem — suffix ordering — but Spark-first: **prefix doubling**
(Manber-Myers) expressed as O(log maxlen) rounds of one equi-join plus
one global dense-rank, instead of a monolithic in-memory suffix-array
build.

Public surface (all pytest-oracled against brute-force Python in
``tests/test_suffixarray.py``; NOT registered as driver queries — the
50-key verification window is saturated this round, see NOTES.md
round-5 close-out; registration is queued for a future round's
window, exactly like ``hashclf``):

* ``suffix_array(df)`` — the full suffix permutation over the corpus
  (every (doc, offset) suffix, lexicographic, ties on equal suffixes
  broken by (doc, offset)).
* ``duplicated_positions(df, L)`` — every position whose length-``L``
  window occurs >= 2 times ANYWHERE in the corpus (within-doc repeats
  included), with an exact equality-class id.  No hashing anywhere in
  the decision path, so no collision caveat — this is the ground truth
  that ``dup_spans`` approximates.
* ``exact_dup_spans(df, L)`` — those positions merged into maximal
  per-document character intervals (the shape ``dup_span_ranges``
  emits, but exact).
* ``longest_repeat(df)`` — the exact length + one occurrence class of
  the longest substring occurring >= 2 times in the corpus.

Exactness mechanics
-------------------

rank_k(i) is a dense id of suffix i's prefix of length min(2^k, len-i).
Doubling: two prefixes of length 2^(k+1) are equal iff their
(rank_k(i), rank_k(i + 2^k)) pairs are equal, with -1 standing for
"suffix ends before i + 2^k" (equal-rank suffixes that both end inside
the window are equal strings, so sharing -1 is correct).  The
non-power-of-two query uses the overlapping-windows identity:
T-prefixes are equal iff the rank_a pairs at offsets (i, i + T - 2^a)
are equal, for any 2^a in [T/2, T] — so a duplicated-window test at ANY
length is one join + one rank pass over the stored level tables.

Duplicate-detection mode prunes aggressively: a position whose current
prefix is corpus-unique can never become duplicated at a longer length,
so each round keeps only positions whose pair-key class has size >= 2.
A pruned position can still be *looked up* as the tail of a longer
window; the lookup miss then gets a sentinel unique to the missing
position, which makes the pair key unique exactly when the true answer
is "unique" (if the tail's 2^a-prefix occurs once in the corpus, any
window containing it as a suffix occurs at most once).  This prune is
what makes the exact path usable at scale — after a few rounds the
working set shrinks to the actual duplicate mass, not the corpus.

100 TB shape
------------

The positions table is one row per corpus character — the honest cost
of exactness (Lee et al. pay the same O(n) suffix-array memory on one
fat node).  Every round is (a) one equi-join on (doc, offset) —
both sides hash-partitioned on the same key, one shuffle — and (b) one
global dense rank, implemented as repartitionByRange +
sortWithinPartitions + per-partition offsets (a driver-side prefix sum
over num_partitions counts — never a global single-partition Window).
Rounds are localCheckpointed so lineage stays flat (the dedup_clusters
pattern).  In dup mode the per-round prune drops corpus-unique
prefixes, so steady-state volume tracks duplicate mass; the intended
100 TB use is exact adjudication at a target span length L (log2(L)
rounds, survivors only), with the full corpus scanned exactly once at
round 0.

Reference semantics: Lee et al., "Deduplicating Training Data Makes
Language Models Better" (suffix-array substring dedup); Manber & Myers
1990 (prefix doubling).  No reference-repo analogue (the reference is
an HTML extractor); this extends the engine's LLM-pipeline surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sentinel for "suffix ends before the lookup offset" — shared across
# positions on purpose: equal-rank suffixes that BOTH end inside the
# window are equal strings, so they must stay in one equality class
PAST_END = -1


def _num_parts(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                        "32"))


def _global_dense_rank(keys: DataFrame, cols: list,
                       out_col: str = "new_rank") -> DataFrame:
    """Assign 0-based dense ranks to a DISTINCT key table, ordered by
    ``cols`` ascending, without a global Window.

    Two narrow jobs over one materialized layout: repartitionByRange +
    sortWithinPartitions fixes a range-disjoint sorted placement
    (localCheckpoint pins it — RangePartitioner samples, so the layout
    must be computed once and reused, not re-executed per job); pass 1
    counts rows per partition (num_partitions rows to the driver); pass
    2 adds offset[pid] + local row index inside mapInPandas, carrying a
    running counter across that partition's Arrow batches.

    Returns (ranked_df, n_keys) — the total falls out of the pass-1
    counts for free, saving the callers one count() job per doubling
    round (the fixture-scale cost is per-round job latency, measured
    in BENCH/BASELINE.md).
    """
    spark = keys.sparkSession
    placed = (keys.repartitionByRange(_num_parts(keys), *cols)
                  .sortWithinPartitions(*cols)
                  .withColumn("_pid", F.spark_partition_id())
                  .localCheckpoint(eager=True))
    counts = {r["_pid"]: r["cnt"] for r in
              placed.groupBy("_pid").agg(
                  F.count(F.lit(1)).alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in placed.schema.fields
                       if f.name != "_pid") + f", {out_col} bigint"

    def assign(batches):
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = boff.value[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"])
            out[out_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield out

    return placed.mapInPandas(assign, schema=schema), acc


def _did_map(df: DataFrame, id_col: str) -> DataFrame:
    """Dense long doc ids for arbitrary id values: (_orig, did)."""
    docs = df.select(F.col(id_col).alias("_orig")).distinct()
    return _global_dense_rank(docs, ["_orig"], out_col="did")[0]


def corpus_positions(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """One row per corpus character: (did, off, dlen, rank) where
    ``did`` is a dense long doc id, ``dlen`` the doc's char length, and
    ``rank`` the dense rank of the single character at 0-based ``off``
    (round-0 state: window length 1).

    Characters are ranked by Spark string order (binary UTF-8, which
    equals codepoint order — the order Python's oracle sorts by), via
    the same _global_dense_rank used for every later round, so no
    reliance on ascii()/codepoint builtins.
    """
    docs = df.select(F.col(id_col).alias("_orig"),
                     F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    docs = docs.join(_did_map(df, id_col), "_orig").select(
        "did", "_t", F.length("_t").alias("dlen"))
    # guard: sequence(1, 0) is DESCENDING in Spark, so empty docs must
    # short-circuit to array() instead of producing phantom positions
    pos = docs.select(
        "did", "dlen",
        F.posexplode(F.expr(
            "case when char_length(_t) = 0 then array() "
            "else transform(sequence(1, char_length(_t)), "
            "i -> substring(_t, i, 1)) end")).alias("off", "_ch"))
    chars, _ = _global_dense_rank(pos.select("_ch").distinct(),
                                  ["_ch"], out_col="rank")
    return (pos.join(chars, "_ch")
               .select("did", "off", "dlen",
                       F.col("rank").cast("bigint").alias("rank")))


def _pair_keys(ranks: DataFrame, h: int, off_cap: int) -> DataFrame:
    """(did, off, dlen, r1, r2): r1 = current rank, r2 = rank at
    off + h from the same table, PAST_END beyond the doc end, or a
    per-position-unique negative sentinel when the lookup row is absent
    (pruned as corpus-unique in dup mode)."""
    right = ranks.select(
        "did", (F.col("off") - F.lit(h)).alias("off"),
        F.col("rank").alias("_r2"))
    j = ranks.join(right, ["did", "off"], "left")
    sentinel = -(F.col("did") * F.lit(off_cap) + F.col("off")
                 + F.lit(h)) - F.lit(2)
    r2 = (F.when(F.col("off") + F.lit(h) >= F.col("dlen"),
                 F.lit(PAST_END).cast("bigint"))
           .otherwise(F.coalesce(F.col("_r2"), sentinel)))
    return j.select("did", "off", "dlen",
                    F.col("rank").alias("r1"), r2.alias("r2"))


def _rerank(pairs: DataFrame) -> tuple:
    """Dense-rank the (r1, r2) pair keys; return (ranks_df, n_keys).
    ranks_df carries the equality-class size as ``_csize`` so callers
    can prune or test convergence without another pass."""
    keyed, n_keys = _global_dense_rank(
        pairs.groupBy("r1", "r2").agg(
            F.count(F.lit(1)).alias("_csize")),
        ["r1", "r2"])
    out = (pairs.join(keyed, ["r1", "r2"])
                .select("did", "off", "dlen",
                        F.col("new_rank").alias("rank"), "_csize")
                .localCheckpoint(eager=True))
    return out, n_keys


def _overflow_guard(pos: DataFrame) -> tuple:
    """(off_cap, maxlen): off_cap sizes the unique negative sentinel
    (did * off_cap + off must fit a long with headroom)."""
    row = pos.agg(F.max("did").alias("d"), F.max("dlen").alias("m")) \
             .collect()[0]
    max_did, maxlen = int(row["d"] or 0), int(row["m"] or 0)
    off_cap = maxlen + 2
    if (max_did + 1) * off_cap >= (1 << 62):
        raise ValueError("corpus too large for the position sentinel "
                         "encoding (did * off_cap overflows a long)")
    return off_cap, maxlen


def suffix_levels(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", target_len: int | None = None,
                  prune: bool = False) -> tuple:
    """Prefix doubling; returns (levels, off_cap, maxlen) where
    levels[k] is the rank table at window 2^k — columns (did, off,
    dlen, rank, _csize), _csize the equality-class size at that window.

    ``prune=True`` (duplicate-detection mode) keeps only positions
    whose class has >= 2 members after each round; a level-table miss
    then means "corpus-unique prefix" and is resolved by _pair_keys'
    unique sentinel.  ``target_len`` stops doubling once the deepest
    level needed to answer a length-``target_len`` window query exists
    (window 2^floor(log2 target_len)); None runs to exhaustion
    (total order in full mode, empty survivors or maxlen in dup mode).
    """
    pos = corpus_positions(df, text_col, id_col)
    off_cap, maxlen = _overflow_guard(pos)
    n_pos = pos.count()  # constant in full mode — computed ONCE
    level0, n_keys = _rerank(pos.select(
        "did", "off", "dlen", F.col("rank").alias("r1"),
        F.lit(0).cast("bigint").alias("r2")))
    levels = [level0]
    h = 1
    while h < maxlen:
        if prune and target_len is not None and 2 * h > target_len:
            break
        cur = levels[-1]
        if prune:
            cur = cur.where(F.col("_csize") >= 2)
            if cur.limit(1).count() == 0:
                break
        elif n_keys == n_pos:
            break  # every class a singleton: the order is total
        nxt, n_keys = _rerank(_pair_keys(cur, h, off_cap))
        if prune:
            nxt = (nxt.where(F.col("_csize") >= 2)
                      .localCheckpoint(eager=True))
        levels.append(nxt)
        h *= 2
    return levels, off_cap, maxlen


def suffix_array(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """The corpus suffix permutation: one row per (doc_id, off) suffix
    with ``sa`` its 0-based position in the lexicographic order of ALL
    suffixes; equal suffixes (possible across docs) tie-break by
    (doc_id's dense rank, off).  Exact — oracled against Python
    sorted() in tests."""
    levels, _, _ = suffix_levels(df, text_col, id_col)
    final = levels[-1]
    sa, _ = _global_dense_rank(
        final.select(F.col("rank").alias("r"), "did", "off"),
        ["r", "did", "off"], out_col="sa")
    orig = _did_map(df, id_col)
    return (sa.join(orig, "did")
              .select(F.col("_orig").alias(id_col), "off",
                      F.col("sa").cast("bigint").alias("sa")))


def _dups_at_length(levels: list, T: int, off_cap: int) -> DataFrame:
    """Positions whose length-T window occurs >= 2 times: pair-key test
    at level a = floor(log2 T) over offsets (i, i + T - 2^a).  Emits
    (did, off, grp), grp a dense id of the T-prefix equality class.

    Only positions with a FULL T-window (off + T <= dlen) qualify —
    span semantics (dup_spans / Lee et al.) count windows, not ragged
    suffix tails.  If doubling ended (pruned empty / maxlen) before
    level a, no window of length >= 2^a repeats, so the answer is
    exactly empty.
    """
    a = max(0, int(math.floor(math.log2(T))))
    if a >= len(levels):
        return levels[0].select(
            "did", "off",
            F.lit(0).cast("bigint").alias("grp")).where(F.lit(False))
    lvl = levels[a]
    h = T - (1 << a)  # 0 <= h <= 2^a
    pairs = _pair_keys(lvl, h, off_cap) \
        .where(F.col("off") + F.lit(T) <= F.col("dlen"))
    keyed, _ = _global_dense_rank(
        pairs.groupBy("r1", "r2").agg(F.count(F.lit(1)).alias("_c")),
        ["r1", "r2"], out_col="grp")
    return (pairs.join(keyed.where(F.col("_c") >= 2), ["r1", "r2"])
                 .select("did", "off", "grp"))


def duplicated_positions(df: DataFrame, L: int, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Every (doc_id, off) whose [off, off+L) window occurs >= 2 times
    in the corpus (within-doc repeats included), with the exact
    equality-class id ``grp``."""
    if L < 1:
        raise ValueError("L must be >= 1")
    levels, off_cap, _ = suffix_levels(
        df, text_col, id_col, target_len=L, prune=True)
    dups = _dups_at_length(levels, L, off_cap)
    return (dups.join(_did_map(df, id_col), "did")
                .select(F.col("_orig").alias(id_col), "off", "grp"))


def exact_dup_spans(df: DataFrame, L: int, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Maximal per-document character intervals covered by duplicated
    length-L windows — the exact analogue of ``dup_span_ranges``.
    Returns (doc_id, span_start, span_end) half-open; two windows merge
    when their covered intervals overlap or touch.  The island walk is
    a per-document Window (partitioned on the doc key — never global).
    """
    from pyspark.sql import Window

    dup = duplicated_positions(df, L, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy("off")
    prev = F.lag("off").over(w)
    island = F.sum(
        F.when(prev.isNull() | (F.col("off") > prev + F.lit(L)),
               F.lit(1)).otherwise(F.lit(0))).over(w)
    return (dup.withColumn("_isl", island)
               .groupBy(id_col, "_isl")
               .agg(F.min("off").alias("span_start"),
                    (F.max("off") + F.lit(L)).alias("span_end"))
               .drop("_isl"))


def remove_exact_dup_spans(df: DataFrame, L: int,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Lee-et-al substring REMOVAL on the exact spans: for every
    length-L equality class, the first occurrence (lowest (doc-rank,
    offset)) survives; every other occurrence's window is deleted from
    its document, overlapping deletions merged.  (A survivor's chars
    can still fall to ANOTHER class's deletion overlapping them — the
    per-class guarantee is that at least its surviving position is not
    deleted on its own account.)  Returns (doc_id, cleaned_text,
    n_removed_chars) for EVERY input document (clean docs pass
    through).

    The winnowed counterpart is ``dedup.remove_dup_spans``; this is
    the collision-free version over ``duplicated_positions``.  Shapes:
    one min-per-class aggregation, one per-doc Window for interval
    merge, one Arrow batch for the final gap stitch (string surgery is
    not expressible as a fixed Catalyst expression over variable-count
    ranges)."""
    from pyspark.sql import Window

    if L < 1:
        raise ValueError("L must be >= 1")
    levels, off_cap, _ = suffix_levels(
        df, text_col, id_col, target_len=L, prune=True)
    dups = _dups_at_length(levels, L, off_cap)
    # survivor per class: lowest (did, off) — did is the dense doc
    # rank, so this is deterministic for any id type
    first = dups.groupBy("grp").agg(
        F.min(F.struct("did", "off")).alias("_keep"))
    losers = (dups.join(first, "grp")
                  .where((F.col("did") != F.col("_keep.did"))
                         | (F.col("off") != F.col("_keep.off")))
                  .select("did", "off"))
    # merge per-doc intervals (overlap-or-touch), then stitch gaps
    w = Window.partitionBy("did").orderBy("off")
    prev = F.lag("off").over(w)
    island = F.sum(
        F.when(prev.isNull() | (F.col("off") > prev + F.lit(L)),
               F.lit(1)).otherwise(F.lit(0))).over(w)
    ranges = (losers.withColumn("_isl", island)
                    .groupBy("did", "_isl")
                    .agg(F.min("off").alias("s"),
                         (F.max("off") + F.lit(L)).alias("e"))
                    .groupBy("did")
                    .agg(F.sort_array(F.collect_list(
                        F.struct("s", "e"))).alias("_ranges")))
    dids = _did_map(df, id_col)
    docs = (df.select(F.col(id_col).alias("_orig"),
                      F.coalesce(F.col(text_col), F.lit(""))
                       .alias("_t"))
              .join(dids, "_orig")
              .join(ranges, "did", "left"))

    import pandas as pd

    def stitch(batches):
        for pdf in batches:
            ids, outs, removed = [], [], []
            for orig, t, rs in zip(pdf["_orig"], pdf["_t"],
                                   pdf["_ranges"]):
                if rs is None or len(rs) == 0:
                    ids.append(orig)
                    outs.append(t)
                    removed.append(0)
                    continue
                kept = []
                pos = 0
                cut = 0
                for r in rs:
                    s, e = int(r["s"]), int(r["e"])
                    kept.append(t[pos:s])
                    cut += min(e, len(t)) - s
                    pos = e
                kept.append(t[pos:])
                ids.append(orig)
                outs.append("".join(kept))
                removed.append(cut)
            yield pd.DataFrame({
                "_orig": ids,
                "cleaned_text": pd.Series(outs, dtype="object"),
                "n_removed_chars": pd.Series(removed, dtype="int64")})

    id_type = dict(df.dtypes)[id_col]
    return (docs.select("_orig", "_t", "_ranges")
                .mapInPandas(stitch,
                             f"_orig {id_type}, cleaned_text string, "
                             f"n_removed_chars bigint")
                .withColumnRenamed("_orig", id_col))


def longest_repeat(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> dict:
    """Exact length of the longest substring occurring >= 2 times in
    the corpus, plus one equality class of occurrences.  Returns
    ``{"length": int, "occurrences": [(doc_id, off), ...]}`` — the
    occurrences of the first (lowest grp id) maximal class; length 0
    and no occurrences when nothing repeats.

    ``has_dup(T)`` is monotone (a repeated length-T window contains
    repeated shorter windows), so the exact answer is a binary search
    over [1, maxlen] — O(log maxlen) tests, each one join + one rank
    pass against the stored level tables.
    """
    levels, off_cap, maxlen = suffix_levels(
        df, text_col, id_col, prune=True)
    if maxlen == 0:
        return {"length": 0, "occurrences": []}

    def has_dup(T: int) -> bool:
        return _dups_at_length(levels, T, off_cap).limit(1).count() > 0

    if not has_dup(1):
        return {"length": 0, "occurrences": []}
    lo, hi = 1, maxlen
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if has_dup(mid):
            lo = mid
        else:
            hi = mid - 1
    best = _dups_at_length(levels, lo, off_cap).localCheckpoint(True)
    one = best.orderBy("grp", "did", "off").limit(1).collect()[0]["grp"]
    # decode doc ids for the ONE winning class only (a handful of
    # rows) — never collect the full doc-id map
    occ = (best.where(F.col("grp") == one)
               .join(_did_map(df, id_col), "did")
               .orderBy("did", "off").collect())
    return {"length": int(lo),
            "occurrences": [(r["_orig"], int(r["off"])) for r in occ]}
