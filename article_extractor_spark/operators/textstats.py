"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.  Pure JVM-side expressions (whole-stage codegen;
no Python in the hot path), each with a DuckDB-replicable formulation."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword lists per language (heuristic lang-id)
LANG_WORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "von", "mit", "den", "für", "ist", "im"],
    "fr": ["le", "la", "les", "de", "des", "et", "en", "un", "une", "que"],
}


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """n-gram/stopword-ratio language ID: score(lang) = hits/|tokens|;
    argmax with lexicographic tie-break.  One projection, zero shuffles.

    NULL text is treated as '' (mirrored in the DuckDB oracle) — without
    the coalesce, size(split(NULL)) = -1 leaks a -1.0 score and a bogus
    first-language prediction."""
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    cols = [F.col(id_col)]
    for lang, words in LANG_WORDS.items():
        arr = ", ".join(f"'{w}'" for w in words)
        hits = F.expr(
            f"size(filter(split(lower({text_col}), '\\\\s+'), "
            f"t -> array_contains(array({arr}), t)))"
        )
        cols.append(
            F.round(hits / F.greatest(F.size(toks), F.lit(1)), 6).alias(f"score_{lang}")
        )
    scored = df.select(*cols)
    # argmax with deterministic tie-break: first language (declaration
    # order) reaching the max wins
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_WORDS])
    expr = None
    for lang in LANG_WORDS:
        branch = F.when(F.col(f"score_{lang}") == best, F.lit(lang))
        expr = branch if expr is None else expr.when(
            F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        id_col, *[f"score_{lang}" for lang in LANG_WORDS],
        expr.alias("pred_lang"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features + a composite score:
    length, punctuation ratio, stopword ratio, mean word length.
    NULL text is treated as '' (mirrored in the oracle)."""
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    n_chars = F.length(F.col(text_col))
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    n_words = F.size(toks)
    arr = ", ".join(f"'{w}'" for w in LANG_WORDS["en"])
    stop_hits = F.expr(
        f"size(filter(split(lower({text_col}), '\\\\s+'), "
        f"t -> array_contains(array({arr}), t)))"
    )
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    mean_word_len = F.round(
        (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1)), 6)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6)
    score = F.round(
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.4
        + F.when((punct_ratio > 0.001) & (punct_ratio < 0.2), 0.2).otherwise(0.0),
        6,
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality"),
    )


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace word count + BPE-ish subtoken count (letter runs, digit
    runs, single punctuation = one token each).
    NULL text is treated as '' (mirrored in the oracle)."""
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    words = F.size(F.split(F.col(text_col), r"\s+"))
    subtokens = F.size(
        F.expr(rf"regexp_extract_all({text_col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)")
    )
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        subtokens.alias("n_subtokens"),
        F.round(subtokens / F.greatest(words, F.lit(1)), 6).alias("subtokens_per_word"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                window: int = 8, prefix: int = 256) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-style min over character
    k-gram hashes of the first `prefix` chars) + distinct gram count.
    JVM-side: sequence+transform generates the gram array, no explode.
    NULL text is treated as '' (mirrored in the oracle)."""
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    grams = F.expr(
        f"transform(sequence(1, greatest(least(length({text_col}), {prefix}) - {window - 1}, 1)), "
        f"i -> substr({text_col}, i, {window}))"
    )
    return df.select(
        F.col(id_col),
        F.array_min(F.transform(grams, _gram_hash)).alias("fingerprint"),
        F.size(F.array_distinct(grams)).alias("n_distinct_grams"),
    )


def _gram_hash(g):
    return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint")


# ranges as LITERAL characters: Java regex accepts \\uXXXX but DuckDB's
# RE2 does not, and literal chars work identically in both
SCRIPT_RANGES = {
    "latin": "A-Za-z",
    "cjk": (f"{chr(0x4E00)}-{chr(0x9FFF)}{chr(0x3040)}-{chr(0x30FF)}"
            f"{chr(0xAC00)}-{chr(0xD7AF)}"),
    "cyrillic": f"{chr(0x0400)}-{chr(0x04FF)}",
    "arabic": f"{chr(0x0600)}-{chr(0x06FF)}",
}


def script_detect(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Unicode-script detection: per-script character ratios and an argmax
    prediction — the complement of stopword language-ID for scripts where
    word lists do not apply (CJK has no whitespace-delimited stopwords).
    Zero shuffle; ratios are round(count/chars, 6) with a deterministic
    declaration-order tie-break."""
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    cols = [F.col(id_col)]
    for name, rng in SCRIPT_RANGES.items():
        cnt = F.length(
            F.regexp_replace(F.col(text_col), f"[^{rng}]", ""))
        cols.append(F.round(cnt / n_chars, 6).alias(f"ratio_{name}"))
    scored = df.select(*cols)
    best = F.greatest(*[F.col(f"ratio_{s}") for s in SCRIPT_RANGES])
    pred = None
    for s in SCRIPT_RANGES:
        branch = (F.when(F.col(f"ratio_{s}") == best, F.lit(s)) if pred is None
                  else pred.when(F.col(f"ratio_{s}") == best, F.lit(s)))
        pred = branch
    return scored.select(
        id_col, *[f"ratio_{s}" for s in SCRIPT_RANGES],
        F.when(best <= 0.0, F.lit("unknown")).otherwise(pred)
        .alias("pred_script"),
    )


# conservative, SQL-portable PII patterns (anchored to token-ish contexts)
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact emails / IPv4s / phone-like digit runs with typed
    placeholders and count the redactions per document — the standard
    pre-training scrub pass.  Pure JVM projection (chained
    regexp_replace + regexp_count), zero shuffle, order of patterns is
    fixed (email before phone so an address's digits never half-match)."""
    clean = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, pat, repl in PII_PATTERNS:
        sql_pat = pat.replace("\\", "\\\\")  # SQL-literal escaping for expr
        counts.append(
            F.expr(
                f"size(regexp_extract_all(coalesce({text_col}, ''), '{sql_pat}', 0))"
            ).alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(F.col(id_col), *counts, clean.alias("clean_text"))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      default_rate: float = 0.0, seed: str = "mix1") -> DataFrame:
    """Deterministic hash-threshold sampling per stratum — the data-mixing
    primitive (e.g. keep 100% of low-resource languages, 10% of English).

    keep <=> hash60(seed:id) < rate * 2^60.  A pure per-row projection:
    zero shuffle, zero state, reproducible across runs/retries/cluster
    sizes (no rand()), and composable — re-running with a higher rate
    yields a superset (threshold property), which makes incremental
    corpus growth append-only."""
    h = F.expr(
        f"cast(conv(substr(md5(concat('{seed}', ':', {id_col})), 1, 15), 16, 10) as bigint)"
    )
    rate = None
    for k, v in rates.items():
        branch = F.when(F.col(strata_col) == k, F.lit(float(v)))
        rate = branch if rate is None else rate.when(
            F.col(strata_col) == k, F.lit(float(v)))
    rate = rate.otherwise(F.lit(float(default_rate))) if rate is not None \
        else F.lit(float(default_rate))
    return (
        df.withColumn("_h60", h)
        .where(F.col("_h60") < (rate * F.lit(float(1 << 60))))
        .drop("_h60")
    )


def gopher_repetition(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): per-doc
    duplicate-line fractions and the most-frequent-word-bigram share —
    the standard "remove self-repetitive pages" signals of a training-data
    pipeline.

    Definitions (documented, mirrored exactly in the oracle):
      frac_dup_lines       = 1 - n_distinct_lines / n_lines
      frac_chars_dup_lines = chars in lines occurring > 1x / total line chars
      top_bigram_frac      = count of most frequent word 2-gram / n_bigrams
    Lines are trimmed and non-empty; bigrams come from lowercase
    whitespace tokens.

    Scale shape: per-line and per-bigram counts go through explode +
    groupBy keyed on (doc, value) then (doc) — map-side combine, never an
    in-row O(len^2) self-scan (a 10k-line page would cost 10^8 compares
    per row) and never a corpus-wide key (no giant hot keys).  Docs with
    no lines/bigrams survive via left joins + coalesce."""
    base = df.select(F.col(id_col),
                     F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    lines = base.select(
        id_col,
        F.explode(F.expr("filter(transform(split(_t, '\\n'), l -> trim(l)), "
                         "l -> l <> '')")).alias("line"),
    )
    line_groups = lines.groupBy(id_col, "line").agg(F.count(F.lit(1)).alias("c"))
    line_stats = line_groups.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_lines"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_lines"),
        F.sum(F.col("c") * F.length("line")).cast("bigint").alias("line_chars"),
        F.sum(F.when(F.col("c") > 1, F.col("c") * F.length("line"))
              .otherwise(0)).cast("bigint").alias("dup_line_chars"),
    )
    # CASE guard: sequence(1, 0) is DESCENDING [1, 0] (the chunk_containment
    # footgun) — docs with < 2 tokens must yield NO bigrams, not NULL ones
    toks_expr = "filter(split(lower(_t), '\\\\s+'), t -> t <> '')"
    bigrams = base.select(
        id_col,
        F.explode(F.expr(
            f"CASE WHEN size({toks_expr}) >= 2 THEN "
            f"transform(sequence(1, size({toks_expr}) - 1), "
            f"i -> element_at({toks_expr}, i) || ' ' || "
            f"element_at({toks_expr}, i + 1)) ELSE array() END")).alias("bigram"),
    )
    bigram_groups = bigrams.groupBy(id_col, "bigram").agg(
        F.count(F.lit(1)).alias("c"))
    bigram_stats = bigram_groups.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.max("c").cast("bigint").alias("top_bigram_count"),
    )
    return (
        base.select(id_col)
        .join(line_stats, id_col, "left")
        .join(bigram_stats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.round(F.lit(1.0) - F.coalesce(F.col("n_distinct_lines")
                    / F.col("n_lines"), F.lit(0.0)), 6).alias("frac_dup_lines"),
            F.round(F.coalesce(F.col("dup_line_chars")
                    / F.greatest(F.col("line_chars"), F.lit(1)), F.lit(0.0)), 6)
            .alias("frac_chars_dup_lines"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(F.coalesce(F.col("top_bigram_count") / F.col("n_bigrams"),
                    F.lit(0.0)), 6).alias("top_bigram_frac"),
        )
    )


def c4_filters(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               min_words_per_line: int = 3, min_kept_lines: int = 1,
               min_doc_words: int = 10) -> DataFrame:
    """C4-style cleanliness filters (Raffel et al. 2020 §2.2) as one
    zero-shuffle projection: per-doc line keep counts and the document
    keep decision.

    A line is KEPT when it ends in terminal punctuation (. ! ? ") and has
    at least ``min_words_per_line`` words.  A document is kept when it has
    >= ``min_kept_lines`` kept lines, >= ``min_doc_words`` words, and
    contains neither 'lorem ipsum' nor a curly brace (code page signal).
    All expressions are per-row JVM (whole-stage codegen) — the filter
    costs one scan at any corpus size."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(F.col(id_col), t.alias("_t"))
    lines_expr = ("filter(transform(split(_t, '\\n'), l -> trim(l)), "
                  "l -> l <> '')")
    kept_expr = (f"size(filter({lines_expr}, l -> "
                 f"l rlike '[.!?\"]$' and "
                 f"size(filter(split(l, '\\\\s+'), w -> w <> '')) >= "
                 f"{min_words_per_line}))")
    n_lines = F.expr(f"size({lines_expr})")
    n_kept = F.expr(kept_expr)
    n_words = F.expr("size(filter(split(lower(_t), '\\\\s+'), w -> w <> ''))")
    has_lorem = F.lower(F.col("_t")).contains("lorem ipsum")
    has_brace = F.col("_t").contains("{")
    keep = ((n_kept >= min_kept_lines) & (n_words >= min_doc_words)
            & ~has_lorem & ~has_brace)
    return base.select(
        F.col(id_col),
        n_lines.cast("int").alias("n_lines"),
        n_kept.cast("int").alias("n_kept_lines"),
        n_words.cast("int").alias("n_words"),
        has_lorem.cast("int").alias("has_lorem"),
        has_brace.cast("int").alias("has_brace"),
        keep.cast("int").alias("keep"),
    )


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """CCNet-style language-model quality proxy: per-document mean
    negative log2 probability of its tokens under the CORPUS unigram
    model (higher = more surprising = more likely junk).  The standard
    perplexity-filter shape with the LM reduced to unigrams (no external
    model files; self-scored on the corpus).

    Scale shape: one token-keyed groupBy builds the vocab (map-side
    combine), one token-keyed join scores instances (AQE may broadcast a
    small vocab), one doc-keyed aggregate.  Exactness: each instance's
    -log2 p is quantized to 1e-6 BEFORE summation (NOTES.md oracle
    policy), so per-doc means are bit-identical regardless of partition
    order."""
    base = df.select(F.col(id_col),
                     F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    toks = base.select(
        id_col,
        F.explode(F.expr("filter(split(lower(_t), '\\\\s+'), t -> t <> '')"))
        .alias("token"),
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("bigint").alias("n")).collect()[0]["n"]
    total = int(total or 1)
    scored = toks.join(vocab, "token").select(
        id_col,
        F.round((F.log2(F.lit(float(total))) - F.log2(F.col("cnt")))
                * F.lit(1e6)).cast("bigint").alias("q"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("q").cast("bigint").alias("sq"),
    )
    return (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            # NOT rounded: successive IEEE divisions of exact operands
            # are bit-identical across engines; round(,6) diverges on
            # exact-half quotients (Spark half-up vs DuckDB half-even)
            F.coalesce(F.col("sq").cast("double") / F.lit(1e6)
                       / F.col("n_tokens"), F.lit(0.0))
            .alias("avg_neg_log2p"),
        )
    )


def tfidf_keywords(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Top-k characteristic tokens per document by tf x idf
    (idf = ln(N / df), quantized to 1e-6 like every float in the oracle
    contract; ties broken by token asc).  The lightweight keyword/topic
    signal a curation dashboard slices on.

    Scale shape: (doc, token) tf counts and token df counts are groupBys
    with map-side combine; the ranking window partitions by doc — no
    corpus-wide window, no driver collect except the corpus doc count."""
    from pyspark.sql import Window

    base = df.select(F.col(id_col),
                     F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    n_docs = base.count()
    toks = base.select(
        id_col,
        F.explode(F.expr("filter(split(lower(_t), '\\\\s+'), t -> t <> '')"))
        .alias("token"),
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "token").select(
        id_col, "token",
        (F.col("tf") * F.round(F.log(F.lit(float(n_docs)) / F.col("df"))
                               * F.lit(1e6)).cast("bigint")).alias("q"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("q").desc(),
                                           F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "token",
                F.round(F.col("q").cast("double") / F.lit(1e6), 6)
                .alias("tfidf"),
                F.col("rank").cast("int").alias("rank"))
    )


# Hashed-linear classifier weights: D buckets, integer weights in
# [-50, 50], derived from a fixed affine sequence so the DuckDB oracle
# can inline the identical literal list.  Stands in for a fastText-style
# quality classifier exported to per-bucket weights; swap CLF_WEIGHTS for
# a trained export without touching the plan.
CLF_DIM = 64
CLF_WEIGHTS = [((j * 37 + 11) % 101) - 50 for j in range(CLF_DIM)]


def classifier_score(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Linear classifier inference over hashed bag-of-words features —
    the model-based quality-filter shape (fastText/logistic quality
    classifiers in C4/CCNet/Llama pipelines) reduced to its distributed
    essentials: token -> hash bucket -> literal weight, summed per doc.

    Entirely in-row (tokenize, transform, aggregate) — ZERO shuffles;
    the weight table is a literal array baked into the plan, the exact
    shape a broadcast-exported real model would take.  Integer weight
    sums are exact, so score = sum / (100 * n_tokens) is a single
    division of exact operands (NOTES.md oracle float policy).

    Emits (doc_id, n_tokens, clf_score, keep): keep = score > 0."""
    w_lit = ", ".join(str(w) for w in CLF_WEIGHTS)
    base = df.select(F.col(id_col),
                     F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    toks = F.expr("filter(split(lower(_t), '\\\\s+'), t -> t <> '')")
    scored = base.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.expr(
            f"aggregate(filter(split(lower(_t), '\\\\s+'), t -> t <> ''), "
            f"0L, (acc, t) -> acc + element_at(array({w_lit}), "
            f"cast(cast(conv(substr(md5(t), 1, 6), 16, 10) as int) "
            f"% {CLF_DIM} + 1 as int)))"
        ).cast("bigint").alias("_sq"),
    )
    # NOT rounded: a single IEEE division of exact integer operands is
    # bit-identical across engines, while round(,6) diverges when the
    # quotient lands exactly on a half (e.g. -603/9600 = -0.0628125:
    # Spark half-up vs DuckDB half-even — hit at sf0.1)
    score = F.when(
        F.col("n_tokens") > 0,
        F.col("_sq").cast("double") / (F.lit(100.0) * F.col("n_tokens"))
    ).otherwise(F.lit(0.0))
    return scored.select(
        F.col(id_col), F.col("n_tokens"),
        score.alias("clf_score"),
        (score > F.lit(0.0)).cast("int").alias("keep"),
    )


def mixture_weights(df: DataFrame, group_col: str = "source",
                    id_col: str = "doc_id",
                    budget: int = 100_000) -> DataFrame:
    """Data-mixing planner: per-domain sampling weights with temperature
    tau = 0.5 (w_i = n_i^tau / sum_j n_j^tau) and the per-domain planned
    doc count for a total sample budget.  The standard multi-source
    mixing step (GPT-3 / Llama data recipes) ahead of
    ``stratified_sample``, which then applies the realized rates.

    Exactness: sqrt is IEEE-correctly-rounded in both the JVM and
    DuckDB, each sqrt is quantized to 1e-6 BEFORE the cross-domain sum
    (NOTES.md policy), so weights and integer planned counts are
    bit-identical regardless of aggregation order.  Scale: one groupBy
    on the domain key; the all-rows total window runs over |domains|
    rows (thousands at worst), not |docs| — a deliberate single-
    partition exchange of a driver-sized table."""
    from pyspark.sql import Window

    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    per = per.withColumn(
        "_s",
        F.round(F.sqrt(F.col("n_docs").cast("double")) * F.lit(1e6))
        .cast("bigint"))
    tot = F.sum("_s").over(Window.partitionBy())
    return (
        per.withColumn("_tot", tot)
        .select(
            F.col(group_col),
            F.col("n_docs"),
            F.round(F.col("_s").cast("double") / F.col("_tot"), 6)
            .alias("mix_weight"),
            F.expr(f"CAST(({budget} * _s) DIV _tot AS BIGINT)")
            .alias("planned_docs"),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Gopher-style quality rules (Rae et al. 2021 §A1.1) — the
    non-repetition half, completing the pair with
    :func:`gopher_repetition`:

      * 50 <= word count <= 100,000
      * 3 <= mean word length <= 10
      * (hash + ellipsis occurrences) / words <= 0.1
      * bullet-starting lines <= 90%, ellipsis-ending lines <= 30%
      * words containing an alphabetic char >= 80%
      * >= 2 of the 8 Gopher stop words present

    One zero-shuffle projection.  Every keep threshold is evaluated as
    an exact INTEGER cross-multiplication (e.g. mean_word_len >= 3 as
    sum_len >= 3*n_words), so the decision never touches a float; the
    emitted ratio columns are single exact divisions rounded to 1e-6
    (NOTES.md oracle policy)."""
    stop_lit = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    base = df.select(F.col(id_col),
                     F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    feats = base.select(
        F.col(id_col),
        F.expr("filter(split(lower(_t), '\\\\s+'), t -> t <> '')")
        .alias("_toks"),
        F.expr("filter(transform(split(_t, '\\n'), l -> trim(l)), "
               "l -> l <> '')").alias("_lines"),
        (F.length("_t") - F.length(F.replace(F.col("_t"), F.lit("#"))))
        .cast("bigint").alias("_nhash"),
        ((F.length("_t")
          - F.length(F.replace(F.col("_t"), F.lit("...")))) / F.lit(3))
        .cast("bigint").alias("_nell"),
    )
    calc = feats.select(
        F.col(id_col),
        F.size("_toks").cast("bigint").alias("n_words"),
        F.expr("aggregate(_toks, 0L, (a, t) -> a + length(t))")
        .cast("bigint").alias("_sumlen"),
        F.expr("size(filter(_toks, t -> t rlike '[a-z]'))")
        .cast("bigint").alias("_nalpha"),
        F.expr(f"size(filter(_toks, t -> t IN ({stop_lit})))")
        .cast("bigint").alias("n_stopwords"),
        F.size("_lines").cast("bigint").alias("n_lines"),
        F.expr("size(filter(_lines, l -> l rlike '^[-*•]'))")
        .cast("bigint").alias("_nbullet"),
        F.expr("size(filter(_lines, l -> l rlike '\\\\.\\\\.\\\\.$'))")
        .cast("bigint").alias("_nelline"),
        F.col("_nhash"), F.col("_nell"),
    )

    def ratio(num, den):
        return F.round(
            F.when(F.col(den) > 0,
                   F.col(num).cast("double") / F.col(den))
            .otherwise(F.lit(0.0)), 6)

    keep = (
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000)
        & (F.col("_sumlen") >= 3 * F.col("n_words"))
        & (F.col("_sumlen") <= 10 * F.col("n_words"))
        & (10 * (F.col("_nhash") + F.col("_nell")) <= F.col("n_words"))
        & (10 * F.col("_nbullet") <= 9 * F.col("n_lines"))
        & (10 * F.col("_nelline") <= 3 * F.col("n_lines"))
        & (5 * F.col("_nalpha") >= 4 * F.col("n_words"))
        & (F.col("n_stopwords") >= 2)
    )
    return calc.select(
        F.col(id_col), "n_words",
        ratio("_sumlen", "n_words").alias("mean_word_len"),
        ratio("_nalpha", "n_words").alias("frac_alpha_words"),
        ratio("_nbullet", "n_lines").alias("frac_bullet_lines"),
        ratio("_nelline", "n_lines").alias("frac_ellipsis_lines"),
        "n_stopwords",
        keep.cast("int").alias("keep"),
    )


def normalize_text(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Unicode text normalization — the canonicalization stage run before
    hashing/dedup so visually-identical strings dedup together: strip C0
    control chars (keeping \\n and \\t), NFC-normalize (UAX #15), then
    collapse space/tab runs and trim.

    The control strip and whitespace collapse are JVM-side regexes; NFC
    is the one step Spark has no builtin for, so it runs as an
    Arrow-batched pandas UDF over ``unicodedata`` — a declared Python
    step on the normalization path only (the oracle uses DuckDB's
    ``nfc_normalize``, verified char-identical to Python's UAX #15
    implementation).  Zero shuffles."""
    from pyspark.sql.functions import pandas_udf

    def _nfc_fn(s):
        import unicodedata
        return s.map(lambda t: None if t is None
                     else unicodedata.normalize("NFC", t))

    # functional form: the module's `from __future__ import annotations`
    # makes decorator type hints unresolvable strings
    _nfc = pandas_udf(_nfc_fn, "string")

    base = df.select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    stripped = F.regexp_replace(
        F.col("_t"), "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    normed = _nfc(stripped)
    collapsed = F.trim(F.regexp_replace(normed, "[ \\t]+", " "))
    return base.select(
        F.col(id_col),
        collapsed.alias("text_norm"),
        (collapsed != F.col("_t")).cast("int").alias("changed"),
        F.length("_t").cast("bigint").alias("n_chars_before"),
        F.length(collapsed).cast("bigint").alias("n_chars_after"),
    )


def sentence_chunks(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    chunk_chars: int = 400) -> DataFrame:
    """Sentence-boundary context chunking — the training-window prep
    step between cleaning and packing: documents split on sentence
    boundaries, sentences assigned to fixed-budget chunks by their
    cumulative character offset (a sentence never straddles a chunk).

    chunk_idx = (chars before this sentence) div ``chunk_chars`` — the
    deterministic fixed-boundary formulation (greedy first-fit differs
    only when a single sentence exceeds the budget).  Sentence split is
    ``[.!?]+\\s+`` (RE2-safe: identical semantics in Spark's Java regex
    and the DuckDB oracle — no lookbehind).

    Scale shape: split + explode are in-row; the running offset windows
    partitionBy(doc) ordered by sentence index (per-doc row counts
    bounded by document length); one (doc, chunk) groupBy with map-side
    combine.  Emits (doc_id, chunk_idx, n_sents, chunk_len)."""
    from pyspark.sql import Window

    sents = df.select(
        F.col(id_col),
        F.posexplode(F.expr(
            f"filter(split(coalesce({text_col}, ''), '[.!?]+\\\\s+'), "
            "s -> s <> '')")).alias("idx", "sent"))
    w = (Window.partitionBy(id_col).orderBy("idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    pre = F.coalesce(F.sum(F.length("sent").cast("bigint")).over(w),
                     F.lit(0))
    # integer `div`, not float `/`: floor-exact at any offset magnitude
    chunks = sents.withColumn("_pre", pre).select(
        F.col(id_col),
        F.expr(f"_pre div {chunk_chars}").cast("bigint").alias("chunk_idx"),
        F.length("sent").alias("_sl"))
    return (chunks.groupBy(id_col, "chunk_idx")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sents"),
                 F.sum("_sl").cast("bigint").alias("chunk_len")))


def quality_bins(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n_bins: int = 4) -> DataFrame:
    """EXACT corpus quantile binning of the quality score — the
    curriculum / filtering-threshold step ("train on the top quartile",
    "drop the bottom decile") that follows scoring.

    Exactness without a global sort: the score domain is BOUNDED (micro-
    quantized to <= 1e6 + 1 distinct integer values regardless of corpus
    size), so a value histogram + one cumulative pass over the domain
    yields exact boundary values b_k = min{v : cum(v) >= ceil(n*k/B)};
    a doc's bin is the smallest k with score <= b_k, which by
    construction puts equal scores in equal bins.  Everything is integer
    arithmetic, bit-identical in the oracle.

    Scale shape: one groupBy on the quantized score (bounded key
    domain), ONE deliberately single-partition cumulative window over
    the <= 1e6-row histogram (domain-bounded, NOT corpus-bounded —
    partitionBy(lit(0)) makes the intent explicit), a 1-row boundary
    aggregate broadcast back, and a zero-shuffle bin projection.
    Emits (doc_id, quality_micro, bin)."""
    from pyspark.sql import Window

    scored = quality_score(df, text_col, id_col).select(
        F.col(id_col),
        F.expr("cast(round(quality * 1000000) as bigint)")
        .alias("quality_micro"))
    hist = scored.groupBy("quality_micro").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"))
    w = Window.partitionBy(F.lit(0)).orderBy("quality_micro") \
        .rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    tot = scored.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    bounds = (cum.crossJoin(F.broadcast(tot))
              .agg(*[F.min(F.when(
                        F.col("_cum") >= F.expr(f"(_n * {k} + {n_bins - 1}) "
                                                f"div {n_bins}"),
                        F.col("quality_micro"))).alias(f"_b{k}")
                     for k in range(1, n_bins)]))
    bin_expr = None
    for k in range(1, n_bins):
        cond = F.col("quality_micro") <= F.col(f"_b{k}")
        bin_expr = (F.when(cond, k) if bin_expr is None
                    else bin_expr.when(cond, k))
    bin_expr = bin_expr.otherwise(n_bins)
    return (scored.crossJoin(F.broadcast(bounds))
            .select(id_col, "quality_micro",
                    bin_expr.cast("int").alias("bin")))
