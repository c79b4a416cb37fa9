"""Web-URL operators: canonicalization and domain rollups — the first
step of any web-corpus dedup (crawls reach the same page via
http/https, www./bare, tracking params, fragments; canonicalizing before
the url-level groupBy is what makes exact URL dedup meaningful).

All pure JVM expressions (zero shuffle for the normalization itself),
each mirrored 1:1 in the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# query params that never identify content (tracking/session)
TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "utm_term",
                   "utm_content", "gclid", "fbclid", "ref", "mc_cid",
                   "mc_eid")


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonical URL per row:

    * scheme + host lowercased; leading ``www.`` and trailing dot dropped
    * default ports stripped (``:80`` http, ``:443`` https)
    * fragment dropped
    * query split on ``&``: empty and tracking params dropped, the rest
      SORTED and rejoined (param order never identifies content)
    * trailing ``/`` dropped from non-root paths; empty path becomes ``/``

    Non-URL rows (no ``scheme://``) pass through unchanged in
    ``url_norm``.  Output: (url, url_norm, scheme, host, path) — a
    zero-shuffle projection chain; feed ``url_norm`` into exact dedup /
    groupBys."""
    u = F.coalesce(F.col(url_col), F.lit(""))
    staged = df.select(
        F.col(url_col).alias("url"),
        F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
        .alias("scheme"),
        F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
        .alias("_hostport"),
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
        .alias("_rest"),
    ).select(
        "url", "scheme",
        F.regexp_replace(
            F.regexp_replace(F.regexp_extract("_hostport", r"^([^:]*)", 1),
                             r"^www\.", ""),
            r"\.$", "").alias("host"),
        F.regexp_extract("_hostport", r":(\d+)$", 1).alias("_port"),
        F.regexp_extract("_rest", r"^([^?]*)", 1).alias("_path"),
        F.regexp_extract("_rest", r"\?(.*)$", 1).alias("_query"),
    )
    tracking = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    staged = staged.select(
        "url", "scheme", "host",
        F.when((F.col("_port") == "")
               | ((F.col("scheme") == "http") & (F.col("_port") == "80"))
               | ((F.col("scheme") == "https") & (F.col("_port") == "443")),
               F.lit(""))
        .otherwise(F.concat(F.lit(":"), F.col("_port"))).alias("_portsfx"),
        F.when((F.length("_path") > 1) & F.col("_path").endswith("/"),
               F.expr("substring(_path, 1, length(_path) - 1)"))
        .when(F.col("_path") == "", F.lit("/"))
        .otherwise(F.col("_path")).alias("path"),
        F.expr(
            f"array_join(array_sort(filter(split(_query, '&'), p -> "
            f"p <> '' AND NOT array_contains(array({tracking}), "
            f"lower(split_part(p, '=', 1))))), '&')"
        ).alias("_qnorm"),
    )
    url_norm = F.concat(
        F.col("scheme"), F.lit("://"), F.col("host"), F.col("_portsfx"),
        F.col("path"),
        F.when(F.col("_qnorm") == "", F.lit(""))
        .otherwise(F.concat(F.lit("?"), F.col("_qnorm"))),
    )
    return staged.select(
        "url",
        F.when(F.col("scheme") == "", F.col("url")).otherwise(url_norm)
        .alias("url_norm"),
        "scheme", "host", "path",
    )


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host page counts and distinct canonical urls — the rollup a
    crawl-curation pass filters on (host-level caps, spam domains).
    One shuffle on host with map-side combine."""
    norm = normalize_urls(df, url_col)
    return norm.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("url_norm").alias("n_distinct_urls"),
    )


def blocklist_filter(df: DataFrame, blocked: DataFrame,
                     url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """URL blocklist filtering (the UT1-style category-blocklist stage in
    RefinedWeb/FineWeb curation): a page is blocked when its host OR any
    parent domain appears in the blocklist (blocking ``example.com``
    blocks ``a.b.example.com``).

    Scale shape: suffix matching is made an EQUI-join — each host
    explodes into its domain-suffix chain (``a.b.c`` → ``a.b.c``,
    ``b.c``, ``c``; fan-out = label count, ~3-5), joined on the suffix
    against the blocklist (AQE broadcasts a small list; a huge list
    shuffles on the same key), then one per-doc groupBy.  No LIKE/non-equi
    join anywhere, so the plan survives any corpus x blocklist size.

    ``blocked`` must have a ``host`` column.  Emits one row per input doc:
    (doc_id, host, blocked 1/0, blocked_by = shortest matching suffix or
    NULL)."""
    base = df.select(
        F.col(id_col),
        F.lower(F.regexp_extract(
            F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
        .alias("host"),
    )
    sufs = base.select(
        id_col,
        F.explode(F.expr(
            "transform(sequence(0, size(split(host, '[.]')) - 1), "
            "i -> array_join(slice(split(host, '[.]'), i + 1, "
            "size(split(host, '[.]')) - i), '.'))"
        )).alias("suffix"),
    )
    matches = (
        sufs.join(blocked.select(F.lower(F.col("host")).alias("suffix")),
                  "suffix")
        .groupBy(id_col)
        # shortest matching suffix = the most general blocked parent
        .agg(F.min_by("suffix", F.length("suffix")).alias("blocked_by"))
    )
    return (
        base.join(matches, id_col, "left")
        .select(
            F.col(id_col), "host",
            F.col("blocked_by").isNotNull().cast("int").alias("blocked"),
            "blocked_by",
        )
    )


def robots_filter(df: DataFrame, rules: DataFrame,
                  url_col: str = "url",
                  id_col: str = "doc_id") -> DataFrame:
    """robots.txt crawl-politeness filtering with Google's documented
    matching semantics: among all rules of the URL's host whose path
    prefix matches, the LONGEST prefix wins, and on a length tie Allow
    beats Disallow; a URL with no matching rule is allowed.

    ``rules`` has columns (host, rule, prefix) with rule in
    ('allow', 'disallow') — the parsed form of per-host robots.txt
    groups (prefix '' / comment lines dropped by the parser).

    Scale shape: the ONLY join is an equi-join on host — per-host rule
    counts are small constants, so fan-out is bounded and AQE broadcasts
    a small rule table; the winner is a per-URL row_number window over
    that bounded fan-out, then one left join back.  No LIKE-join, no
    cartesian.  Emits (doc_id, host, path, allowed 1/0, matched_rule,
    matched_prefix)."""
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col),
        F.lower(F.regexp_extract(
            F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
        .alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(
                F.col(url_col),
                r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1), F.lit("")),
            F.lit("/")).alias("path"),
    )
    cand = (
        base.join(rules.select(F.lower(F.col("host")).alias("host"),
                               "rule", "prefix"), "host")
        .where(F.col("path").startswith(F.col("prefix")))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.length("prefix").desc(),
        # tie on length: allow < disallow lexicographically — allow wins
        F.col("rule").asc(),
    )
    best = (
        cand.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(id_col, F.col("rule").alias("matched_rule"),
                F.col("prefix").alias("matched_prefix"))
    )
    return (
        base.join(best, id_col, "left")
        .select(
            F.col(id_col), "host", "path",
            (F.coalesce("matched_rule", F.lit("allow")) == "allow")
            .cast("int").alias("allowed"),
            "matched_rule", "matched_prefix",
        )
    )


ROBOTS_SCHEMA = ("host string, rule string, prefix string")


def parse_robots_txt(robots: DataFrame, host_col: str = "host",
                     content_col: str = "content",
                     agent: str = "*") -> DataFrame:
    """Parse per-host robots.txt bodies into the (host, rule, prefix)
    table :func:`robots_filter` consumes.

    Standard group semantics: ``User-agent:`` lines open a group (
    consecutive agent lines share one group); ``Allow:``/``Disallow:``
    lines belong to the most recent group; only groups naming ``agent``
    (or ``*``) contribute; comments (#) and blank values are dropped
    (an empty Disallow means "allow all" and yields NO rule, per the
    spec).  Matching itself — longest prefix, Allow wins ties — lives
    in :func:`robots_filter`.

    Runs as an Arrow-batched ``mapInPandas`` (robots.txt is an
    irregular line format; one body is a few KB, one row per host —
    the Python step is linear in robots bytes, not corpus bytes)."""
    import pandas as pd

    def parse_one(host: str, content: str):
        rules = []
        in_group = False          # current group applies to `agent`
        last_was_agent = False
        for raw in (content or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, _, value = line.partition(":")
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                if not last_was_agent:
                    in_group = False
                in_group = in_group or value == agent or value == "*"
                last_was_agent = True
                continue
            last_was_agent = False
            if field in ("allow", "disallow") and in_group and value:
                rules.append((host, field, value))
        return rules

    def batches(it):
        for pdf in it:
            rows = {"host": [], "rule": [], "prefix": []}
            for host, content in zip(pdf[host_col], pdf[content_col]):
                for h, r, p in parse_one(host, content):
                    rows["host"].append(h)
                    rows["rule"].append(r)
                    rows["prefix"].append(p)
            yield pd.DataFrame(rows)

    return robots.select(host_col, content_col).mapInPandas(
        batches, ROBOTS_SCHEMA)


def crawl_schedule(df: DataFrame, host_col: str = "host",
                   ts_col: str = "ts", id_col: str = "doc_id",
                   min_delay: int = 5) -> DataFrame:
    """Per-host politeness scheduling: assign each fetch request an
    execution slot such that consecutive fetches against the same host
    are at least ``min_delay`` seconds apart and no fetch runs before
    its request time — the crawl-frontier pacing step between frontier
    ranking and the fetch fleet.

    The sequential recurrence slot_i = max(ts_i, slot_{i-1} + D) has the
    CLOSED FORM slot_i = i*D + max_{j<=i}(ts_j - j*D) (i = 0-based rank
    within host, requests in (ts, id) order) — so what looks like an
    inherently sequential per-host fold becomes one running-max window,
    fully parallel across hosts and expressible identically in the
    DuckDB oracle.  All arithmetic is exact integers.

    Scale shape: one shuffle (window partitionBy host); per-host row
    counts are crawl-frontier sized, and a pathological single-host
    frontier is exactly the case where the OUTPUT is inherently
    sequential anyway.  Emits (doc_id, host, ts, slot, wait)."""
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(ts_col, id_col)
    r = F.row_number().over(w) - F.lit(1)
    base = df.select(F.col(id_col), F.col(host_col), F.col(ts_col)) \
        .withColumn("_r", r.cast("bigint")) \
        .withColumn("_adj", F.col(ts_col) - F.col("_r") * min_delay)
    run_max = F.max("_adj").over(
        Window.partitionBy(host_col).orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0))
    return (base.withColumn(
                "slot", (F.col("_r") * min_delay + run_max).cast("bigint"))
            .select(id_col, host_col, F.col(ts_col).cast("bigint").alias(ts_col),
                    "slot",
                    (F.col("slot") - F.col(ts_col)).cast("bigint")
                    .alias("wait")))
