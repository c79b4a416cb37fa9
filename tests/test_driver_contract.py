"""Driver-contract consistency: every oracle key must match a query key
(a typo'd key silently downgrades a query to the weaker rows-only check),
and the rows-only set is exactly the documented exception."""

import __spark_entry__ as entry

EXPECTED_ROWS_ONLY = set()   # every query is value-oracled (round 3)


def test_oracle_keys_match_queries():
    qs = set(entry.queries().keys())
    oracles = set(entry.oracle_sql().keys())
    assert oracles <= qs, f"oracles without queries: {sorted(oracles - qs)}"
    assert qs - oracles == EXPECTED_ROWS_ONLY, (
        f"unexpected rows-only queries: {sorted(qs - oracles - EXPECTED_ROWS_ONLY)}"
    )


def test_oracle_sql_is_nonempty_and_unique():
    sql = entry.oracle_sql()
    assert all(isinstance(s, str) and len(s.strip()) > 20 for s in sql.values())
    # no copy-paste duplicate oracle bodies
    bodies = list(s.strip() for s in sql.values())
    assert len(bodies) == len(set(bodies))


def test_oracle_float_policy():
    """Mechanical enforcement of the NOTES.md oracle type/float policy:
    no avg() anywhere, and every sum() must be either CAST-wrapped
    (CAST(sum(...) AS ...)) or an exact-quantized/double-cast operand
    (sum(CAST(...))). DuckDB's HUGEINT (bare integer sum) turns into
    float64 through the driver's pandas path and hash-mismatches Spark's
    bigint — the round-1 failure class this pins shut."""
    import re

    # ±1 sums used only inside sign comparisons (never emitted as output
    # columns) — the single audited exception
    BARE_SUM_ALLOWED = {"dedup_simhash"}

    sql = entry.oracle_sql()
    word = r"(?i)(?<![a-z0-9_])"
    for name, body in sql.items():
        assert not re.search(word + r"avg\s*\(", body), f"{name}: avg() banned"
        for m in re.finditer(word + r"sum\s*\(", body):
            pre = re.sub(r"\s+", "", body[max(0, m.start() - 8):m.start()]).upper()
            operand = body[m.end():m.end() + 12].lstrip().upper()
            if pre.endswith("CAST(") or operand.startswith("CAST("):
                continue
            assert name in BARE_SUM_ALLOWED, (
                f"{name}: bare sum() at char {m.start()} — wrap in CAST or "
                f"quantize (NOTES.md oracle policy)")
