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
