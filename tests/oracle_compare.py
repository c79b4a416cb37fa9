"""Local replica of the driver's correctness gate: run each __spark_entry__
query on Spark AND its oracle SQL on DuckDB over the same parquet tables;
compare row count, column names, and order-insensitive values.

Usage: python tests/oracle_compare.py [sf_dir] [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


STRICT = os.environ.get("ORACLE_STRICT", "1") != "0"


def normalize(rows, columns):
    """Row normalizer. STRICT mode (default) reprs floats exactly — no
    rounding — because the driver's value hash is exact: any float that is
    not bit-identical on both sides is a real failure. Set ORACLE_STRICT=0
    for the legacy 6-dp-rounded comparison."""
    import numpy as np

    out = []
    for row in rows:
        vals = []
        for c in columns:
            v = row[c]
            if isinstance(v, np.generic):
                v = v.item()
            if isinstance(v, float):
                if v != v:  # NaN
                    v = "NaN"
                elif not STRICT:
                    v = round(v, 6)
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # the extract_fulltext oracle embeds expected values computed from the
    # documents table — point it at the same sf_dir the views use
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-compare")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sdf.collect()
        except Exception as e:
            failures.append(name)
            print(f"[SPARK-ERR] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: spark rows={len(srows)}")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = sorted(d[0] for d in res.description)
            if STRICT:
                # pandas path, like the driver: DuckDB HUGEINT (un-cast
                # sum()) becomes float64 here and will visibly mismatch a
                # Spark bigint — exactly the class of bug we must catch
                dpdf = res.df()
                drows = dpdf.to_dict("records")
            else:
                drows = [dict(zip([d[0] for d in res.description], r))
                         for r in res.fetchall()]
        except Exception as e:
            failures.append(name)
            print(f"[DUCK-ERR] {name}: {str(e)[:300]}")
            continue
        if scols != dcols:
            failures.append(name)
            print(f"[COLS] {name}: spark={scols} duck={dcols}")
            continue
        s_n = normalize([r.asDict() for r in srows], scols)
        d_n = normalize(drows, scols)
        if len(s_n) != len(d_n):
            failures.append(name)
            print(f"[COUNT] {name}: spark={len(s_n)} duck={len(d_n)}")
            s_only = [x for x in s_n if x not in set(d_n)][:3]
            d_only = [x for x in d_n if x not in set(s_n)][:3]
            print("   spark-only:", s_only)
            print("   duck-only :", d_only)
        elif s_n != d_n:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(s_n, d_n) if a != b][:3]
            print(f"[VALUES] {name}: first diffs:")
            for a, b in diffs:
                print("   spark:", a)
                print("   duck :", b)
        else:
            print(f"[OK] {name}: {len(s_n)} rows match")
    print("\nFAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
