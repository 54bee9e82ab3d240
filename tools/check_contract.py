"""Local stand-in for the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and its ``oracle_sql()[name]``
on DuckDB against the same sf directory, then compares row count, sorted
schema, and an order-insensitive value multiset. Reports per-query
PASS/FAIL with first diffs.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonicalize a cell for order-insensitive multiset comparison."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exact-match discipline
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_to_multiset(cols: list[str], rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as e
    from gedixr_spark.session import get_spark

    spark = get_spark("check_contract")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = sdf.collect()
            if name not in oracles:
                print(f"  {name:32s} ROWS-ONLY {len(s_rows)} rows")
                continue
            rel = con.sql(oracles[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
            problems = []
            if sorted(s_cols) != sorted(d_cols):
                problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
            if len(s_rows) != len(d_rows):
                problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
            if not problems:
                ms, md = rows_to_multiset(s_cols, s_rows), rows_to_multiset(d_cols, d_rows)
                if ms != md:
                    extra_s = list((ms - md).items())[:3]
                    extra_d = list((md - ms).items())[:3]
                    problems.append(f"values: only-spark={extra_s} only-duck={extra_d}")
            if problems:
                failed.append(name)
                print(f"  {name:32s} FAIL  " + " ; ".join(problems))
            else:
                print(f"  {name:32s} PASS  {len(s_rows)} rows")
        except Exception as ex:
            failed.append(name)
            print(f"  {name:32s} ERROR {type(ex).__name__}: {ex}")

    print(f"\n{len(qs) - len(failed)}/{len(qs)} pass")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
