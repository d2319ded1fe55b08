"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and an order-insensitive value summary. Usage:

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from news_crawler_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact: the driver hashes values, so the doubles must be
        # bit-identical after both sides' explicit round()
        return repr(v)
    return str(v)


def canon(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not isinstance(r, dict) else r
        out.append(tuple(norm_cell(d[c]) for c in sorted(cols)))
    return sorted(out)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    spark = get_spark(app_name="oracle_check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf)
            sp_cols = df.columns
            sp_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only ({len(sp_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(sql)
            du_cols = [c for c in res.columns]
            du_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        problems = []
        if sorted(sp_cols) != sorted(du_cols):
            problems.append(f"cols spark={sp_cols} duckdb={du_cols}")
        if len(sp_rows) != len(du_rows):
            problems.append(f"rowcount spark={len(sp_rows)} duckdb={len(du_rows)}")
        if not problems:
            a = canon([dict(zip(sp_cols, r)) for r in sp_rows], sp_cols)
            b = canon([dict(zip(du_cols, r)) for r in du_rows], du_cols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name} ({len(sp_rows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
