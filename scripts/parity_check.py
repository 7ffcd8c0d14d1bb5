"""Driver-style Spark⇄DuckDB parity harness.

Mimics the driver's CORRECTNESS gate: run each queries() entry on
Spark and its oracle_sql twin on DuckDB over the same parquet tables,
compare row count, column names, and order-insensitive values.

Usage: python scripts/parity_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pdf_parser_spark.spark.session import build_session

    spark = build_session("parity", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows  cols={scols}")
            continue
        ddf = con.sql(oracles[name])
        dcols = list(ddf.columns)
        drows = ddf.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        a = norm_rows(scols, [tuple(r) for r in srows])
        b = norm_rows(dcols, drows)
        ok_vals = a == b
        status = "OK " if (ok_cols and ok_vals) else "FAIL"
        print(f"{name:28s} {status} spark={len(a)} duck={len(b)} cols_ok={ok_cols}")
        if not (ok_cols and ok_vals):
            failures.append(name)
            if not ok_cols:
                print(f"   cols spark={scols} duck={dcols}")
            diff_a = [r for r in a if r not in set(map(tuple, b))][:3]
            diff_b = [r for r in b if r not in set(map(tuple, a))][:3]
            print(f"   only-spark: {diff_a}")
            print(f"   only-duck : {diff_b}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all parity checks passed")


if __name__ == "__main__":
    main()
