"""Local stand-in for the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + schema-width + order-insensitive value multiset.

Usage: python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from itext2kg_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize_cell(v):
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return repr(v)


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(normalize_cell(r[i]) for i in order) for r in rows
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark(cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows, {spark_t:.1f}s")
            continue
        t0 = time.time()
        res = con.sql(oracles[name])
        dcols = [c.lower() for c in res.columns]
        drows = res.fetchall()
        duck_t = time.time() - t0
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(c.lower() for c in scols) == sorted(dcols)
        ok_vals = df_multiset([c.lower() for c in scols], srows) == df_multiset(
            dcols, drows
        )
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:24s} {status} spark={len(srows)} duck={len(drows)} "
            f"cols={'ok' if ok_cols else scols + dcols} vals={'ok' if ok_vals else 'MISMATCH'} "
            f"({spark_t:.1f}s/{duck_t:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            sm = df_multiset([c.lower() for c in scols], srows)
            dm = df_multiset(dcols, drows)
            onlys = [x for x in sm if x not in set(dm)][:3]
            onlyd = [x for x in dm if x not in set(sm)][:3]
            print("  spark-only:", onlys)
            print("  duck-only :", onlyd)
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
