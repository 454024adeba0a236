#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir]

Runs DuckDB oracle SQL from outdir/oracle_sql.json against the parquet
tables in sfdir, loads the Spark results written by graft.Verify from
outdir/<name>/, and compares: row count, schema (column names), and
values (columns sorted by name, rows sorted by all columns, exact).
"""
import json
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{OUT}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(oracle_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        # exact compare; show first diff
        try:
            diff_cols = []
            for c in s.columns:
                a, b = s[c], o[c]
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    eq = (a.astype(float).fillna(-9e99) - b.astype(float).fillna(-9e99)).abs() <= 0
                else:
                    eq = a.astype(str).fillna("") == b.astype(str).fillna("")
                if not eq.all():
                    i = eq.idxmin()
                    diff_cols.append((c, a[i], b[i]))
            if diff_cols:
                print(f"FAIL {name}: value diffs {diff_cols[:3]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: compare error: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracles)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
