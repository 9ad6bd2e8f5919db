#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (schema, rows, values).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    # sort columns by name, then rows by all columns — order-insensitive
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        got_n, want_n = norm(got), norm(want)
        if list(got_n.columns) != list(want_n.columns):
            print(f"FAIL {name}: columns {list(got_n.columns)} != {list(want_n.columns)}")
            n_bad += 1
            continue
        dtype_diff = [(c, str(got_n[c].dtype), str(want_n[c].dtype))
                      for c in got_n.columns
                      if str(got_n[c].dtype) != str(want_n[c].dtype)]
        if dtype_diff:
            print(f"FAIL {name}: dtype mismatch {dtype_diff}")
            n_bad += 1
            continue
        if len(got_n) != len(want_n):
            print(f"FAIL {name}: rows {len(got_n)} != {len(want_n)}")
            n_bad += 1
            continue
        if got_n.equals(want_n):
            print(f"OK   {name} ({len(got_n)} rows)")
            n_ok += 1
        else:
            diff = (got_n != want_n) & ~(got_n.isna() & want_n.isna())
            bad_cols = [c for c in got_n.columns if diff[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = diff[c].idxmax()
                print(f"   {c}[{idx}]: got={got_n[c][idx]!r} want={want_n[c][idx]!r}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
