#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (schema, rows, values).

Two fidelity layers, because the driver hashes RAW values:

1. pandas layer — row/column/value compare after dtype normalization
   (what this script always did).
2. physical layer — the r6 lesson (q98): Spark's SQL parser typed a
   literal-heavy expression as DECIMAL(27,6) while DuckDB produced
   DOUBLE; pandas normalized both to float64 and `.equals` passed, but
   the driver's hash of the raw values failed. So we additionally
   compare the ARROW physical type of the Spark parquet against the
   DuckDB result's arrow type, and compare float64 columns BIT-wise
   (0.0 vs -0.0, NaN payloads, last-ulp drift all count as mismatch —
   exactly as a value hash would).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    # sort columns by name, then rows by all columns — order-insensitive
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def phys_kind(t):
    """Collapse an arrow type to the physical kind a value hash would
    see. Timestamps unify across tz representation; strings across
    small/large; ints keep width; floats keep width; decimal keeps
    precision/scale (so decimal-vs-double is a DIFFERENCE)."""
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{phys_kind(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{phys_kind(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def spark_phys(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        return None
    sch = pq.read_schema(files[0])
    return {f.name: phys_kind(f.type) for f in sch}


def float_bits_mismatch(got_n, want_n):
    """Bitwise compare float64 columns of the row-sorted frames; NaN
    must match NaN bit-for-bit the way a raw-value hash sees it (the
    oracle and engine both emit the canonical quiet NaN, so in practice
    NaN==NaN passes; what this catches is last-ulp drift and -0.0)."""
    bad = []
    for c in got_n.columns:
        if str(got_n[c].dtype) != "float64":
            continue
        g = got_n[c].to_numpy(dtype="float64", na_value=np.nan)
        w = want_n[c].to_numpy(dtype="float64", na_value=np.nan)
        gb, wb = g.view("uint64"), w.view("uint64")
        # canonicalize NaN: any NaN payload hashes from its bits, but
        # numpy may materialize different quiet-NaN bit patterns when
        # converting from pandas NA — treat all-NaN positions as equal
        nan_both = np.isnan(g) & np.isnan(w)
        diff = (gb != wb) & ~nan_both
        if diff.any():
            i = int(np.argmax(diff))
            bad.append((c, i, float(g[i]), float(w[i]),
                        f"{int(gb[i]):016x}", f"{int(wb[i]):016x}"))
    return bad


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
            want_arrow = con.execute(sql).fetch_arrow_table()
            want = want_arrow.to_pandas()
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
        # physical layer: Spark parquet arrow type vs DuckDB arrow type
        sp = spark_phys(out_dir, name)
        dp = {f.name: phys_kind(f.type) for f in want_arrow.schema}
        phys_diff = [(c, sp.get(c), dp.get(c)) for c in dp
                     if c in sp and sp[c] != dp[c]]
        if phys_diff:
            print(f"FAIL {name}: PHYSICAL type mismatch {phys_diff}")
            n_bad += 1
            continue
        if not got_n.equals(want_n):
            diff = (got_n != want_n) & ~(got_n.isna() & want_n.isna())
            bad_cols = [c for c in got_n.columns if diff[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = diff[c].idxmax()
                print(f"   {c}[{idx}]: got={got_n[c][idx]!r} want={want_n[c][idx]!r}")
            n_bad += 1
            continue
        bits = float_bits_mismatch(got_n, want_n)
        if bits:
            print(f"FAIL {name}: float BIT mismatch {bits[:3]}")
            n_bad += 1
            continue
        print(f"OK   {name} ({len(got_n)} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
