#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
over <sfDir>/*.parquet, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name, and compares values
exactly (and again row-sorted, since the driver's row-order behavior is
unspecified). Dev tool only — not part of the shipped library.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = norm(con.execute(
            f"SELECT * FROM read_parquet({files!r})").df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        eq_ordered = got.equals(want)
        ks = list(got.columns)
        eq_sorted = (got.sort_values(ks).reset_index(drop=True)
                     .equals(want.sort_values(ks).reset_index(drop=True)))
        if eq_ordered:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        elif eq_sorted:
            print(f"WARN {name}: equal only after row-sort")
            n_pass += 1
        else:
            diff = (got != want) & ~(got.isna() & want.isna())
            bad_cols = [c for c in ks if diff[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                i = diff[c].idxmax()
                print(f"   row {i} col {c}: got={got[c][i]!r} want={want[c][i]!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
