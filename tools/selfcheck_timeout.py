#!/usr/bin/env python3
"""Per-query variant of selfcheck.py with a hard timeout per oracle.

Usage: python3 tools/selfcheck_timeout.py <sfDir> <verifyOutDir> <seconds>

Same compare as tools/selfcheck.py, but each oracle runs in its own
worker with a timeout, so one pathological oracle (e.g. dd08's
recursive CTE at sf0.1 in DuckDB) can't stall the whole sweep. Used for
the off-gate scale probes (sf0.001 / sf0.1); the driver's gate runs the
plain selfcheck at sf0.01. Dev tool only — not part of the shipped
library.
"""
import sys, os, glob, json
import multiprocessing as mp

def one(args):
    name, sql, sf_dir, out_dir = args
    import duckdb, pandas as pd
    TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        return df.reset_index(drop=True)
    try:
        want = norm(con.execute(sql).df())
    except Exception as e:
        return (name, f"ORACLE_ERR {e}")
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files: return (name, "NO_OUTPUT")
    got = norm(con.execute(f"SELECT * FROM read_parquet({files!r})").df())
    if list(got.columns) != list(want.columns): return (name, f"COLS {list(got.columns)} != {list(want.columns)}")
    if len(got) != len(want): return (name, f"ROWS {len(got)} != {len(want)}")
    ks = list(got.columns)
    if got.equals(want) or got.sort_values(ks).reset_index(drop=True).equals(want.sort_values(ks).reset_index(drop=True)):
        return (name, "PASS")
    diff = (got != want) & ~(got.isna() & want.isna())
    bad = [c for c in ks if diff[c].any()]
    detail=[]
    for c in bad[:2]:
        i = diff[c].idxmax()
        detail.append(f"{c}: got={got[c][i]!r} want={want[c][i]!r}")
    return (name, "FAIL " + "; ".join(detail))

if __name__ == "__main__":
    sf_dir, out_dir, timeout = sys.argv[1], sys.argv[2], int(sys.argv[3])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        with mp.Pool(1) as pool:
            r = pool.apply_async(one, [(name, sql, sf_dir, out_dir)])
            try:
                n, status = r.get(timeout)
            except mp.TimeoutError:
                n, status = name, "TIMEOUT"
            except Exception as e:
                n, status = name, f"ERR {e}"
        results[n] = status
        if status != "PASS":
            print(n, status, flush=True)
    n_pass = sum(1 for v in results.values() if v=="PASS")
    n_to = sum(1 for v in results.values() if v=="TIMEOUT")
    print(f"== {n_pass} pass, {n_to} timeout, {len(results)-n_pass-n_to} other ==")
