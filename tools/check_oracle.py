#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling;
NOT part of the Spark library). Runs each oracle SQL from
outDir/oracle_sql.json in DuckDB against the sf parquet tables and
compares with the Spark result parquet written by graft.Verify.

Compare semantics (mirrors the driver): row count, schema (column names
sorted), and a hash of all values with columns sorted by name.

Usage: check_oracle.py <sfDir> <outDir>
"""
import sys, json, glob, hashlib, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(round(v, 6))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def df_hash(df):
    cols = sorted(df.columns)
    df = df[cols]
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(norm(v) for v in row) + "\n").encode())
    return h.hexdigest(), cols

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pq.read_table(files[0]).to_pandas()
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gh, gc = df_hash(got)
        eh, ec = df_hash(exp)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} != {ec}")
            n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
        elif gh != eh:
            print(f"FAIL {name}: hash mismatch ({len(got)} rows)")
            # show first differing row
            for i in range(min(len(got), len(exp))):
                a = [norm(v) for v in got[sorted(got.columns)].iloc[i]]
                b = [norm(v) for v in exp[sorted(exp.columns)].iloc[i]]
                if a != b:
                    print(f"  row {i}: spark={a}")
                    print(f"  row {i}: duckdb={b}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
