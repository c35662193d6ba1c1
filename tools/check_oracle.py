#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF dir, then compare each dumped parquet against the DuckDB oracle
SQL (sorted columns, row-wise value hash). NOT part of the library —
authoring-time tooling only.

Usage: python3 tools/check_oracle.py <outDir> <sfDir>
(assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        # normalize integer WIDTH (the driver hashes int32/int64 alike)
        # but keep int-vs-float strict: DuckDB HUGEINT reads back as
        # float64 and DID hash-mismatch Spark int64 in CORRECTNESS_r02
        elif pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c].dtype):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)

fails, passes = [], []
for q, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, q)
    if not os.path.isdir(spark_path):
        fails.append((q, "no spark output")); continue
    try:
        got = canon(con.execute(
            f"SELECT * FROM parquet_scan('{spark_path}/*.parquet')").df())
        want = canon(con.execute(sql).df())
    except Exception as e:
        fails.append((q, f"exec error: {e}")); continue
    if list(got.columns) != list(want.columns):
        fails.append((q, f"cols: spark={list(got.columns)} duck={list(want.columns)}")); continue
    if len(got) != len(want):
        fails.append((q, f"rows: spark={len(got)} duck={len(want)}")); continue
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    w = want.sort_values(list(want.columns)).reset_index(drop=True)
    try:
        # dtype-EXACT: the driver's hash path is dtype-sensitive (a DuckDB
        # HUGEINT reads back as float64 and hash-mismatches Spark's int64
        # even when values are identical) — the local gate must predict it
        pd.testing.assert_frame_equal(g, w, check_dtype=True, check_exact=False, rtol=0, atol=1e-9)
        passes.append(q)
    except AssertionError as e:
        fails.append((q, str(e).split("\n")[0] + " | " + "\n".join(str(e).split("\n")[1:4])))

print(f"PASS {len(passes)}: {' '.join(passes)}")
for q, msg in fails:
    print(f"FAIL {q}: {msg[:500]}")
sys.exit(1 if fails else 0)
