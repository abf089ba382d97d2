#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
Scala library has no Python dependency). Runs each oracle_sql.json entry
in DuckDB over the sf tables and compares against the Spark parquet dump
produced by graft.Verify, column-name-sorted, exact values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for qname in sorted(oracle):
    spark_dir = f"{out_dir}/{qname}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"FAIL {qname}: no spark output")
        fail += 1
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        exp = con.execute(oracle[qname]).df()
    except Exception as e:
        print(f"FAIL {qname}: {type(e).__name__}: {e}")
        fail += 1
        continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {qname}: columns {list(got.columns)} != {list(exp.columns)}")
        fail += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {qname}: rows {len(got)} != {len(exp)}")
        fail += 1
        continue
    # dtype report (schema-match risk) + exact value compare
    dt_mismatch = [(c, str(got[c].dtype), str(exp[c].dtype))
                   for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                      check_exact=True)
        status = "OK  "
    except AssertionError as e:
        status = "FAIL"
        fail += 1
        print(f"FAIL {qname}: value mismatch\n{str(e)[:500]}")
        # show first differing rows
        for c in got.columns:
            neq = got[c].values != exp[c].values
            try:
                import numpy as np
                idx = np.nonzero(neq)[0]
            except Exception:
                idx = []
            if len(idx):
                i = idx[0]
                print(f"  col {c}: row {i}: got={got[c].iloc[i]!r} exp={exp[c].iloc[i]!r} ({len(idx)} diffs)")
    if status == "OK  ":
        extra = f" DTYPE~ {dt_mismatch}" if dt_mismatch else ""
        print(f"OK   {qname} ({len(got)} rows){extra}")
print(f"\n{len(oracle)} oracles, {fail} failures")
sys.exit(1 if fail else 0)
