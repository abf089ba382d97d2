#!/usr/bin/env python3
"""The 10x-scale variant of check.py (dev tool only): runs each oracle
in a SUBPROCESS with a per-query timeout, because a handful of oracles
are deliberately quadratic SQL (all-pairs Jaccard twins, recursive
closures, unrolled-CTE graph chains) that DuckDB cannot finish at
sf0.1 in sane time — the SPARK side of those queries is fine; the
timeout prices the ORACLE, not the engine. A timeout is recorded as
SKIP, never a failure.

Measured round 8 at sf0.1 over the full 266-query catalog (90 s
budget): 249 OK, 0 FAIL, 17 SKIP. The core skip set is the
quadratic-Jaccard twins (q35/q36/q65/q72/q76/q79) plus q86, q127,
q145, q169, q176, q178, q185, q221, q253; boundary-cost oracles
(q101, q117, q226, q232) drift in and out of the set with box load
at the 90 s budget.

Usage: python3 tools/check_scaled.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import json, subprocess, sys, os

sf_dir, out_dir = sys.argv[1], sys.argv[2]
timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 90

WORKER = r'''
import json, sys, glob, os
import duckdb, pandas as pd
sf_dir, out_dir, qname = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
files = sorted(glob.glob(f"{out_dir}/{qname}/*.parquet"))
if not files:
    print(f"FAIL {qname}: no spark output"); sys.exit(1)
got = pd.concat([pd.read_parquet(f) for f in files])
exp = con.execute(oracle[qname]).df()
got = got[sorted(got.columns)].reset_index(drop=True)
exp = exp[sorted(exp.columns)].reset_index(drop=True)
if list(got.columns) != list(exp.columns):
    print(f"FAIL {qname}: columns {list(got.columns)} != {list(exp.columns)}")
    sys.exit(1)
if len(got) != len(exp):
    print(f"FAIL {qname}: rows {len(got)} != {len(exp)}"); sys.exit(1)
try:
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)
except AssertionError as e:
    print(f"FAIL {qname}: value mismatch\n{str(e)[:300]}"); sys.exit(1)
print(f"OK   {qname} ({len(got)} rows)")
'''

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = skip = 0
for q in sorted(oracle):
    try:
        r = subprocess.run([sys.executable, "-c", WORKER,
                            sf_dir, out_dir, q],
                           capture_output=True, text=True,
                           timeout=timeout)
        out = (r.stdout or "") + (r.stderr or "")
        line = (out.strip().splitlines()[-1] if out.strip()
                else f"FAIL {q}: no output")
        print(line, flush=True)
        if r.returncode == 0:
            ok += 1
        else:
            fail += 1
    except subprocess.TimeoutExpired:
        print(f"SKIP {q}: oracle exceeded {timeout}s "
              "(quadratic SQL, not a Spark-side issue)", flush=True)
        skip += 1
print(f"done: {ok} OK, {fail} FAIL, {skip} SKIP")
sys.exit(1 if fail else 0)
