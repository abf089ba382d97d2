#!/usr/bin/env python3
"""The 10x-scale variant of check.py (dev tool only): runs each oracle
in a SUBPROCESS with a per-query timeout, because a handful of oracles
are deliberately quadratic SQL (all-pairs Jaccard twins, recursive
closures, unrolled-CTE graph chains) that DuckDB cannot finish at
sf0.1 in sane time — the SPARK side of those queries is fine; the
timeout prices the ORACLE, not the engine. A timeout is recorded as
SKIP, never a failure.

The skip set is PINNED (round-9 verdict item: the gate's OK/SKIP
counts must not move with box load): PINNED_SKIP names the oracles
whose SQL is structurally quadratic at sf0.1 (all-pairs Jaccard
twins, recursive closures, unrolled graph chains — q127 alone runs
20+ min); they are recorded SKIP without spending their timeout.
BOUNDARY names the three oracles measured near the 90 s line whose
outcome drifted with load in r8 — they run with a 4x budget so they
land OK deterministically. (r8 measured four such oracles; the
fourth, q101, graduated to PINNED_SKIP in r9 after its oracle was
timed directly at > 600 s on an idle box.) Everything else keeps the base budget; a
NEW query drifting over it shows up as a (loud, investigable) SKIP
rather than silently joining a pinned list.

Measured round 8 at sf0.1 over the full 266-query catalog (90 s
budget): 249 OK, 0 FAIL, 17 SKIP — the 15 PINNED_SKIP entries plus
2 of the four boundary oracles on a loaded box.

Usage: python3 tools/check_scaled.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import json, subprocess, sys, os

sf_dir, out_dir = sys.argv[1], sys.argv[2]
timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 90

# structurally quadratic (or otherwise unbounded-cost) DuckDB SQL at
# sf0.1 — never attempted; the Spark side of every one of these
# passes in the same Verify run. q101 graduated here in r9: its
# oracle was timed DIRECTLY at > 600 s on an idle box (not a load
# drift — it never fit the 90 s budget).
PINNED_SKIP = {
    "q35_dedup_ngram_jaccard", "q36_dedup_minhash_lsh",
    "q65_dedup_clusters", "q72_cluster_split",
    "q76_dedup_minhash_incremental", "q79_dedup_clusters_incremental",
    "q86_index_compaction", "q101_stream_ingest_dedup",
    "q127_resolve_best",
    "q145_dedup_attrition", "q169_triangle_stats",
    "q176_containment", "q178_crosssource_dups",
    "q185_pagerank", "q221_dedup_threshold_sweep",
    "q253_contrastive_pairs",
    # r10: same all-pairs-Jaccard CTE as q221 (plus the sampled eval
    # on top) — quadratic by construction, like its parent
    "q270_dedup_sweep_eval",
    # r10: same all-pairs-Jaccard + recursive-closure CTE as q65 —
    # quadratic by construction, like its parent
    "q271_delete_propagation", "q272_stream_delete_propagation",
    # r11: q271's recursive-closure clusters PLUS a second all-pairs
    # Jaccard pass for the post-delete probe — quadratic twice over
    "q274_delete_compaction_probe",
    # r11: the deletion certificate replays q271's recursive-closure
    # clusters — quadratic by construction, like its parent. (q276 is
    # NOT pinned: its oracle is the q267-family materialized cross
    # product, which lands OK at sf0.1.)
    "q277_deletion_certificate",
}
# measured near the budget line in r8 (drifted OK<->SKIP with load):
# a 4x budget lands them OK on any plausible box (r9 run 1: all
# three OK at 4x)
BOUNDARY = {
    "q117_decontaminate_fuzzy",
    "q226_triangles_capped", "q232_kcore",
}

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
    if q in PINNED_SKIP:
        print(f"SKIP {q}: pinned (structurally quadratic oracle SQL, "
              "not a Spark-side issue)", flush=True)
        skip += 1
        continue
    q_timeout = timeout * 4 if q in BOUNDARY else timeout
    try:
        r = subprocess.run([sys.executable, "-c", WORKER,
                            sf_dir, out_dir, q],
                           capture_output=True, text=True,
                           timeout=q_timeout)
        out = (r.stdout or "") + (r.stderr or "")
        line = (out.strip().splitlines()[-1] if out.strip()
                else f"FAIL {q}: no output")
        print(line, flush=True)
        if r.returncode == 0:
            ok += 1
        else:
            fail += 1
    except subprocess.TimeoutExpired:
        print(f"SKIP {q}: oracle exceeded {q_timeout}s "
              "(quadratic SQL, not a Spark-side issue)", flush=True)
        skip += 1
print(f"done: {ok} OK, {fail} FAIL, {skip} SKIP")
sys.exit(1 if fail else 0)
