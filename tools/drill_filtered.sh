#!/usr/bin/env bash
# End-to-end drill for the r10 per-sample rescue semantics (dev tool):
# verifies that a contention spike confined to ONE measured pass makes
# a query land in `sample_filtered` (spikes dropped, quote = surviving
# clean median, name KEPT as a prior) and not in `rescued` (which is
# reserved for queries whose every sample spiked — those void from the
# next prior). Companion to the r10 rescue drill in SCALING.md.
#
# Phase 1: clean sf0.001 baseline (RUNS=2) -> the prior.
# Phase 2: RUNS=3 (warmup + 2 measured); 192 spinners are injected
#   when pass 2 starts (first measured sample appears in the partial
#   artifact) and killed when pass 2 completes, so pass 3 measures
#   clean -> most queries hold [spiked, clean] samples.
#
# Usage: bash tools/drill_filtered.sh   (from /root/repo)
set -u
SF=/root/testdata/sf0.001
PRIOR=/tmp/drill_prior.json
OUT=/tmp/drill_filtered.json

echo "== phase 1: clean baseline (prior) =="
rm -f "$PRIOR"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_MAX_RUNS=1 \
  SPARK_GRAFT_BENCH_WALL_SECS=600 SPARK_GRAFT_BENCH_LOAD_WAIT_SECS=60 \
  SPARK_GRAFT_BENCH_OUT=$PRIOR SPARK_GRAFT_BENCH_PRIOR=/nonexistent \
  sbt -batch "runMain graft.Bench" >/tmp/drill_phase1.log 2>&1
echo "phase1 rc=$? prior=$(python3 -c "
import json;d=json.load(open('$PRIOR'));print(d['partial'],d['queries_measured'],round(d['value'],1))")"

echo "== phase 2: spike pass 2 only =="
rm -f "$OUT"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_MAX_RUNS=2 \
  SPARK_GRAFT_BENCH_WALL_SECS=1800 SPARK_GRAFT_BENCH_LOAD_WAIT_SECS=60 \
  SPARK_GRAFT_BENCH_OUT=$OUT SPARK_GRAFT_BENCH_PRIOR=$PRIOR \
  sbt -batch "runMain graft.Bench" >/tmp/drill_phase2.log 2>&1 &
BENCH_PID=$!
SPIN_PIDS=()
# an interrupted drill must not leave 192 busy-loops (or the detached
# bench) pinning the box for every later measurement
trap 'kill "${SPIN_PIDS[@]:-}" "$BENCH_PID" 2>/dev/null' EXIT INT TERM

# wait for pass 2 to START (some query shows a measured sample)
while sleep 5; do
  kill -0 $BENCH_PID 2>/dev/null || { echo "bench died early"; exit 1; }
  n=$(python3 -c "
import json
try:
  d=json.load(open('$OUT'))
  print(sum(1 for v in d['runs'].values() if len(v)>=1))
except Exception: print(-1)" 2>/dev/null)
  [ "$n" -ge 1 ] 2>/dev/null && break
done
echo "pass 2 started -> spinning up 192 spinners"
for i in $(seq 192); do (while :; do :; done) & SPIN_PIDS+=($!); done

# wait for pass 2 to COMPLETE (>= 95% of queries have >= 1 sample;
# the tail of pass 2 finishing under contention is part of the test)
TOTAL=$(python3 -c "import json;print(len(json.load(open('$PRIOR'))['queries']))")
while sleep 5; do
  kill -0 $BENCH_PID 2>/dev/null && true || break
  n=$(python3 -c "
import json
try:
  d=json.load(open('$OUT'))
  print(sum(1 for v in d['runs'].values() if len(v)>=1))
except Exception: print(0)" 2>/dev/null)
  [ "$n" -ge $((TOTAL*95/100)) ] 2>/dev/null && break
done
echo "pass 2 ~complete -> killing spinners"
kill "${SPIN_PIDS[@]}" 2>/dev/null
wait $BENCH_PID
echo "phase2 rc=$?"

python3 - <<'EOF'
import json
d = json.load(open('/tmp/drill_filtered.json'))
p = json.load(open('/tmp/drill_prior.json'))
filt, resc = d.get('sample_filtered', []), d.get('rescued', [])
print(f"partial={d['partial']} wall={d['wall_s']:.0f} shed={d['shed']}")
print(f"sample_filtered: {len(filt)}  rescued: {len(resc)}")
# for filtered queries, the quote must track the CLEAN sample, not the spike
bad = []
for q in filt:
    runs = d['runs'][q]
    quoted = d['queries'][q]
    clean = min(runs)
    if abs(quoted - clean) > 1e-9 and quoted > 3 * clean:
        bad.append((q, quoted, runs))
print(f"filtered quotes tracking their clean sample: {len(filt)-len(bad)}/{len(filt)}")
for q, quoted, runs in bad[:5]:
    print("  BAD", q, quoted, runs)
ex = filt[:3]
for q in ex:
    print(f"  e.g. {q}: runs={d['runs'][q]} warm={d['warmup'][q]} quoted={d['queries'][q]} prior={p['queries'].get(q)}")
EOF
