#!/bin/bash
# Round-5 TPU measurement protocol (VERDICT r4: the round of RECORDED
# scale). ONE process at a time (single-holder TPU + single CPU core).
# Logs land in exp/logs/ with an _r5 suffix.
#
# Evidence hygiene (VERDICT r4 item 8): run() FAILS the step unless the
# log is non-empty and its last line is a JSON object — a crashed
# harness, a 0-byte log, or a mid-run kill can no longer be committed as
# if it were a result. Steps that legitimately produce no JSON must be
# invoked with run_nojson and still require a non-empty log.
#
# Prerequisite: /tmp/rtpu_bench_cache holds the 1M, 8.8M and pytext-500K
# caches (tools/build_bench_cache.py — /tmp is wiped between driver
# sessions, rebuild first).
set -u
cd "$(dirname "$0")/.."
mkdir -p exp/logs
export BENCH_CACHE=/tmp/rtpu_bench_cache
FAILED=0

check_json_tail() { # $1 = log file: last line must parse as a JSON object
  python - "$1" <<'EOF'
import json, sys
lines = [l for l in open(sys.argv[1], errors="replace").read().splitlines() if l.strip()]
ok = False
if lines:
    try:
        ok = isinstance(json.loads(lines[-1]), dict)
    except json.JSONDecodeError:
        ok = False
sys.exit(0 if ok else 1)
EOF
}

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-2400}" "$@" > "exp/logs/$name.log" 2>&1
  rc=$?
  if [ $rc -ne 0 ] || ! check_json_tail "exp/logs/$name.log"; then
    echo "FAILED $name: exit=$rc, log missing final JSON line (exp/logs/$name.log)"
    tail -3 "exp/logs/$name.log"
    FAILED=1
    return 1
  fi
  echo "ok (exp/logs/$name.log)"
  tail -3 "exp/logs/$name.log"
}

run_nojson() { # for smoke steps whose success is exit-0 + non-empty log
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-2400}" "$@" > "exp/logs/$name.log" 2>&1
  rc=$?
  if [ $rc -ne 0 ] || [ ! -s "exp/logs/$name.log" ]; then
    echo "FAILED $name: exit=$rc (exp/logs/$name.log)"
    tail -3 "exp/logs/$name.log"
    FAILED=1
    return 1
  fi
  echo "ok (exp/logs/$name.log)"
  tail -3 "exp/logs/$name.log"
}

# FINAL STATUS (r5 end): every step below was driven manually, most with
# iteration suffixes. Recorded artifacts:
#  1. bench_8m_k100_r5d.log  59.8 QPS 1.36x (r5 = plane-thrash 0.5 QPS;
#     r5b/r5c = fused-build compile OOMs; r5e/r5f/r5g = isect-route
#     regressions, route deleted after exp/logs/isect_probe_r5.log)
#     bench_8m_k1000_r5.log  59.7 QPS 1.31x (k-insensitive)
#  2. bench_pytext_r5.log    259.3 QPS 0.15x (sparse real text favors the
#     one-core scalar engine at sub-1M scale)
#  3. bench_nrt_r5i.log      final NRT record (r5..r5h = the diagnosis
#     series: combined-view rebuild 18-33 s/refresh, per-new-segment
#     compiles 1-5 min/shape, decoded-plane uploads at ~7 MB/s — fixed
#     by shape floors + packed small segments + shared scalar cache +
#     chunked ingest + deferred merges)
#  4. bench_1m_r5b.log       3,783.7 QPS 12.49x (headline; r5 = admission
#     regression, fixed by the >2M-doc gate)
#  5. wand_ab_r5.log         pruning lost 4-5x at every k, 0 blocks
#     pruned -> WAND path DELETED (commit a27ca3a)
#  6. bench_1m_packed_r5.log 465.4 QPS — packed mode 8.1x slower than
#     decoded residency; it remains the fallback past the HBM ceiling
#  7. bench_1m_packed_v2_r5.log 361.5 QPS — kernel v2 lost its A/B ->
#     DELETED (commit 796b221); this step no longer runs
#  8. smoke_r5.log, 9. class_times_guard_r5.log (all classes improved,
#     best file updated)

# 1. 8.8M rows FIRST (BASELINE config 3, never recorded r1-r4): k=100, k=1000
STEP_TIMEOUT=3600 run bench_8m_k100_r5 env BENCH_DOCS=8800000 BENCH_BATCH=32 BENCH_QUERIES=128 python bench.py
STEP_TIMEOUT=3600 run bench_8m_k1000_r5 env BENCH_DOCS=8800000 BENCH_BATCH=32 BENCH_QUERIES=128 BENCH_K=1000 python bench.py

# 2. real-text corpus (cache prebuilt)
run bench_pytext_r5 env BENCH_CORPUS=pytext BENCH_DOCS=500000 BENCH_BATCH=128 python bench.py

# 3. NRT concurrent ingest+search (BASELINE config 4)
run bench_nrt_r5 env BENCH_NRT=1 python bench.py

# 4. headline 1M bench (driver-shaped: all defaults)
run bench_1m_r5 python bench.py

# 5. WAND A/B on pure disjunctions (measure or DELETE — VERDICT r4 item 6)
run wand_ab_r5 python exp/wand_ab.py 1000000 10 100 1000

# 6. A/B: decoded residency off (packed + Mosaic kernel serving mode)
run bench_1m_packed_r5 env RUCENE_DECODED=0 python bench.py

# 7. (deleted) decode-kernel v2 A/B — kernel removed after losing its A/B

# 8. smoke: entry + kernel/decoded parity on the real chip
run_nojson smoke_r5 python __graft_entry__.py

# 9. per-class regression guard vs best committed numbers — MUST gate the
# round-end snapshot commit (VERDICT r4 weak #7)
run_nojson class_times_guard_r5 python exp/class_times.py --assert

if [ $FAILED -ne 0 ]; then
  echo "=== RUNBOOK INCOMPLETE: at least one step failed its evidence check ==="
  exit 1
fi
echo "=== all done; summarize into README + BENCH notes ==="
