#!/bin/bash
# Round-4 TPU measurement protocol (VERDICT r3 item 2: execute the WHOLE
# runbook, commit every log).
# STATUS (post-round note, ADVICE r4): only steps 1-3 produced logs in
# round 4 — steps 4-9 (NRT, WAND A/B, packed/v2 A/Bs, smoke, guard) were
# never run; the 8.8M re-run after f47e02d ended with the round mid-run.
# Round 5 re-runs everything via exp/tpu_round5.sh with JSON-checked
# evidence gates. ONE process at a time (single-holder TPU +
# single CPU core). Logs land in exp/logs/ with an _r4 suffix.
# Prerequisite: /tmp/rtpu_bench_cache holds the 1M, 8.8M and pytext-500K
# caches (tools/build_bench_cache.py — /tmp is wiped between driver
# sessions, rebuild first).
set -u
cd "$(dirname "$0")/.."
mkdir -p exp/logs
export BENCH_CACHE=/tmp/rtpu_bench_cache

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "exp/logs/$name.log" 2>&1
  echo "exit=$? (exp/logs/$name.log)"
  tail -3 "exp/logs/$name.log"
}

# 1. headline bench, 1M planes config (driver-shaped: all defaults)
run bench_1m_r4 python bench.py

# 2. 8.8M rows (BASELINE config 3): k=100 and k=1000
run bench_8m_k100_r4 env BENCH_DOCS=8800000 BENCH_BATCH=32 BENCH_QUERIES=128 python bench.py
run bench_8m_k1000_r4 env BENCH_DOCS=8800000 BENCH_BATCH=32 BENCH_QUERIES=128 BENCH_K=1000 python bench.py

# 3. real-text corpus
run bench_pytext_r4 env BENCH_CORPUS=pytext BENCH_DOCS=500000 BENCH_BATCH=128 python bench.py

# 4. NRT concurrent ingest+search (BASELINE config 4)
run bench_nrt_r4 env BENCH_NRT=1 python bench.py

# 5. WAND A/B on pure disjunctions (measure or retire — VERDICT item 5)
run wand_ab_r4 python exp/wand_ab.py 1000000 10 100 1000

# 6. A/B: decoded residency off (packed + Mosaic kernel fallback mode)
run bench_1m_packed_r4 env RUCENE_DECODED=0 python bench.py

# 7. experimental decode-kernel v2 A/B (packed mode)
run bench_1m_packed_v2_r4 env RUCENE_DECODED=0 RUCENE_KERNEL=v2 python bench.py

# 8. smoke: entry + kernel/decoded parity on the real chip
run smoke_r4 python __graft_entry__.py

# 9. per-class regression guard vs best committed numbers
run class_times_guard_r4 python exp/class_times.py --assert

echo "=== all done; summarize into README + BENCH notes ==="
