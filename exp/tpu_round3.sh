#!/bin/bash
# Round-3 TPU measurement protocol — run the moment the axon tunnel is
# back. ONE process at a time (single-holder TPU + single CPU core).
# Logs land in exp/logs/. Expect 1-5 min compiles per new shape.
set -u
cd "$(dirname "$0")/.."
mkdir -p exp/logs
export BENCH_CACHE=/tmp/rtpu_bench_cache

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  /usr/bin/time -v timeout 2400 "$@" > "exp/logs/$name.log" 2>&1
  echo "exit=$? (exp/logs/$name.log)"
  tail -3 "exp/logs/$name.log"
}

# 1. smoke: entry + 3-way kernel/decoded parity on the real chip
run smoke python __graft_entry__.py

# 2. headline bench, 1M decoded (default path)
run bench_1m_decoded env BENCH_DOCS=1000000 BENCH_BATCH=128 python bench.py

# 3. A/B: decoded residency off (packed + Mosaic kernel)
run bench_1m_packed env BENCH_DOCS=1000000 BENCH_BATCH=128 RUCENE_DECODED=0 python bench.py

# 4. WAND A/B on pure disjunctions (calibrates _auto_prune_decision)
run wand_ab_1m python exp/wand_ab.py 1000000 10 100 1000

# 5. 8.8M rows (VERDICT item 6): k=100 and k=1000
run bench_8m_k100 env BENCH_DOCS=8800000 BENCH_BATCH=32 BENCH_QUERIES=128 python bench.py
run bench_8m_k1000 env BENCH_DOCS=8800000 BENCH_BATCH=32 BENCH_QUERIES=128 BENCH_K=1000 python bench.py

# 6. real-text corpus
run bench_pytext env BENCH_CORPUS=pytext BENCH_DOCS=500000 BENCH_BATCH=128 python bench.py

# 7. NRT concurrent ingest+search (BASELINE config 4)
run bench_nrt env BENCH_NRT=1 BENCH_DOCS=200000 BENCH_BATCH=128 python bench.py

# 8. experimental decode-kernel v2 A/B (packed mode; validates Mosaic
#    lowering first — interpret-parity already pinned in CI)
run bench_1m_packed_v2 env BENCH_DOCS=1000000 BENCH_BATCH=128 RUCENE_DECODED=0 RUCENE_KERNEL=v2 python bench.py

echo "=== all done; summarize into README + BENCH notes ==="
