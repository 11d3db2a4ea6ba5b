"""Run an arbitrary subset of the 8.8M bench queries as ONE batch on the
real TPU — the bisect tool for the stage-4 worker crash
(exp/logs/repro_8m_r4b.log). Each worker crash kills the JAX client, so
every probe is its own process:

    python exp/run_8m_subset.py 39 47 55 63     # the 4 phrase rows
    python exp/run_8m_subset.py 63              # phrase [w82, w0] alone

Prints routes and per-row results; exits 0 on success.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

from rucene_tpu import IndexSearcher  # noqa: E402
from rucene_tpu.codec import files as segfiles  # noqa: E402
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot  # noqa: E402
from rucene_tpu.store.directory import FSDirectory  # noqa: E402
from rucene_tpu.util.metrics import METRICS  # noqa: E402


def main():
    idxs = [int(a) for a in sys.argv[1:]]
    assert idxs, "usage: run_8m_subset.py <query indices...>"
    cache = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    packed = segfiles.read_segment(FSDirectory(cache), "bench-zipf-8800000")
    vocab, probs = bench.zipf_vocab()
    phrase_texts, _, _ = bench.build_corpus(2000, seed=77)
    queries = bench.build_queries(128, vocab, probs, phrase_texts=phrase_texts)
    searcher = IndexSearcher(IndexReader([SegmentSnapshot("bench", packed)]))
    k = int(os.environ.get("BENCH_K", 100))

    warm = [q for q in queries[:32] if type(q).__name__ == "TermQuery"][:1]
    t = time.time()
    searcher.search_batch(warm, k=k)
    print(f"# warm (residency) in {time.time()-t:.0f}s", flush=True)

    sub = [queries[i] for i in idxs]
    for i, q in zip(idxs, sub):
        print(f"# q[{i}] = {q}", flush=True)
    t = time.time()
    res = searcher.search_batch(sub, k=k)
    print(f"# batch OK in {time.time()-t:.1f}s", flush=True)
    for i, r in zip(idxs, res):
        print(f"q[{i}]: hits={r.total_hits}", flush=True)
    print("# routes:", dict(METRICS.counters), flush=True)
    print("SUBSET PASSED", flush=True)


if __name__ == "__main__":
    main()
