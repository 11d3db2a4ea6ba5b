"""Profile host-side time in search_batch at 1M docs on the real TPU.

Usage: python exp/profile_dispatch.py [n_batches]
Loads the cached bench index, warms compiles, then cProfiles the steady
state to attribute the dispatch tax (BENCH r3: search.device.dispatch was
3.21s/6 batches vs 0.76s device compute).
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

if os.environ.get("BENCH_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from rucene_tpu import IndexSearcher  # noqa: E402
from rucene_tpu.codec import files as segfiles  # noqa: E402
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot  # noqa: E402
from rucene_tpu.store.directory import FSDirectory  # noqa: E402


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    n_docs = int(os.environ.get("BENCH_DOCS", 1_000_000))
    seg_name = f"bench-zipf-{n_docs}"
    packed = segfiles.read_segment(FSDirectory(cache_dir), seg_name)
    reader = IndexReader([SegmentSnapshot("bench", packed)])
    searcher = IndexSearcher(reader)
    vocab, probs = bench.zipf_vocab()
    phrase_texts, _, _ = bench.build_corpus(2000, seed=77)
    queries = bench.build_queries(512, vocab, probs, phrase_texts=phrase_texts)
    batch = 256
    k = 100

    print("warming...", flush=True)
    t0 = time.time()
    for i in range(0, 512, batch):
        searcher.search_batch(queries[i : i + batch], k=k)
    print(f"warm done ({time.time()-t0:.0f}s); profiling...", flush=True)

    pr = cProfile.Profile()
    t1 = time.time()
    pr.enable()
    for _ in range(n_batches):
        for i in range(0, 512, batch):
            searcher.search_batch(queries[i : i + batch], k=k)
    pr.disable()
    wall = time.time() - t1
    print(f"{2*n_batches} batches in {wall:.2f}s "
          f"({2*n_batches*batch/wall:.0f} qps)", flush=True)
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())
    from rucene_tpu.util.metrics import METRICS

    snap = METRICS.snapshot()
    timers = sorted(
        ((n, t["total_s"], t["count"]) for n, t in snap["timers"].items()),
        key=lambda kv: -kv[1],
    )[:12]
    print("timers: " + " ".join(f"{n}={tot:.2f}s/{c}" for n, tot, c in timers))


if __name__ == "__main__":
    main()
