"""A/B: WAND block-max pruning on vs off, pure-disjunction batches.

Measures the regime VERDICT r2 item 6 asks about: pure disjunctions at
large corpora, varying k. Uses the cached 1M-doc Zipf index (bench.py
cache format). Run on the real TPU, ONE process at a time.

  python exp/wand_ab.py [docs] [k...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (corpus/query construction + cache loader)


def main():
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ks = [int(a) for a in sys.argv[2:]] or [10, 100, 1000]
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    n_queries = int(os.environ.get("BENCH_QUERIES", "256"))
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")

    from rucene_tpu import BooleanQuery, Term, TermQuery
    from rucene_tpu.codec import files as segfiles
    from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
    from rucene_tpu.search.searcher import IndexSearcher
    from rucene_tpu.store.directory import FSDirectory
    from rucene_tpu.util.metrics import METRICS

    seg_name = f"bench-zipf-{docs}"
    cdir = FSDirectory(cache_dir)
    assert cdir.file_exists(segfiles.segment_file(seg_name)), seg_name
    packed = segfiles.read_segment(cdir, seg_name)
    reader = IndexReader([SegmentSnapshot("bench", packed)])
    vocab, probs = bench.zipf_vocab()

    rng = np.random.default_rng(11)
    # pure disjunctions: OR of 2..4 mid-band terms (bench.build_queries'
    # band — the prunable class)
    band = np.arange(10, min(5000, len(vocab)))
    band_p = probs[band] / probs[band].sum()
    queries = []
    for _ in range(n_queries):
        n = int(rng.integers(2, 5))
        q = BooleanQuery()
        for t in rng.choice(band, size=n, p=band_p, replace=False):
            q.should(TermQuery(Term("body", str(vocab[t]))))
        queries.append(q)

    searcher = IndexSearcher(reader, combine_segments=True)
    for k in ks:
        for prune in (False, True):
            # warm (compile + page-fault) then time
            for s in range(0, n_queries, batch):
                searcher.search_batch(queries[s : s + batch], k=k, prune=prune)
            t0 = time.perf_counter()
            for s in range(0, n_queries, batch):
                searcher.search_batch(queries[s : s + batch], k=k, prune=prune)
            dt = time.perf_counter() - t0
            snap = METRICS.snapshot()["counters"]
            print(
                f"docs={docs} k={k} prune={int(prune)}: "
                f"{n_queries / dt:.1f} QPS ({dt * 1000 / n_queries:.2f} ms/q) "
                f"pruned_blocks_cum={snap.get('search.pruned_blocks', 0)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
