"""HISTORICAL record (runnable at commit 409bc19 only): direct cost
probe of the intersection phrase route, since REMOVED after this probe
measured it out — exp/logs/isect_probe_r5.log shows 257-574 ms/row warm
(serial random-gather chains in the candidate location) vs ~150 ms on
the scalar engine.

Times the kernel per (df1 x df2) pair class on the real chip, warm,
without the full bench harness — the r5f/r5g benches showed ~1.5 s per
batch in the phrase collect and this attributes it. Also A/Bs fmax.

Run (TPU idle!): python exp/isect_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

import numpy as np  # noqa: E402

from rucene_tpu import IndexSearcher, PhraseQuery  # noqa: E402
from rucene_tpu.codec import files as segfiles  # noqa: E402
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot  # noqa: E402
from rucene_tpu.store.directory import FSDirectory  # noqa: E402


def main():
    import jax

    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    n_docs = int(os.environ.get("BENCH_DOCS", 8_800_000))
    packed = segfiles.read_segment(FSDirectory(cache_dir), f"bench-zipf-{n_docs}")
    reader = IndexReader([SegmentSnapshot("bench", packed)])
    s = IndexSearcher(reader)
    leaf = reader.leaves[0]
    print(f"# leaf md={leaf.max_doc}", flush=True)

    # pick term pairs by df decade
    pf = leaf.packed.fields["body"]
    df = np.asarray(pf.doc_freq)
    order = np.argsort(df)[::-1]

    def term_at_df(target):
        i = int(np.argmin(np.abs(df[order] - target)))
        return pf.terms[int(order[i])], int(df[order[i]])

    pairs = []
    for d1, d2 in [(100_000, 100_000), (400_000, 100_000),
                   (400_000, 400_000), (1_000_000, 400_000),
                   (3_000_000, 400_000)]:
        t1, real1 = term_at_df(d1)
        t2, real2 = term_at_df(d2)
        if t1 == t2:
            continue
        pairs.append((t1, t2, real1, real2))

    from rucene_tpu.util.metrics import METRICS

    for fmax in (64, 16):
        os.environ["RUCENE_ISECT_FMAX"] = str(fmax)
        for t1, t2, real1, real2 in pairs:
            q = PhraseQuery("body", [t1, t2])
            rq = q.rewrite()
            doc_freqs, stats = s._gather_stats([rq])
            est = real1 * real2 / leaf.max_doc
            if not s._phrase_isect_eligible_nogate(leaf, rq):
                print(f"fmax={fmax} df=({real1},{real2}) est={est:.0f}: "
                      "ineligible", flush=True)
                continue
            futs = s._dispatch_phrase_isect(
                leaf, [0], [rq], s.similarity, stats, doc_freqs, 100
            )
            done, spill = s._isect_collect(futs)  # warm/compile
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                futs = s._dispatch_phrase_isect(
                    leaf, [0], [rq], s.similarity, stats, doc_freqs, 100
                )
                done, spill = s._isect_collect(futs)
            per = (time.time() - t0) / reps
            hits = next(iter(done.values()))[2] if done else -1
            print(
                f"fmax={fmax} df=({real1},{real2}) est={est:.0f} "
                f"hits={hits} spill={len(spill)}: {per*1000:.0f} ms/row",
                flush=True,
            )
    print('{"probe": "done"}')


if __name__ == "__main__":
    main()
