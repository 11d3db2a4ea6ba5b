"""On-chip A/B of the boolean device program at 1M docs.

Variants per class (or2 / and2, homogeneous 256-row batches):
  default        dense + hist-matmul combine (current routing)
  scatter        RUCENE_NO_COMBINE=1 (dense + XLA scatter-add)
  candidate      RUCENE_STRATEGY=candidate (global lane sort path)
  k10            default at k=10 (top-k / plane cost probe)
Also logs work-list lane counts so the cost model can be checked.

Usage: python exp/bool_ab.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

if os.environ.get("BENCH_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from rucene_tpu import BooleanQuery, IndexSearcher, Term, TermQuery  # noqa: E402
from rucene_tpu.codec import files as segfiles  # noqa: E402
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot  # noqa: E402
from rucene_tpu.store.directory import FSDirectory  # noqa: E402
from rucene_tpu.util.metrics import METRICS  # noqa: E402


def timed(searcher, qs, k, budget=4.0, max_reps=20):
    searcher.search_batch(qs, k=k)  # warm/compile
    lanes0 = METRICS.snapshot()["counters"].get("search.flat_lanes", 0)
    searcher.search_batch(qs, k=k)
    lanes = METRICS.snapshot()["counters"].get("search.flat_lanes", 0) - lanes0
    t0 = time.time()
    reps = 0
    while time.time() - t0 < budget or reps < 2:
        searcher.search_batch(qs, k=k)
        reps += 1
        if reps >= max_reps:
            break
    per = (time.time() - t0) / reps
    return per, lanes


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    n_docs = int(os.environ.get("BENCH_DOCS", 1_000_000))
    packed = segfiles.read_segment(FSDirectory(cache_dir), f"bench-zipf-{n_docs}")
    reader = IndexReader([SegmentSnapshot("bench", packed)])
    searcher = IndexSearcher(reader)
    vocab, probs = bench.zipf_vocab()
    rng = np.random.default_rng(13)
    band = np.arange(10, 5000)
    band_p = probs[band] / probs[band].sum()

    def t1():
        return vocab[rng.choice(band, p=band_p)]

    classes = {"or2": [], "and2": []}
    for _ in range(batch):
        q = BooleanQuery()
        q.should(TermQuery(Term("body", t1())))
        q.should(TermQuery(Term("body", t1())))
        classes["or2"].append(q)
        q2 = BooleanQuery()
        q2.must(TermQuery(Term("body", t1())))
        q2.must(TermQuery(Term("body", t1())))
        classes["and2"].append(q2)

    variants = [
        ("default", {}, 100),
        ("k10", {}, 10),
        ("scatter", {"RUCENE_NO_COMBINE": "1"}, 100),
        ("candidate", {"RUCENE_STRATEGY": "candidate"}, 100),
    ]
    for name, qs in classes.items():
        for vname, env, k in variants:
            for ek, ev in env.items():
                os.environ[ek] = ev
            try:
                per, lanes = timed(searcher, qs, k)
                print(
                    f"AB {name:5s} {vname:9s} k={k:3d}: {per*1000:6.0f} ms/batch"
                    f" ({batch/per:5.0f} qps serial)  lanes={lanes/1e6:.1f}M",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"AB {name:5s} {vname:9s}: FAILED {e}", flush=True)
            finally:
                for ek in env:
                    os.environ.pop(ek, None)


if __name__ == "__main__":
    main()
