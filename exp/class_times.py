"""Per-query-class device cost at 1M docs on the real chip.

Times homogeneous batches (term-only / OR-only / AND-only / phrase-only)
through search_batch, so each executor program's cost is attributed
separately. Usage: python exp/class_times.py [batch] [k]
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

from rucene_tpu import BooleanQuery, IndexSearcher, PhraseQuery, Term, TermQuery  # noqa: E402
from rucene_tpu.codec import files as segfiles  # noqa: E402
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot  # noqa: E402
from rucene_tpu.store.directory import FSDirectory  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    n_docs = int(os.environ.get("BENCH_DOCS", 1_000_000))
    packed = segfiles.read_segment(FSDirectory(cache_dir), f"bench-zipf-{n_docs}")
    reader = IndexReader([SegmentSnapshot("bench", packed)])
    searcher = IndexSearcher(reader)
    vocab, probs = bench.zipf_vocab()
    rng = np.random.default_rng(13)
    band = np.arange(10, 5000)
    band_p = probs[band] / probs[band].sum()
    phrase_texts, _, _ = bench.build_corpus(2000, seed=77)
    bigrams = bench.sample_bigrams(phrase_texts, batch)

    def t1():
        return vocab[rng.choice(band, p=band_p)]

    classes = {
        "term": [TermQuery(Term("body", t1())) for _ in range(batch)],
        "or2": [],
        "and2": [],
        "phrase": [PhraseQuery("body", list(bigrams[i % len(bigrams)])) for i in range(batch)],
    }
    for _ in range(batch):
        q = BooleanQuery()
        q.should(TermQuery(Term("body", t1())))
        q.should(TermQuery(Term("body", t1())))
        classes["or2"].append(q)
        q2 = BooleanQuery()
        q2.must(TermQuery(Term("body", t1())))
        q2.must(TermQuery(Term("body", t1())))
        classes["and2"].append(q2)

    for name, qs in classes.items():
        searcher.search_batch(qs, k=k)  # warm/compile
        t0 = time.time()
        reps = 0
        while time.time() - t0 < 4.0 or reps < 2:
            searcher.search_batch(qs, k=k)
            reps += 1
            if reps >= 30:
                break
        per = (time.time() - t0) / reps
        print(f"CLASS {name}: {per*1000:.0f} ms/batch of {batch} "
              f"({batch/per:.0f} qps serial)", flush=True)


if __name__ == "__main__":
    main()
