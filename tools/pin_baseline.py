"""Pin the scalar C++ baseline for a bench config into BASELINE.json.

VERDICT r4 item 7: vs_baseline swung ±18% across recordings because the
denominator was re-measured inside every bench run on a noisy single
shared core. This tool measures it ONCE in a quiet, CPU-only process
(median of N reps, spread printed) and records it under
BASELINE.json["measured_baselines"][config_key]; bench.py then prefers
the pinned number and reports its own live measurement as a drift check.

Usage (TPU idle — this is CPU-heavy):
    python tools/pin_baseline.py [reps]
    # env: BENCH_DOCS/BENCH_QUERIES/BENCH_K/BENCH_CORPUS/BENCH_CACHE as bench.py

Writes the JSON entry and prints one JSON line with the pinned record.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # never touch the TPU

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    corpus_kind = os.environ.get("BENCH_CORPUS", "zipf")
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    n_docs = int(os.environ.get("BENCH_DOCS", 0)) or bench._default_docs(
        cache_dir, corpus_kind
    )
    n_queries = int(os.environ.get("BENCH_QUERIES", 512))
    k = int(os.environ.get("BENCH_K", 100))

    from rucene_tpu import IndexSearcher
    from rucene_tpu.codec import files as segfiles
    from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
    from rucene_tpu.search.scalar_engine import ScalarSearcher
    from rucene_tpu.store.directory import FSDirectory

    seg_name = f"bench-{corpus_kind}-{n_docs}"
    packed = segfiles.read_segment(FSDirectory(cache_dir), seg_name)
    if corpus_kind == "pytext":
        texts, vocab, probs = bench.build_corpus_pytext(min(n_docs, 200_000))
        phrase_texts = texts[:5000]
    else:
        vocab, probs = bench.zipf_vocab()
        phrase_texts, _, _ = bench.build_corpus(2000, seed=77)
    queries = bench.build_queries(
        n_queries, vocab, probs, phrase_texts=phrase_texts
    )
    reader = IndexReader([SegmentSnapshot("bench", packed)])
    searcher = IndexSearcher(reader)
    leaf = reader.leaves[0]
    rqs = [q.rewrite() for q in queries]
    doc_freqs, stats = searcher._gather_stats(rqs)
    sc = ScalarSearcher(leaf, searcher.similarity, stats, doc_freqs)
    sc.search_batch(rqs, k=k)  # warm pass (page-fault discipline)
    times = []
    for _ in range(reps):
        t0 = time.time()
        sc.search_batch(rqs, k=k)
        times.append(time.time() - t0)
    med = float(np.median(times))
    qps = round(n_queries / med, 1)
    key = f"{corpus_kind}-{n_docs}-k{k}-q{n_queries}"
    rec = {
        "qps": qps,
        "method": f"median of {reps} reps, quiet CPU-only process, "
        f"spread {min(times):.2f}-{max(times):.2f}s",
        "log": f"exp/logs/pin_baseline_{key}.log",
        "date": "2026-08-20",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE.json")
    data = json.load(open(path))
    data.setdefault("measured_baselines", {})[key] = rec
    json.dump(data, open(path, "w"), indent=2)
    print(json.dumps({"pinned": key, **rec}))


if __name__ == "__main__":
    main()
