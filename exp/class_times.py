"""Per-query-class device cost at 1M docs on the real chip.

Times homogeneous batches (term-only / OR-only / AND-only / phrase-only)
through search_batch, so each executor program's cost is attributed
separately, and prints one JSON line per class plus a postings-bandwidth
estimate (bytes of decoded postings touched / wall time vs the chip's
~819 GB/s HBM peak — VERDICT r3 weak #9).

Usage:
  python exp/class_times.py [batch] [k]          # measure + print
  python exp/class_times.py --assert [tol]       # regression guard:
      fail (exit 1) if any class is > tol (default 15%) slower than the
      best committed numbers in exp/class_times_best.json; on pure
      improvement, rewrite that file (commit it with the change).
"""

import json
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
from rucene_tpu.util.metrics import METRICS  # noqa: E402

BEST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "class_times_best.json")
HBM_PEAK_GBPS = 819.0  # v5e chip HBM bandwidth


def measure(batch: int, k: int):
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

    out = {}
    for name, qs in classes.items():
        searcher.search_batch(qs, k=k)  # warm/compile
        c0 = METRICS.snapshot()["counters"]
        lanes0 = c0.get("search.flat_lanes", 0)
        pb0 = c0.get("search.plane_bytes", 0)
        t0 = time.time()
        reps = 0
        while time.time() - t0 < 4.0 or reps < 2:
            searcher.search_batch(qs, k=k)
            reps += 1
            if reps >= 30:
                break
        per = (time.time() - t0) / reps
        c1 = METRICS.snapshot()["counters"]
        lanes = (c1.get("search.flat_lanes", 0) - lanes0) / reps
        pbytes = (c1.get("search.plane_bytes", 0) - pb0) / reps
        # decoded-residency lane = i32 doc + u16 freq + f32 cval = 10 B;
        # plane traffic (tf/position/denominator planes) counted in bytes
        total_b = lanes * 10 + pbytes
        gbps = total_b / per / 1e9
        out[name] = dict(ms=per * 1000, qps=batch / per, lanes=lanes,
                         plane_mb=pbytes / 1e6,
                         gbps=gbps, hbm_frac=gbps / HBM_PEAK_GBPS)
        print(f"CLASS {name}: {per*1000:.0f} ms/batch of {batch} "
              f"({batch/per:.0f} qps serial) "
              f"postings={lanes*10/1e6:.0f}MB planes={pbytes/1e6:.0f}MB "
              f"{gbps:.1f}GB/s "
              f"({100*gbps/HBM_PEAK_GBPS:.1f}% HBM)", flush=True)
    print(json.dumps({"batch": batch, "k": k, "n_docs": n_docs,
                      "classes": {c: round(v["ms"], 1) for c, v in out.items()}}),
          flush=True)
    return out


def main():
    args = [a for a in sys.argv[1:] if a != "--assert"]
    do_assert = "--assert" in sys.argv[1:]
    batch = int(args[0]) if len(args) > 0 and not do_assert else 256
    tol = float(args[0]) if (do_assert and args) else 0.15
    k = int(args[1]) if len(args) > 1 else 100
    out = measure(batch, k)
    if not do_assert:
        return
    best = {}
    if os.path.exists(BEST_PATH):
        best = json.load(open(BEST_PATH))
    failed = []
    improved = False
    merged = dict(best)
    for name, v in out.items():
        b = best.get(name)
        if b is not None and v["ms"] > b * (1 + tol):
            failed.append(f"{name}: {v['ms']:.0f}ms vs best {b:.0f}ms "
                          f"(+{100*(v['ms']/b-1):.0f}%)")
        if b is None or v["ms"] < b:
            merged[name] = round(v["ms"], 1)
            improved = True
    if failed:
        print("REGRESSION: " + "; ".join(failed), flush=True)
        sys.exit(1)
    if improved:
        json.dump(merged, open(BEST_PATH, "w"), indent=1)
        print(f"updated {BEST_PATH}: {merged}", flush=True)
    print("class-times OK (within tolerance of best)", flush=True)


if __name__ == "__main__":
    main()
