"""Serving-loop A/B at 1M docs on the real chip: batch size x pipeline
depth x kernel knobs, one process (shapes compile once each).

Usage: python exp/serving_ab.py [configs...]
  config tokens: b256d2  b512d2  b256d3  b1024d2  b256d2:nocombine ...
Defaults to a sweep. Prints one line per config: qps + per-path timers.
"""

import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

if os.environ.get("BENCH_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from rucene_tpu import IndexSearcher  # noqa: E402
from rucene_tpu.codec import files as segfiles  # noqa: E402
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot  # noqa: E402
from rucene_tpu.store.directory import FSDirectory  # noqa: E402
from rucene_tpu.util.metrics import METRICS  # noqa: E402


def run_config(searcher, queries, batch: int, depth: int, k: int,
               seconds: float = 5.0, knobs: dict | None = None) -> float:
    knobs = knobs or {}
    saved = {}
    for kk, v in knobs.items():
        saved[kk] = os.environ.get(kk)
        os.environ[kk] = v
    try:
        n = len(queries)
        # warm every shape bucket
        for i in range(0, n, batch):
            searcher.search_batch(queries[i : i + batch], k=k)
        warm = METRICS.snapshot()
        t1 = time.time()
        reps = 0
        pending: deque = deque()
        while time.time() - t1 < seconds or reps < 2:
            for i in range(0, n, batch):
                pending.append(
                    searcher.search_batch_async(queries[i : i + batch], k=k)
                )
                while len(pending) >= depth:
                    pending.popleft()()
            reps += 1
            if reps >= 40:
                break
        while pending:
            pending.popleft()()
        qps = (reps * n) / (time.time() - t1)
        full = METRICS.snapshot()
        wt = warm["timers"]
        timers = sorted(
            (
                (name, t["total_s"] - wt.get(name, {}).get("total_s", 0.0),
                 t["count"] - wt.get(name, {}).get("count", 0))
                for name, t in full["timers"].items()
            ),
            key=lambda kv: -kv[1],
        )[:6]
        tstr = " ".join(f"{nm}={tot:.2f}s/{c}" for nm, tot, c in timers if c)
        nb = reps * (n // batch)
        print(f"CONFIG b{batch} d{depth} {knobs or ''}: {qps:.0f} qps "
              f"({nb} batches)  {tstr}", flush=True)
        return qps
    finally:
        for kk, v in saved.items():
            if v is None:
                os.environ.pop(kk, None)
            else:
                os.environ[kk] = v


def main():
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    n_docs = int(os.environ.get("BENCH_DOCS", 1_000_000))
    seg_name = f"bench-zipf-{n_docs}"
    packed = segfiles.read_segment(FSDirectory(cache_dir), seg_name)
    reader = IndexReader([SegmentSnapshot("bench", packed)])
    searcher = IndexSearcher(reader)
    vocab, probs = bench.zipf_vocab()
    phrase_texts, _, _ = bench.build_corpus(2000, seed=77)
    n_queries = int(os.environ.get("BENCH_QUERIES", 1024))
    queries = bench.build_queries(n_queries, vocab, probs, phrase_texts=phrase_texts)
    k = int(os.environ.get("BENCH_K", 100))

    configs = sys.argv[1:] or ["b256d2", "b256d3", "b512d2", "b512d3", "b1024d2"]
    for cfg in configs:
        base, _, knobstr = cfg.partition(":")
        b, d = base[1:].split("d")
        knobs = {}
        if "nocombine" in knobstr:
            knobs["RUCENE_NO_COMBINE"] = "1"
        if "dedup" in knobstr:
            knobs["RUCENE_DEDUP"] = "1"
        run_config(searcher, queries, int(b), int(d), k, knobs=knobs)


if __name__ == "__main__":
    main()
