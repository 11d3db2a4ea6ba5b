"""Where do phrase-class milliseconds go at 1M docs?

Decomposes the 623 ms/batch-of-256 phrase number (exp/logs/class_times_planes1.log)
into: route mix (candidate/plane/scalar rows), plane-build cost (cold vs
steady-state rebuilds), the plane search kernel alone (cached planes), and
the top-k stage alone. Run on the real chip, one process at a time.

Usage: python exp/phrase_parts.py [batch] [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

if os.environ.get("BENCH_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rucene_tpu import IndexSearcher, PhraseQuery  # noqa: E402
from rucene_tpu.codec import files as segfiles  # noqa: E402
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot  # noqa: E402
from rucene_tpu.store.directory import FSDirectory  # noqa: E402
from rucene_tpu.util.metrics import METRICS  # noqa: E402


def counters():
    return dict(METRICS.snapshot()["counters"])


def delta(a, b, key):
    return b.get(key, 0) - a.get(key, 0)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    n_docs = int(os.environ.get("BENCH_DOCS", 1_000_000))
    packed = segfiles.read_segment(FSDirectory(cache_dir), f"bench-zipf-{n_docs}")
    reader = IndexReader([SegmentSnapshot("bench", packed)])
    searcher = IndexSearcher(reader)
    leaf = reader.leaves[0]

    phrase_texts, _, _ = bench.build_corpus(2000, seed=77)
    bigrams = bench.sample_bigrams(phrase_texts, batch)
    qs = [PhraseQuery("body", list(bigrams[i % len(bigrams)])) for i in range(batch)]
    terms = sorted({t for bg in bigrams for t in bg})
    dfs = [leaf.term_record("body", t).doc_freq if leaf.term_record("body", t) else 0
           for t in terms]
    print(f"{len(bigrams)} bigrams, {len(terms)} distinct terms; "
          f"df p50={int(np.median(dfs))} p90={int(np.percentile(dfs, 90))} "
          f"max={max(dfs)}", flush=True)
    from rucene_tpu.ops.phrase_plane import WORDS
    md = int(leaf.device.live.shape[0])
    plane_mb = md * (WORDS * 4 + 1) / 1e6
    budget = searcher._plane_budget_bytes(leaf)
    print(f"plane={plane_mb:.0f}MB x {len(terms)} terms = "
          f"{plane_mb*len(terms)/1e3:.1f}GB; budget={budget>>20}MB "
          f"(fits={plane_mb*1e6*len(terms) < budget})", flush=True)

    # --- full batch: cold then steady-state, with route counters ---
    c0 = counters()
    t0 = time.time()
    searcher.search_batch(qs, k=k)
    cold = time.time() - t0
    c1 = counters()
    times = []
    for _ in range(5):
        t0 = time.time()
        searcher.search_batch(qs, k=k)
        times.append(time.time() - t0)
    c2 = counters()
    warm = min(times)
    reps = 5
    print(f"full batch: cold={cold*1000:.0f}ms warm(best of 5)={warm*1000:.0f}ms",
          flush=True)
    for key in ("search.phrase_device", "search.phrase_plane",
                "search.phrase_plane_build", "search.phrase_host_fallback",
                "search.phrase_scalar_route"):
        print(f"  route {key}: cold={delta(c0, c1, key)} "
              f"steady={delta(c1, c2, key)/reps:.1f}/batch", flush=True)

    # --- plane search kernel alone, planes pre-cached ---
    sim = searcher.similarity
    rqs = [searcher._plan_for(q).rq for q in qs]
    doc_freqs, stats = searcher._gather_stats(rqs)
    # build all planes first (measures build throughput too)
    t0 = time.time()
    built = 0
    for t in terms:
        got = searcher._phrase_plane_for(leaf, "body", t)
        if got is not None:
            built += 1
    jax.block_until_ready(got[0])
    t_build = time.time() - t0
    print(f"plane build: {built} terms in {t_build*1000:.0f}ms "
          f"({t_build*1000/max(built,1):.1f} ms/term)", flush=True)

    rows = list(range(batch))
    t0 = time.time()
    done, spill = searcher._search_phrase_planes(
        leaf, rows, rqs, sim, stats, doc_freqs, k
    )
    t_planes = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        done, spill = searcher._search_phrase_planes(
            leaf, rows, rqs, sim, stats, doc_freqs, k
        )
        times.append(time.time() - t0)
    print(f"plane search (all {batch} rows, cached planes): "
          f"first={t_planes*1000:.0f}ms warm={min(times)*1000:.0f}ms "
          f"done={len(done)} spill={len(spill)}", flush=True)

    # --- top-k stage alone at the plane chunk shape ---
    from rucene_tpu.ops.topk import topk_score_doc
    chunk = min(64, batch)
    x = jnp.asarray(np.random.default_rng(0).random((chunk, md), np.float32))
    topk_score_doc(x, k)  # compile
    t0 = time.time()
    for _ in range(5):
        r = topk_score_doc(x, k)
    jax.block_until_ready(r)
    print(f"topk_score_doc [{chunk},{md}] k={k}: {(time.time()-t0)/5*1000:.1f} ms",
          flush=True)

    # --- raw 2-term AND+popcount+score, no per-row python, planes stacked ---
    t_list = [searcher._phrase_plane_for(leaf, "body", t) for t in terms[:2 * chunk]]
    t_list = [p for p in t_list if p is not None]
    if len(t_list) >= 2 * chunk:
        a = jnp.stack([p[0] for p in t_list[:chunk]])        # [R, md, W]
        b = jnp.stack([p[0] for p in t_list[chunk:2 * chunk]])

        @jax.jit
        def fused(a, b):
            nxt = jnp.concatenate(
                [b[:, :, 1:], jnp.zeros((b.shape[0], b.shape[1], 1), b.dtype)],
                axis=2,
            )
            sb = (b >> jnp.uint32(1)) | (nxt << jnp.uint32(31))
            acc = a & sb
            pf = jnp.sum(jax.lax.population_count(acc), axis=2).astype(jnp.float32)
            return topk_score_doc(jnp.where(pf > 0, pf, -jnp.inf), k)

        fused(a, b)
        t0 = time.time()
        for _ in range(5):
            r = fused(a, b)
        jax.block_until_ready(r)
        per = (time.time() - t0) / 5
        gb = 2 * a.size * 4 / 1e9
        print(f"fused stacked AND+popcnt+topk [{chunk} rows]: {per*1000:.1f} ms "
              f"({gb/per:.0f} GB/s of {gb:.1f} GB)", flush=True)


if __name__ == "__main__":
    main()
