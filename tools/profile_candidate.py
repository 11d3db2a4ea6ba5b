"""Stage-level profiling of the executor at large corpus sizes (real TPU).

Builds (or loads from .benchcache/) the bench corpus index, assembles one
representative 256-query flat work list, and times each executor stage so
optimization effort lands where the time goes.

Usage: python tools/profile_candidate.py [n_docs]
Env: PROF_STAGES=decode,scatter,topk,dense,candidate (default all)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchcache")


def load_or_build(n_docs: int):
    from bench import build_corpus

    from rucene_tpu.codec.files import read_segment, write_segment
    from rucene_tpu.codec.postings import pack_segment
    from rucene_tpu.index.memory import SegmentBuffer
    from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
    from rucene_tpu.store.directory import FSDirectory

    os.makedirs(CACHE_DIR, exist_ok=True)
    d = FSDirectory(CACHE_DIR)
    name = f"bench{n_docs}"
    try:
        packed = read_segment(d, name)
        print(f"# loaded cached segment {name}", file=sys.stderr)
    except Exception:
        t0 = time.time()
        texts, vocab, probs = build_corpus(n_docs)
        buf = SegmentBuffer()
        from rucene_tpu import Document, TextField

        for t in texts:
            doc = Document()
            doc.add(TextField("body", t))
            buf.add_document(doc)
        packed = pack_segment(buf.finish())
        write_segment(d, name, packed)
        print(f"# built + cached segment in {time.time() - t0:.0f}s", file=sys.stderr)
    return IndexReader([SegmentSnapshot(name, packed)])


def timeit(fn, reps=3, warmup=1):
    import jax

    for _ in range(warmup):
        r = fn()
        jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    # candidate excluded by default: at L=33.5M lanes its XLA program
    # OOM-kills the axon compile helper (SIGKILL) — opt in explicitly
    stages = os.environ.get("PROF_STAGES", "decode,scatter,topk,dense").split(",")

    import jax
    import jax.numpy as jnp

    from bench import build_corpus, build_queries

    from rucene_tpu import IndexSearcher
    from rucene_tpu.ops.topk import topk_score_doc
    from rucene_tpu.search.executor import (
        FlatQueryBatch,
        decode_score_lanes,
        execute_flat,
    )
    from rucene_tpu.search.searcher import (
        build_clause_tables,
        build_flat_work,
        build_leaf_cache,
        build_leaf_tables,
    )

    reader = load_or_build(n_docs)
    _, vocab, probs = build_corpus(64)  # vocab/probs only (cheap)
    queries = build_queries(256, vocab, probs)
    searcher = IndexSearcher(reader)
    rqs = [q.rewrite() for q in queries]
    doc_freqs, stats = searcher._gather_stats(rqs)
    b_pad, t_pad = 256, 2
    weight, occur, n_required, min_should, _, _ = build_clause_tables(
        rqs, searcher.similarity, doc_freqs, stats, b_pad, t_pad
    )
    leaf = reader.leaves[0]
    cache = build_leaf_cache(leaf, searcher.similarity, stats)
    bs, bc, fid = build_leaf_tables(leaf, rqs, b_pad, t_pad)
    work = build_flat_work(bs, bc, weight, fid, occur)
    wi_block, wi_row, wi_weight, wi_fid, wi_enc, wi_valid, n_items = work[:7]
    w = len(wi_block)
    md = leaf.device.max_doc_padded
    b = b_pad
    print(
        f"# n_docs={n_docs} md={md} W(pad)={w} items={n_items} "
        f"L={w * 128} b*md={b * md} 12L={12 * w * 128} "
        f"branch={'dense' if b * md <= 12 * w * 128 else 'candidate'}",
        file=sys.stderr,
    )
    fq = jax.device_put(
        FlatQueryBatch(
            wi_block=jnp.asarray(wi_block),
            wi_row=jnp.asarray(wi_row),
            wi_weight=jnp.asarray(wi_weight),
            wi_fid=jnp.asarray(wi_fid),
            wi_enc=jnp.asarray(wi_enc),
            wi_valid=jnp.asarray(wi_valid),
            n_required=jnp.asarray(n_required),
            min_should=jnp.asarray(min_should),
            cache=jnp.asarray(cache),
        )
    )
    dev = leaf.device
    use_pallas = jax.default_backend() not in ("cpu",)

    class _Results(dict):
        def __setitem__(self, key, val):  # print as soon as each stage lands
            print(f"{key:28s} {val * 1e3:9.1f} ms", flush=True)
            super().__setitem__(key, val)

    results = _Results()

    if "decode" in stages:
        f = jax.jit(
            lambda dv, q: [x.sum() for x in decode_score_lanes(dv, q, use_pallas)[:3]]
        )
        results["decode+score"] = timeit(lambda: f(dev, fq))

    if "scatter" in stages:

        @jax.jit
        def scat(dv, q):
            target, rows, sc, valid = decode_score_lanes(dv, q, use_pallas)
            acc = jnp.zeros((b, md), jnp.float32).at[rows, target].add(sc, mode="drop")
            return acc

        acc_out = scat(dev, fq)
        jax.block_until_ready(acc_out)
        results["decode+scatter_score"] = timeit(lambda: scat(dev, fq))

        @jax.jit
        def scat2(dv, q):
            target, rows, sc, valid = decode_score_lanes(dv, q, use_pallas)
            inc = jnp.where(valid, q.wi_enc[:, None], 0)
            acc = jnp.zeros((b, md), jnp.int32).at[rows, target].add(inc, mode="drop")
            return acc

        results["decode+scatter_counts"] = timeit(lambda: scat2(dev, fq))

        if "topk" in stages:
            scores_in = jnp.where(acc_out > 0, acc_out, -jnp.inf)
            scores_in = jax.device_put(scores_in)
            tk = jax.jit(lambda s: topk_score_doc(s, 100))
            results["topk_dense[B,md]"] = timeit(lambda: tk(scores_in))
            tk1 = jax.jit(lambda s: jax.lax.top_k(s, 100))
            results["lax.top_k[B,md]"] = timeit(lambda: tk1(scores_in))

    if "dense" in stages:
        results["full_dense"] = timeit(
            lambda: execute_flat(dev, fq, k=100, use_pallas=use_pallas, strategy="dense")
        )
    if "candidate" in stages:
        results["full_candidate"] = timeit(
            lambda: execute_flat(
                dev, fq, k=100, use_pallas=use_pallas, strategy="candidate"
            )
        )

    print("# done", flush=True)


if __name__ == "__main__":
    main()
