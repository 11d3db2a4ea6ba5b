"""Headline benchmark: batched BM25 search QPS on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.json configs 1-2 analog until real corpora land):
synthetic Zipf corpus, mixed query set (50% single-term, 25% OR-pair,
25% AND-pair), BM25 top-100, batched dispatch.

vs_baseline: the reference publishes no numbers (BASELINE.md) and rucene
cannot be built here (no Rust toolchain in the image), so the ratio is
measured against this repo's own single-query-at-a-time numpy host engine
(search/host_engine.py) running the identical workload on one CPU core — an
optimistic stand-in for a scalar CPU engine; the rucene comparison has to be
run outside this sandbox.

Env knobs: BENCH_DOCS (default 50000), BENCH_QUERIES (512), BENCH_BATCH
(256), BENCH_K (100), BENCH_CORPUS ("zipf" | "pytext" — real English text
harvested from installed-package docstrings/comments), BENCH_CACHE (dir:
reuse the packed index across runs — the sandbox charges ~0.5ms per fresh
memory page, so rebuilding a 1M+-doc index costs tens of minutes of page
faults, dwarfing the actual pack compute).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def zipf_vocab(vocab_size: int = 20000):
    """The analytic Zipf unigram model the synthetic corpus draws from —
    query construction needs only this, not the text."""
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()
    vocab = np.array([f"w{i}" for i in range(vocab_size)])
    return vocab, probs


def build_corpus(n_docs: int, vocab_size: int = 20000, seed: int = 7):
    rng = np.random.default_rng(seed)
    vocab, probs = zipf_vocab(vocab_size)
    lengths = rng.integers(8, 64, size=n_docs)
    token_ids = rng.choice(vocab_size, size=int(lengths.sum()), p=probs)
    texts = []
    off = 0
    for n in lengths:
        texts.append(" ".join(vocab[token_ids[off : off + n]]))
        off += n
    return texts, vocab, probs


def build_corpus_pytext(n_docs: int, seed: int = 7):
    """Real-text corpus: docstring/comment/identifier passages harvested
    from installed Python packages (the largest natural-text source in the
    sandbox — no network egress). Passages of 15-60 tokens, lowercased
    alphanumeric terms; vocabulary and unigram stats measured from the
    harvested text so query sampling works like the Zipf path."""
    import re
    import sys

    rng = np.random.default_rng(seed)
    word_re = re.compile(r"[a-zA-Z][a-zA-Z0-9_]{1,30}")
    texts: list[str] = []
    cur: list[str] = []
    roots = [
        p
        for p in sys.path
        if p.endswith("site-packages") or p.endswith("dist-packages")
    ] or ["/opt/venv/lib/python3.12/site-packages"]

    def py_files():  # lazy walk: stop as soon as enough text is harvested
        for r in roots:
            for dirpath, dirnames, filenames in os.walk(r):
                dirnames.sort()
                for fn in sorted(filenames):
                    if fn.endswith(".py"):
                        yield os.path.join(dirpath, fn)

    target_len = int(rng.integers(15, 60))
    for path in py_files():
        try:
            with open(path, errors="ignore") as f:
                data = f.read()
        except OSError:
            continue
        for w in word_re.findall(data):
            cur.append(w.lower())
            if len(cur) >= target_len:
                texts.append(" ".join(cur))
                cur = []
                target_len = int(rng.integers(15, 60))
                if len(texts) >= n_docs:
                    break
        if len(texts) >= n_docs:
            break
    if len(texts) < n_docs:  # wrap around for very large corpora
        base = list(texts)
        while len(texts) < n_docs and base:
            texts.append(base[len(texts) % len(base)])
    # measured unigram stats over a sample for query construction
    from collections import Counter

    counts = Counter()
    for t in texts[:: max(1, len(texts) // 200_000)]:
        counts.update(t.split())
    vocab_counts = counts.most_common()
    vocab = np.array([w for w, _ in vocab_counts])
    freqs = np.array([c for _, c in vocab_counts], np.float64)
    probs = freqs / freqs.sum()
    return texts, vocab, probs


def build_queries(n_queries: int, vocab, probs, seed: int = 13):
    from rucene_tpu import BooleanQuery, Term, TermQuery

    rng = np.random.default_rng(seed)
    # query terms drawn from the mid-frequency band (like real query logs)
    band = np.arange(10, min(5000, len(vocab)))
    band_p = probs[band] / probs[band].sum()
    queries = []
    for i in range(n_queries):
        kind = i % 4
        t1 = vocab[rng.choice(band, p=band_p)]
        t2 = vocab[rng.choice(band, p=band_p)]
        if kind in (0, 1):
            queries.append(TermQuery(Term("body", t1)))
        elif kind == 2:
            q = BooleanQuery()
            q.should(TermQuery(Term("body", t1)))
            q.should(TermQuery(Term("body", t2)))
            queries.append(q)
        else:
            q = BooleanQuery()
            q.must(TermQuery(Term("body", t1)))
            q.must(TermQuery(Term("body", t2)))
            queries.append(q)
    return queries



def _enable_compile_cache():
    """Persistent XLA compilation cache: executor shapes recompile across
    processes otherwise (~1-5 min per shape over the TPU tunnel)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()


def main():
    n_docs = int(os.environ.get("BENCH_DOCS", 50000))
    n_queries = int(os.environ.get("BENCH_QUERIES", 512))
    batch = int(os.environ.get("BENCH_BATCH", 256))
    k = int(os.environ.get("BENCH_K", 100))
    prune = os.environ.get("BENCH_PRUNE", "0") == "1"

    from rucene_tpu import Document, IndexSearcher, TextField
    from rucene_tpu.codec.postings import pack_segment
    from rucene_tpu.index.memory import SegmentBuffer
    from rucene_tpu.index.reader import IndexReader, SegmentSnapshot

    corpus_kind = os.environ.get("BENCH_CORPUS", "zipf")
    # default cache: cold index builds cost minutes of page faults in this
    # sandbox (CLAUDE.md); BENCH_CACHE= (empty) disables
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")

    def log(msg):
        print(f"# {msg}", flush=True, file=__import__("sys").stderr)

    t0 = time.time()
    packed = None
    seg_name = f"bench-{corpus_kind}-{n_docs}"
    if cache_dir:
        from rucene_tpu.codec import files as segfiles
        from rucene_tpu.store.directory import FSDirectory

        os.makedirs(cache_dir, exist_ok=True)
        cdir = FSDirectory(cache_dir)
        if cdir.file_exists(segfiles.segment_file(seg_name)):
            log(f"loading cached index {seg_name} from {cache_dir}")
            packed = segfiles.read_segment(cdir, seg_name)
    if corpus_kind == "pytext":
        texts, vocab, probs = (None, None, None)
        if packed is None:
            texts, vocab, probs = build_corpus_pytext(n_docs)
        else:  # vocab stats only (cheap) for query construction
            texts, vocab, probs = build_corpus_pytext(min(n_docs, 200_000))
    elif packed is not None:
        texts = []  # cached index: queries need only the analytic vocab
        vocab, probs = zipf_vocab()
    else:
        texts, vocab, probs = build_corpus(n_docs)
    queries = build_queries(n_queries, vocab, probs)
    log(f"corpus ready ({time.time()-t0:.0f}s)")

    if packed is None:
        buf = SegmentBuffer()
        docs = []
        for t in texts:
            d = Document()
            d.add(TextField("body", t))
            docs.append(d)
        buf.add_documents_bulk(docs)  # C++ inverter, one GIL release
        del docs
        log(f"inverted ({time.time()-t0:.0f}s)")
        packed = pack_segment(buf.finish())
        log(f"packed ({time.time()-t0:.0f}s)")
        if cache_dir:
            from rucene_tpu.codec import files as segfiles
            from rucene_tpu.store.directory import FSDirectory

            segfiles.write_segment(FSDirectory(cache_dir), seg_name, packed)
            log(f"cached to {cache_dir}")
    reader = IndexReader([SegmentSnapshot("bench", packed)])
    searcher = IndexSearcher(reader)
    build_s = time.time() - t0
    log(f"index ready ({build_s:.0f}s), searching")

    # warmup (compile every batch's shape bucket) then timed batched runs
    for i in range(0, n_queries, batch):
        searcher.search_batch(queries[i : i + batch], k=k, prune=prune)
    t1 = time.time()
    reps = 0
    while time.time() - t1 < 5.0 or reps < 3:
        for i in range(0, n_queries, batch):
            searcher.search_batch(queries[i : i + batch], k=k, prune=prune)
        reps += 1
        if reps >= 20:
            break
    qps = (reps * n_queries) / (time.time() - t1)

    # single-core scalar baseline proxy on a query sample
    from rucene_tpu.search import host_engine

    sample = queries[:: max(1, n_queries // 32)][:32]
    rqs = [q.rewrite() for q in sample]
    doc_freqs, stats = searcher._gather_stats(rqs)
    leaf = reader.leaves[0]
    t2 = time.time()
    for rq in rqs:
        host_engine.execute_on_segment(leaf, rq, searcher.similarity, stats, doc_freqs, k)
    base_qps = len(sample) / (time.time() - t2)

    result = {
        "metric": f"BM25 top-{k} QPS, {n_docs} docs, mixed term/bool batch={batch}"
        + (" +prune" if prune else ""),
        "value": round(qps, 1),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / base_qps, 2),
    }
    print(json.dumps(result))
    # context lines on stderr so the JSON line stays clean
    import sys

    print(
        f"# index build: {build_s:.1f}s ({n_docs / build_s:.0f} docs/s), "
        f"index {packed.index_bytes() / 1e6:.1f} MB, "
        f"baseline(single-core numpy engine): {base_qps:.1f} qps",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
