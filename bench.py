"""Headline benchmark: batched BM25 search QPS on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.json configs 1-2 analog): synthetic Zipf corpus, mixed
query set (37.5% single-term, 25% OR-pair, 25% AND-pair, 12.5% exact
2-term phrase), BM25 top-100, batched dispatch. Defaults to the largest
cached corpus available (1M docs; falls back to 50K when no cache exists)
so the recorded number represents the engine's serving regime, not its
worst one.

vs_baseline: rucene itself cannot be built here (no Rust toolchain in the
image), so the denominator is a faithful scalar CPU engine reproducing the
reference's hot loops — 128-doc block decode, skip-list advance,
doc-at-a-time conjunction/disjunction, heap top-k, exact-phrase position
verify — in C++ on one core over the SAME packed index
(native/scalar_engine.cpp; parity-tested in tests/test_scalar_engine.py).
BENCH_BASELINE=numpy switches back to the old dense-numpy host engine.

Env knobs: BENCH_DOCS (default: largest cached, else 50000), BENCH_QUERIES (512), BENCH_BATCH
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


def sample_bigrams(texts, n: int, seed: int = 77) -> list[tuple[str, str]]:
    """Consecutive word pairs for phrase queries, drawn from corpus text.
    When only the analytic Zipf model is available (cached index, no text),
    callers pass freshly sampled distributionally-identical docs — bigram
    hit statistics match the real corpus by construction."""
    rng = np.random.default_rng(seed)
    out = []
    if not texts:
        return out
    for _ in range(n * 4):
        words = texts[int(rng.integers(0, len(texts)))].split()
        if len(words) < 2:
            continue
        j = int(rng.integers(0, len(words) - 1))
        out.append((words[j], words[j + 1]))
        if len(out) >= n:
            break
    return out


def build_queries(n_queries: int, vocab, probs, seed: int = 13, phrase_texts=None):
    from rucene_tpu import BooleanQuery, PhraseQuery, Term, TermQuery

    rng = np.random.default_rng(seed)
    # query terms drawn from the mid-frequency band (like real query logs)
    band = np.arange(10, min(5000, len(vocab)))
    band_p = probs[band] / probs[band].sum()
    bigrams = sample_bigrams(phrase_texts or [], (n_queries + 7) // 8)
    queries = []
    bi = 0
    for i in range(n_queries):
        kind = i % 8
        t1 = vocab[rng.choice(band, p=band_p)]
        t2 = vocab[rng.choice(band, p=band_p)]
        if kind == 7 and bigrams:
            w1, w2 = bigrams[bi % len(bigrams)]
            bi += 1
            queries.append(PhraseQuery("body", [w1, w2]))
        elif kind in (0, 1, 2):
            queries.append(TermQuery(Term("body", t1)))
        elif kind in (3, 4):
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



def pack_corpus(texts, log=lambda m: None):
    """Shared cold-build path (bench main + tools/build_bench_cache.py):
    texts -> SegmentBuffer -> pack_segment. One definition so a pre-built
    cache can never silently diverge from what the bench would build."""
    from rucene_tpu import Document, TextField
    from rucene_tpu.codec.postings import pack_segment
    from rucene_tpu.index.memory import SegmentBuffer

    buf = SegmentBuffer()
    docs = []
    for t in texts:
        d = Document()
        d.add(TextField("body", t))
        docs.append(d)
    buf.add_documents_bulk(docs)  # C++ inverter, one GIL release
    del docs
    log("inverted")
    packed = pack_segment(buf.finish())
    log("packed")
    return packed


def cache_segment(cache_dir: str, seg_name: str, packed) -> None:
    """Atomically publish a packed index into the bench cache: write under
    the FINAL name in a temp subdirectory (the CRC header embeds the file
    name, so a temp *name* would fail the read-side check), then os.replace
    into place. An interrupted minutes-long build must never leave a torn
    .seg that later runs treat as valid."""
    import shutil

    from rucene_tpu.codec import files as segfiles
    from rucene_tpu.store.directory import FSDirectory

    fname = segfiles.segment_file(seg_name)
    tmp_dir = os.path.join(cache_dir, f".tmp-{os.getpid()}")
    os.makedirs(tmp_dir, exist_ok=True)
    try:
        segfiles.write_segment(FSDirectory(tmp_dir), seg_name, packed)
        os.replace(os.path.join(tmp_dir, fname), os.path.join(cache_dir, fname))
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)


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


def _default_docs(cache_dir: str, corpus_kind: str) -> int:
    """Largest cached corpus <= 1M (the driver's per-round budget), else
    50K (VERDICT r2: record the serving regime, not the worst one)."""
    import re

    best = 0
    if cache_dir and os.path.isdir(cache_dir):
        for fn in os.listdir(cache_dir):
            m = re.fullmatch(rf"bench-{corpus_kind}-(\d+)\.seg", fn)
            if m and int(m.group(1)) <= 1_000_000:
                best = max(best, int(m.group(1)))
    return best or 50000


def _maybe_cpu():
    if os.environ.get("BENCH_CPU") == "1":  # smoke-test escape hatch: the
        # sandbox force-overrides JAX_PLATFORMS, so flip it post-import
        import jax

        jax.config.update("jax_platforms", "cpu")
        return
    # fail FAST if the axon tunnel is down: backend init otherwise hangs
    # forever in a poll loop (observed 2026-08-17: >4h unresponsive)
    import sys
    import threading

    ok = threading.Event()

    def probe():
        import jax

        jax.devices()
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout=float(os.environ.get("BENCH_INIT_TIMEOUT", 900)))
    if not ok.is_set():
        print(
            "# FATAL: TPU backend did not initialize within the timeout "
            "(axon tunnel down?) — no benchmark result",
            file=sys.stderr,
            flush=True,
        )
        os._exit(3)


def main():
    _maybe_cpu()
    n_queries = int(os.environ.get("BENCH_QUERIES", 512))
    batch = int(os.environ.get("BENCH_BATCH", 256))
    k = int(os.environ.get("BENCH_K", 100))
    # tri-state: auto (default) lets the searcher engage WAND per batch;
    # 1/0 force it on/off for A/Bs
    _bp = os.environ.get("BENCH_PRUNE", "auto")
    prune = None if _bp in ("auto", "") else _bp == "1"

    from rucene_tpu import IndexSearcher
    from rucene_tpu.index.reader import IndexReader, SegmentSnapshot

    corpus_kind = os.environ.get("BENCH_CORPUS", "zipf")
    # default cache: cold index builds cost minutes of page faults in this
    # sandbox (CLAUDE.md); BENCH_CACHE= (empty) disables
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    n_docs = int(os.environ.get("BENCH_DOCS", 0)) or _default_docs(
        cache_dir, corpus_kind
    )

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
        phrase_texts = texts[:5000]
    elif packed is not None:
        texts = []  # cached index: queries need only the analytic vocab
        vocab, probs = zipf_vocab()
        # phrase bigrams from distributionally-identical fresh samples
        # (bigram-in-corpus statistics are seed-invariant)
        phrase_texts, _, _ = build_corpus(2000, seed=77)
    else:
        texts, vocab, probs = build_corpus(n_docs)
        phrase_texts = texts[:5000]
    queries = build_queries(n_queries, vocab, probs, phrase_texts=phrase_texts)
    log(f"corpus ready ({time.time()-t0:.0f}s)")

    if packed is None:
        packed = pack_corpus(texts, log=lambda m: log(f"{m} ({time.time()-t0:.0f}s)"))
        if cache_dir:
            cache_segment(cache_dir, seg_name, packed)
            log(f"cached to {cache_dir}")
    reader = IndexReader([SegmentSnapshot("bench", packed)])
    searcher = IndexSearcher(reader)
    build_s = time.time() - t0
    log(f"index ready ({build_s:.0f}s), searching")

    if os.environ.get("BENCH_PREWARM", "1") != "0":
        # pre-build the RESIDENT position-plane set OFF the serving path
        # (VERDICT r4 item 2a): batched multi-plane dispatches at load
        # time instead of 16-35s/term cold builds inside the first
        # batches (8.8M measurements, exp/logs/plane_build_probe.log).
        # Serving-time admission then never builds: resident terms hit
        # the cache, the rest ride the candidate/scalar paths.
        tw = time.time()
        n_planes = searcher.prewarm_phrase_planes()
        log(f"prewarmed {n_planes} phrase planes in {time.time()-tw:.0f}s")

    # warmup (compile every batch's shape bucket) then timed batched runs
    for i in range(0, n_queries, batch):
        searcher.search_batch(queries[i : i + batch], k=k, prune=prune)
    from rucene_tpu.util.metrics import METRICS

    warm_snap = METRICS.snapshot()  # subtract warmup compiles/plane builds
    # pipelined serving loop: keep BENCH_PIPELINE batches in flight so
    # batch N+1's host-side build overlaps batch N's device execution and
    # tunnel RTT (searcher.search_batch_async); 1 = fully serial
    from collections import deque

    depth = max(1, int(os.environ.get("BENCH_PIPELINE", 3)))
    t1 = time.time()
    reps = 0
    pending: deque = deque()
    while time.time() - t1 < 5.0 or reps < 3:
        for i in range(0, n_queries, batch):
            pending.append(
                searcher.search_batch_async(queries[i : i + batch], k=k, prune=prune)
            )
            while len(pending) >= depth:
                pending.popleft()()
        reps += 1
        if reps >= 20:
            break
    while pending:
        pending.popleft()()
    wall = time.time() - t1
    qps = (reps * n_queries) / wall

    # routing summary (VERDICT r2 item 10): rows per execution path +
    # fallback/pruning counters + per-path timers over the TIMED runs only
    # (warmup's compiles and plane builds would otherwise dominate)
    full = METRICS.snapshot()
    snap = full["counters"]
    warm_c = warm_snap["counters"]
    log(
        "routes: "
        + " ".join(
            f"{key.split('.', 1)[1]}={snap.get(key, 0) - warm_c.get(key, 0)}"
            for key in (
                "route.device", "route.phrase", "route.synonym", "route.host",
                "search.phrase_host_fallback", "search.phrase_plane_build",
                "search.phrase_plane_denied", "search.conj_pruned_blocks",
            )
        )
    )
    warm_t = warm_snap["timers"]
    timers = sorted(
        (
            (name, t["total_s"] - warm_t.get(name, {}).get("total_s", 0.0),
             t["count"] - warm_t.get(name, {}).get("count", 0))
            for name, t in full["timers"].items()
        ),
        key=lambda kv: -kv[1],
    )[:8]
    log(
        "timers(timed-only): "
        + " ".join(f"{name}={tot:.2f}s/{cnt}" for name, tot, cnt in timers if cnt)
    )

    # single-core scalar baseline: the faithful rucene-shaped C++ engine on
    # the identical workload (warm once — page-fault discipline — then time)
    leaf = reader.leaves[0]
    rqs = [q.rewrite() for q in queries]
    doc_freqs, stats = searcher._gather_stats(rqs)
    base_kind = os.environ.get("BENCH_BASELINE", "scalar")
    # VERDICT r4 item 7: vs_baseline swung ±18% on single-core host noise
    # when derived from one run's reps. Preferred source is a PINNED number
    # measured once in a quiet process (tools/pin_baseline.py) and recorded
    # in BASELINE.json under measured_baselines[config_key] with its log;
    # the live measurement below is the fallback + a drift check.
    pin_key = f"{corpus_kind}-{n_docs}-k{k}-q{n_queries}"
    pinned = None
    try:
        with open(os.path.join(os.path.dirname(__file__) or ".", "BASELINE.json")) as f:
            pinned = json.load(f).get("measured_baselines", {}).get(pin_key)
    except (OSError, json.JSONDecodeError):
        pass
    if base_kind == "scalar":
        try:
            from rucene_tpu.search.scalar_engine import ScalarSearcher

            sc = ScalarSearcher(leaf, searcher.similarity, stats, doc_freqs)
            sc.search_batch(rqs, k=k)  # warm pass
            # per-rep MEDIAN time: the sandbox's single shared core is noisy
            # (±40% rep-to-rep observed); the median is robust to both slow
            # outliers (which would flatter vs_baseline) and one lucky rep
            rep_times = []
            t2 = time.time()
            while time.time() - t2 < 10.0 or len(rep_times) < 5:
                r0 = time.time()
                sc.search_batch(rqs, k=k)
                rep_times.append(time.time() - r0)
                if len(rep_times) >= 9:
                    break
            base_qps = len(rqs) / float(np.median(rep_times))
            base_label = (
                f"single-core scalar C++ engine (median of {len(rep_times)} reps,"
                f" spread {min(rep_times):.2f}-{max(rep_times):.2f}s)"
            )
        except (RuntimeError, ValueError) as e:
            log(f"scalar baseline unavailable ({e}); falling back to numpy")
            base_kind = "numpy"
    if base_kind == "numpy":
        from rucene_tpu.search import host_engine

        sample = rqs[:: max(1, n_queries // 32)][:32]
        t2 = time.time()
        for rq in sample:
            host_engine.execute_on_segment(
                leaf, rq, searcher.similarity, stats, doc_freqs, k
            )
        base_qps = len(sample) / (time.time() - t2)
        base_label = "single-core numpy engine"
    if pinned:
        live_qps, base_qps = base_qps, float(pinned["qps"])
        base_label = (
            f"pinned {pinned['qps']} qps ({pinned.get('method', '?')}, "
            f"{pinned.get('log', '?')}); live measurement {live_qps:.1f} qps"
        )

    # postings-bandwidth accounting (VERDICT r3 weak #9): decoded lanes
    # touched by the term/bool executors (one lane = i32 doc + u16 freq +
    # f32 cval = 10 bytes) PLUS plane traffic (tf planes, phrase position
    # planes, denominator planes — VERDICT r4 weak #1: phrase used to read
    # as 0 MB) over the timed window. v5e HBM peak ~819 GB/s.
    lanes = snap.get("search.flat_lanes", 0) - warm_c.get("search.flat_lanes", 0)
    pbytes = snap.get("search.plane_bytes", 0) - warm_c.get(
        "search.plane_bytes", 0
    )
    total_bytes = lanes * 10 + pbytes
    postings_gbps = total_bytes / wall / 1e9
    bandwidth_frac = round(postings_gbps / 819.0, 4)
    log(
        f"postings traffic: {total_bytes / 1e9:.2f} GB "
        f"(lanes {lanes * 10 / 1e9:.2f} + planes {pbytes / 1e9:.2f}) "
        f"over {wall:.2f}s = "
        f"{postings_gbps:.1f} GB/s ({100 * bandwidth_frac:.1f}% of HBM peak)"
    )

    result = {
        "metric": f"BM25 top-{k} QPS, {n_docs} docs, "
        f"mixed term/bool/phrase batch={batch}"
        + (" +prune" if prune else ""),
        "value": round(qps, 1),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / base_qps, 2),
        "bandwidth_frac": bandwidth_frac,
    }
    print(json.dumps(result))
    # context lines on stderr so the JSON line stays clean
    import sys

    print(
        f"# index build: {build_s:.1f}s ({n_docs / build_s:.0f} docs/s), "
        f"index {packed.index_bytes() / 1e6:.1f} MB, "
        f"baseline({base_label}): {base_qps:.1f} qps",
        file=sys.stderr,
    )


def main_nrt():
    """BENCH_NRT=1: concurrent ingest + NRT refresh + batched search
    (BASELINE.json config 4 — 'NRT concurrent commit+search'). A writer
    thread adds docs and commits while the foreground searches through a
    SearcherManager refreshed every BENCH_NRT_REFRESH_S seconds; the JSON
    line reports steady-state QPS under ingest, with ingest docs/s and
    mean refresh latency on stderr."""
    import sys
    import threading

    _maybe_cpu()
    n_docs = int(os.environ.get("BENCH_DOCS", 0)) or 200_000
    n_queries = int(os.environ.get("BENCH_QUERIES", 256))
    batch = int(os.environ.get("BENCH_BATCH", 128))
    k = int(os.environ.get("BENCH_K", 100))
    refresh_s = float(os.environ.get("BENCH_NRT_REFRESH_S", 0.5))
    # long enough to amortize the one-time compile a first-seen merged-
    # segment size bucket costs (each bucket compiles once per process)
    duration = float(os.environ.get("BENCH_NRT_SECONDS", 45))

    from rucene_tpu import Document, IndexSearcher, TextField
    from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
    from rucene_tpu.search.search_manager import SearcherManager
    from rucene_tpu.store.directory import RAMDirectory

    texts, vocab, probs = build_corpus(n_docs + 50_000)
    queries = build_queries(n_queries, vocab, probs, phrase_texts=texts[:5000])

    # defer merges during the serving window (the production move under
    # load — the reference throttles merges the same way,
    # merge_scheduler.rs rate limiter): every flush segment then lands in
    # the SAME compiled shape bucket, while a mid-serving merge mints a
    # first-seen segment size whose executor shapes cost 1-5 min of axon
    # compiles each (134 s batch, exp/logs/bench_nrt_r5f.log)
    from rucene_tpu.index.merge import TieredMergePolicy

    w = IndexWriter(
        RAMDirectory(),
        IndexWriterConfig(
            max_buffered_docs=25_000,
            merge_policy=TieredMergePolicy(segs_per_tier=64),
            merge_on_commit=False,
        ),
    )
    docs = []
    for t in texts[:n_docs]:
        d = Document()
        d.add(TextField("body", t))
        docs.append(d)
    w.add_documents(docs)
    w.commit()
    del docs
    print(f"# nrt: base index {n_docs} docs ready", file=sys.stderr, flush=True)

    # per-leaf execution: the combined view's rebuild was MEASURED at
    # 18-33 s per segment-adding refresh in this environment (host page
    # faults on fresh concat arrays + tunnel upload + decoded-residency
    # redecode — exp/logs/bench_nrt_probe_debug2.log), which no shape
    # bucketing can amortize at sub-second refresh cadence. Per-leaf
    # reuses every unchanged segment's device cache and uploads only the
    # new flush segment. BENCH_NRT_COMBINE=1 A/Bs the combined path.
    combine = os.environ.get("BENCH_NRT_COMBINE", "0") == "1"
    mgr = SearcherManager(
        w,
        searcher_factory=lambda r: IndexSearcher(r, combine_segments=combine),
    )
    stop = threading.Event()
    ingested = [0]

    def ingest():
        # CHUNKED bulk adds, not per-doc singles: the C++ inverter
        # releases the GIL for a whole chunk, so the serving thread keeps
        # the (single) core — per-doc Python adds at ~900 docs/s starved
        # search down to 7 QPS (exp/logs/bench_nrt_r5b.log). The rate cap
        # models a production ingest budget; 0 = unthrottled.
        rate = float(os.environ.get("BENCH_NRT_INGEST_RATE", 2000))
        chunk = 250
        i = n_docs + 2000  # the warm-refresh segment consumed the first 2K
        while not stop.is_set() and i < len(texts):
            t0 = time.time()
            docs = []
            for t in texts[i : i + chunk]:
                d = Document()
                d.add(TextField("body", t))
                docs.append(d)
            w.add_documents(docs)
            i += len(docs)
            ingested[0] += len(docs)
            if ingested[0] % 2000 < chunk:
                w.commit()
            if rate > 0:
                time.sleep(max(0.0, chunk / rate - (time.time() - t0)))

    # warm compiles before timing — including the POST-REFRESH shapes: a
    # fresh flush segment lands in the pow2 device buckets, so compiling
    # one refresh's worth up front covers the steady state
    s0 = mgr.acquire()
    for i in range(0, n_queries, batch):
        s0.search_batch(queries[i : i + batch], k=k)
    mgr.release(s0)
    warm_docs = []
    for t in texts[n_docs : n_docs + 2000]:
        d = Document()
        d.add(TextField("body", t))
        warm_docs.append(d)
    w.add_documents(warm_docs)
    w.commit()
    mgr.maybe_refresh()
    s0 = mgr.acquire()
    for i in range(0, n_queries, batch):
        s0.search_batch(queries[i : i + batch], k=k)
    mgr.release(s0)

    th = threading.Thread(target=ingest, daemon=True)
    th.start()
    served = 0
    refreshes = 0
    refresh_cost = 0.0
    last_refresh = time.time()
    debug = os.environ.get("BENCH_NRT_DEBUG") == "1"
    if debug:
        import jax

        jax.config.update("jax_log_compiles", True)
    t0 = time.time()
    qi = 0
    while time.time() - t0 < duration:
        if time.time() - last_refresh >= refresh_s:
            r0 = time.time()
            mgr.maybe_refresh()
            refresh_cost += time.time() - r0
            refreshes += 1
            last_refresh = time.time()
        s = mgr.acquire()
        b0 = time.time()
        s.search_batch(queries[qi % n_queries : qi % n_queries + batch] or queries[:batch], k=k)
        if debug:
            print(
                f"# nrt batch {served // batch}: {time.time()-b0:.2f}s "
                f"({len(s.reader.leaves)} leaves)",
                file=sys.stderr, flush=True,
            )
        mgr.release(s)
        served += batch
        qi = (qi + batch) % n_queries
    wall = time.time() - t0
    stop.set()
    th.join(timeout=10)
    w.close()
    qps = served / wall
    print(
        json.dumps(
            {
                "metric": f"NRT BM25 top-{k} QPS under concurrent ingest, "
                f"{n_docs} base docs, refresh every {refresh_s}s",
                "value": round(qps, 1),
                "unit": "queries/sec/chip",
                "vs_baseline": 0.0,
            }
        )
    )
    print(
        f"# nrt: ingested {ingested[0]} docs ({ingested[0] / wall:.0f}/s) "
        f"while serving; {refreshes} refreshes, "
        f"mean {1000 * refresh_cost / max(refreshes, 1):.0f} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_NRT") == "1":
        main_nrt()
    else:
        main()
