"""Capture an xprof device trace of the bench batch and attribute device
time per XLA op (VERDICT r2 weak #2: ~45 ms of the 62 ms large-corpus
batch was unattributed by host-side block_until_ready timing — which on
the axon tunnel includes a ~40 ms host<->device RTT per sync).

Usage (real TPU, one process):
    BENCH_DOCS=1000000 python tools/profile_bench.py

Prints, from the device timeline itself:
  - wall span of the traced batches vs device-busy time (gap = host/tunnel)
  - top ops by total device time, with counts
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (the harness: corpus/query construction)


def capture(log_dir: str) -> None:
    import jax

    from rucene_tpu import IndexSearcher
    from rucene_tpu.codec import files as segfiles
    from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
    from rucene_tpu.store.directory import FSDirectory

    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    n_docs = int(os.environ.get("BENCH_DOCS", 0)) or bench._default_docs(
        cache_dir, "zipf"
    )
    batch = int(os.environ.get("BENCH_BATCH", 256))
    k = int(os.environ.get("BENCH_K", 100))
    n_batches = int(os.environ.get("PROF_BATCHES", 3))
    seg_name = f"bench-zipf-{n_docs}"
    t0 = time.time()
    packed = segfiles.read_segment(FSDirectory(cache_dir), seg_name)
    print(f"# index loaded ({time.time()-t0:.0f}s)", file=sys.stderr)
    vocab, probs = bench.zipf_vocab()
    phrase_texts, _, _ = bench.build_corpus(2000, seed=77)
    queries = bench.build_queries(batch, vocab, probs, phrase_texts=phrase_texts)
    searcher = IndexSearcher(
        IndexReader([SegmentSnapshot("bench", packed)])
    )
    for _ in range(2):  # compile + warm
        searcher.search_batch(queries, k=k)
    print(f"# warmed ({time.time()-t0:.0f}s); tracing", file=sys.stderr)
    jax.profiler.start_trace(log_dir)
    t1 = time.time()
    for _ in range(n_batches):
        searcher.search_batch(queries, k=k)
    wall = time.time() - t1
    jax.profiler.stop_trace()
    print(
        f"# traced {n_batches} batches in {wall:.3f}s "
        f"({n_batches * batch / wall:.0f} QPS)",
        file=sys.stderr,
    )


def analyze(log_dir: str) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {log_dir}"
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        print(f"\n=== plane {plane.name} ===")
        for line in plane.lines:
            if not line.events:
                continue
            tot = {}
            cnt = {}
            t_min, t_max = None, 0
            busy = 0
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # -> ms
                tot[name] = tot.get(name, 0.0) + dur
                cnt[name] = cnt.get(name, 0) + 1
                busy += dur
                start = ev.offset_ps / 1e9
                t_min = start if t_min is None else min(t_min, start)
                t_max = max(t_max, start + dur)
            span = (t_max - t_min) if t_min is not None else 0.0
            print(
                f"-- line '{line.name}': {len(line.events)} events, "
                f"busy {busy:.1f}ms over span {span:.1f}ms "
                f"({100*busy/max(span,1e-9):.0f}% busy)"
            )
            if "op" in line.name.lower() or "XLA" in line.name:
                for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
                    print(f"   {ms:9.2f}ms  x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    log_dir = os.environ.get("PROF_DIR", "/tmp/rtpu_prof")
    if os.environ.get("PROF_ANALYZE_ONLY") != "1":
        capture(log_dir)
    analyze(log_dir)
