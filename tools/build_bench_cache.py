"""Pre-build the packed bench index cache (CPU-only, no TPU touch).

The driver's end-of-round `python bench.py` defaults to the largest cached
corpus <= 1M docs; on a fresh machine no cache exists and the bench would
fall back to the unrepresentative 50K config (VERDICT r2 weak #1). Run
this once per machine:

    python tools/build_bench_cache.py [n_docs] [corpus_kind]

Cold builds pay the sandbox's first-touch page-fault tax (~0.5ms/4K page,
CLAUDE.md), so expect minutes at 1M docs; subsequent bench runs load the
.seg in seconds.
"""

from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    corpus_kind = sys.argv[2] if len(sys.argv) > 2 else "zipf"
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    seg_name = f"bench-{corpus_kind}-{n_docs}"

    from rucene_tpu import Document, TextField
    from rucene_tpu.codec import files as segfiles
    from rucene_tpu.codec.postings import pack_segment
    from rucene_tpu.index.memory import SegmentBuffer
    from rucene_tpu.store.directory import FSDirectory

    os.makedirs(cache_dir, exist_ok=True)
    cdir = FSDirectory(cache_dir)
    if cdir.file_exists(segfiles.segment_file(seg_name)):
        print(f"already cached: {seg_name}", flush=True)
        return

    t0 = time.time()
    if corpus_kind == "pytext":
        texts, _, _ = bench.build_corpus_pytext(n_docs)
    else:
        texts, _, _ = bench.build_corpus(n_docs)
    print(f"corpus built ({time.time() - t0:.0f}s)", flush=True)

    buf = SegmentBuffer()
    docs = []
    for t in texts:
        d = Document()
        d.add(TextField("body", t))
        docs.append(d)
    del texts
    buf.add_documents_bulk(docs)
    del docs
    print(f"inverted ({time.time() - t0:.0f}s)", flush=True)
    packed = pack_segment(buf.finish())
    print(f"packed ({time.time() - t0:.0f}s)", flush=True)
    segfiles.write_segment(cdir, seg_name, packed)
    print(
        f"cached {seg_name} to {cache_dir} "
        f"({packed.index_bytes() / 1e6:.1f} MB, {time.time() - t0:.0f}s total)",
        flush=True,
    )


if __name__ == "__main__":
    main()
