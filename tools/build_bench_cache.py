"""Pre-build the packed bench index cache (CPU-only, no TPU touch).

The driver's end-of-round `python bench.py` defaults to the largest cached
corpus <= 1M docs; on a fresh machine no cache exists and the bench would
fall back to the unrepresentative 50K config (VERDICT r2 weak #1). Run
this once per machine AND after every index-format change:

    python tools/build_bench_cache.py [n_docs] [corpus_kind]

Cold builds pay the sandbox's first-touch page-fault tax (~0.5ms/4K page,
CLAUDE.md), so expect minutes at 1M docs; subsequent bench runs load the
.seg in seconds. Publishing is atomic (temp + rename via bench.cache_segment)
and an existing cache file is footer-validated before being trusted.
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
    if corpus_kind not in ("zipf", "pytext"):
        sys.exit(f"usage: build_bench_cache.py [n_docs] [zipf|pytext] "
                 f"(got corpus_kind={corpus_kind!r})")
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    seg_name = f"bench-{corpus_kind}-{n_docs}"

    from rucene_tpu.codec import files as segfiles
    from rucene_tpu.store.directory import FSDirectory

    os.makedirs(cache_dir, exist_ok=True)
    cdir = FSDirectory(cache_dir)
    if cdir.file_exists(segfiles.segment_file(seg_name)):
        try:  # trust the cache only if it parses (torn/stale-format guard)
            segfiles.read_segment(cdir, seg_name)
            print(f"already cached (validated): {seg_name}", flush=True)
            return
        except Exception as e:  # noqa: BLE001 — any parse failure = rebuild
            print(f"existing {seg_name} invalid ({e}); rebuilding", flush=True)
            cdir.delete_file(segfiles.segment_file(seg_name))

    t0 = time.time()
    if corpus_kind == "pytext":
        texts, _, _ = bench.build_corpus_pytext(n_docs)
    else:
        texts, _, _ = bench.build_corpus(n_docs)
    print(f"corpus built ({time.time() - t0:.0f}s)", flush=True)

    packed = bench.pack_corpus(
        texts, log=lambda m: print(f"{m} ({time.time() - t0:.0f}s)", flush=True)
    )
    del texts
    bench.cache_segment(cache_dir, seg_name, packed)
    print(
        f"cached {seg_name} to {cache_dir} "
        f"({packed.index_bytes() / 1e6:.1f} MB, {time.time() - t0:.0f}s total)",
        flush=True,
    )


if __name__ == "__main__":
    main()
