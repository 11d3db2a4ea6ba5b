"""Build single phrase position planes on the real TPU, one term per
argv, smallest first — isolates which (term, w_pad) build crashes the
worker (exp/logs/bisect_phrases.log: the 4 stage-4 phrase rows crash it
with no other work in flight).

    python exp/plane_build_probe.py w741 w228 w82 w17 w8 w3 w2 w0
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402
import numpy as np  # noqa: E402

from rucene_tpu.codec import files as segfiles  # noqa: E402
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot  # noqa: E402
from rucene_tpu.store.directory import FSDirectory  # noqa: E402


def main():
    terms = sys.argv[1:] or ["w741", "w228", "w82", "w17", "w8", "w3", "w2", "w0"]
    cache = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    packed = segfiles.read_segment(FSDirectory(cache), "bench-zipf-8800000")
    leaf = IndexReader([SegmentSnapshot("bench", packed)]).leaves[0]
    t0 = time.time()
    dev = leaf.device  # residency build
    jax.block_until_ready(dev.live)
    print(f"# residency in {time.time()-t0:.0f}s "
          f"(decoded={'yes' if dev.docs_dec is not None else 'no'})", flush=True)

    from rucene_tpu.ops.phrase_plane import build_position_plane
    from rucene_tpu.search.searcher import work_has_ef
    from rucene_tpu.util import next_pow2
    import jax.numpy as jnp

    for t in terms:
        rec = leaf.term_record("body", t)
        blocks = np.arange(rec.block_start, rec.block_start + rec.block_count,
                           dtype=np.int32)
        w_pad = next_pow2(max(len(blocks), 1), 8)
        wi_block = np.zeros(w_pad, np.int32)
        wi_valid = np.zeros(w_pad, bool)
        wi_block[: len(blocks)] = blocks
        wi_valid[: len(blocks)] = True
        print(f"== build {t}: df={rec.doc_freq} blocks={len(blocks)} "
              f"w_pad={w_pad}", flush=True)
        t1 = time.time()
        plane, overflow = build_position_plane(
            dev, jnp.asarray(wi_block), jnp.asarray(wi_valid),
            jnp.asarray(np.int32(rec.pos_width)),
            jnp.asarray(np.int32(rec.pos_word_start)),
            has_ef=work_has_ef(leaf.packed.blk_doc_bits, wi_block, wi_valid),
        )
        jax.block_until_ready((plane, overflow))
        nset = int(jnp.sum(jax.lax.population_count(plane)))
        nov = int(jnp.sum(overflow))
        print(f"== build {t} OK in {time.time()-t1:.1f}s "
              f"bits={nset} overflow_docs={nov}", flush=True)
        del plane, overflow
    print("ALL BUILDS PASSED", flush=True)


if __name__ == "__main__":
    main()
