"""Phase split of execute_flat_pair at 1M docs on the real chip.

Captures the live (dev, q, p, ...) inputs of the pair executor during a
real search_batch, then times cumulative jitted prefixes:
  A: decode_score_lanes (owner-lane gathers + BM25)
  B: A + probe scan (chunked broadcast compare membership)
  C: full execute_flat_pair (adds extent top-k + dedup merge + counts)
Usage: python exp/pair_parts.py [batch] [k]
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

from rucene_tpu import BooleanQuery, IndexSearcher, Term, TermQuery  # noqa: E402
from rucene_tpu.codec import files as segfiles  # noqa: E402
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot  # noqa: E402
from rucene_tpu.store.directory import FSDirectory  # noqa: E402
from rucene_tpu.search import executor as ex  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/rtpu_bench_cache")
    n_docs = int(os.environ.get("BENCH_DOCS", 1_000_000))
    packed = segfiles.read_segment(FSDirectory(cache_dir), f"bench-zipf-{n_docs}")
    reader = IndexReader([SegmentSnapshot("bench", packed)])
    searcher = IndexSearcher(reader)
    vocab, probs = bench.zipf_vocab()
    rng = np.random.default_rng(13)
    band = np.arange(10, 5000)
    band_p = probs[band] / probs[band].sum()

    def t1():
        return vocab[rng.choice(band, p=band_p)]

    def mk(occ):
        qs = []
        for _ in range(batch):
            q = BooleanQuery()
            getattr(q, occ)(TermQuery(Term("body", t1())))
            getattr(q, occ)(TermQuery(Term("body", t1())))
            qs.append(q)
        return qs

    captured = {}
    real = ex.execute_flat_pair

    def capture(dev, q, p, k, max_lanes_p, max_lanes_s, with_live=False, **kw):
        captured.update(dev=dev, q=q, p=p, k=k, mlp=max_lanes_p,
                        mls=max_lanes_s, wl=with_live)
        return real(dev, q, p, k=k, max_lanes_p=max_lanes_p,
                    max_lanes_s=max_lanes_s, with_live=with_live, **kw)

    for name, occ in (("or2", "should"), ("and2", "must")):
        qs = mk(occ)
        ex.execute_flat_pair = capture
        searcher.search_batch(qs, k=k)
        ex.execute_flat_pair = real
        dev, q, p = captured["dev"], captured["q"], captured["p"]
        mlp, mls, wl = captured["mlp"], captured["mls"], captured["wl"]
        w, maxp = p.pr_slots.shape
        print(f"[{name}] W={w} maxp={maxp} mlp={mlp} mls={mls} "
              f"lanes={w*128/1e6:.1f}M", flush=True)

        @jax.jit
        def phase_a(dev, q):
            target, _r, sc, valid, _f = ex.decode_score_lanes(dev, q, False, False)
            return sc.sum(), target.sum(), valid.sum()

        @jax.jit
        def phase_b(dev, q, p):
            from rucene_tpu.ops.decode import INVALID_DOC
            target, _r, sc, valid, _f = ex.decode_score_lanes(dev, q, False, False)
            nbr = dev.docs_dec.shape[0]
            w, maxp = p.pr_slots.shape
            slot_ok_all = p.pr_slots >= 0
            sb_all = jnp.clip(p.pr_slots, 0, nbr - 1)
            ch = min(w, max(8, 8192 // maxp))
            steps = w // ch

            def probe_chunk(_, ci):
                o = ci * ch
                sb = jax.lax.dynamic_slice_in_dim(sb_all, o, ch)
                ok = jax.lax.dynamic_slice_in_dim(slot_ok_all, o, ch)
                tg = jax.lax.dynamic_slice_in_dim(target, o, ch)
                pd = jnp.where(ok[:, :, None], dev.docs_dec[sb], INVALID_DOC
                               ).reshape(ch, 1, maxp * 128)
                pf = jnp.where(ok[:, :, None],
                               dev.freqs_dec[sb].astype(jnp.float32), 0.0
                               ).reshape(ch, 1, maxp * 128)
                pc = q.cval_dec[sb].reshape(ch, 1, maxp * 128)
                m = pd == tg[:, :, None]
                ptf_c = jnp.sum(jnp.where(m, pf, 0.0), axis=2)
                pcv_c = jnp.sum(jnp.where(m, pc, 0.0), axis=2)
                return None, (ptf_c, pcv_c)

            _, (ptf, pcv) = jax.lax.scan(
                probe_chunk, None, jnp.arange(steps, dtype=jnp.int32))
            return sc.sum(), ptf.sum(), pcv.sum()

        def timeit(fn, *args):
            r = fn(*args)
            jax.block_until_ready(r)
            t0 = time.time()
            reps = 0
            while time.time() - t0 < 3.0 or reps < 2:
                r = fn(*args)
                reps += 1
                if reps >= 20:
                    break
            jax.block_until_ready(r)
            return (time.time() - t0) / reps * 1000

        ta = timeit(phase_a, dev, q)
        tb = timeit(phase_b, dev, q, p)
        tc = timeit(lambda: real(dev, q, p, k=k, max_lanes_p=mlp,
                                 max_lanes_s=mls, with_live=wl))
        print(f"[{name}] decode/score={ta:.0f}ms probe={tb-ta:.0f}ms "
              f"topk+merge={tc-tb:.0f}ms full={tc:.0f}ms", flush=True)
        # A/B: probe variant x topk variant (VERDICT r4 item 1 — isolate
        # the r3 extent-topk regression and the same-field probe saving)
        for pv in ("v3", "nopcv"):
            for tv in ("item", "mat"):
                t = timeit(lambda pv=pv, tv=tv: real(
                    dev, q, p, k=k, max_lanes_p=mlp, max_lanes_s=mls,
                    with_live=wl, probe_variant=pv, topk_variant=tv))
                print(f"[{name}] probe={pv} topk={tv}: {t:.0f}ms", flush=True)


if __name__ == "__main__":
    main()
