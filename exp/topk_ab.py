"""A/B: lax.top_k vs stable_top_k vs exact_top_k at the bench's dense
shape [256, 1M] on the real chip. Parity is checked against a HOST
lexsort oracle — raw lax.top_k itself returns arbitrary tied indices at
some TPU shapes (e.g. k=1000 here), so it is timing-only.

Usage: python exp/topk_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import jax.numpy as jnp

from rucene_tpu.ops import topk as T


def bench(fn, scores, k, label, iters=8):
    f = jax.jit(lambda s: fn(s, k))
    out = f(scores)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(scores)
        np.asarray(out[0])  # force full completion (tunnel-safe)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {dt:.1f} ms", flush=True)
    return out


def check_oracle(s, v, i, k, label, rows=16):
    v, i = np.asarray(v), np.asarray(i)
    for r in range(0, s.shape[0], max(1, s.shape[0] // rows)):
        order = np.lexsort((np.arange(s.shape[1]), -s[r]))[:k]
        assert np.array_equal(i[r], order), (label, r)
        assert np.array_equal(v[r], s[r][order]), (label, r)
    print(f"parity vs oracle ({label}): OK", flush=True)


def main():
    rng = np.random.default_rng(7)
    b, n = 256, 1_000_000
    s = rng.random((b, n), np.float32)
    s[s < 0.9] = -np.inf  # ~100K matches/row, bench-like sparsity
    scores = jnp.asarray(s)

    for k in (100, 1000):
        bench(jax.lax.top_k, scores, k, f"lax.top_k    k={k}")
        v1, i1 = bench(T.stable_top_k, scores, k, f"stable_top_k k={k}")
        v2, i2 = bench(T.exact_top_k, scores, k, f"exact_top_k  k={k}")
        check_oracle(s, v1, i1, k, f"stable k={k}")
        check_oracle(s, v2, i2, k, f"exact  k={k}")


if __name__ == "__main__":
    main()
