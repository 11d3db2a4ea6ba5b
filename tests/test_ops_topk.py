"""Unit tests for the exact tie-broken vectorized top-k (ops/topk.py)."""

import numpy as np
import jax.numpy as jnp

from rucene_tpu.ops.topk import topk_score_doc


def _ref(scores, k):
    out = []
    for row in scores:
        hits = [(s, d) for d, s in enumerate(row) if s > -np.inf]
        hits.sort(key=lambda t: (-t[0], t[1]))
        out.append(hits[:k])
    return out


def _check(scores, k):
    s, d = topk_score_doc(jnp.asarray(scores, jnp.float32), k)
    s, d = np.asarray(s), np.asarray(d)
    want = _ref(np.asarray(scores, np.float32), k)
    for r in range(len(scores)):
        got = [(s[r, i], d[r, i]) for i in range(k) if s[r, i] > -np.inf]
        assert got == want[r], (r, got, want[r])


def test_topk_basic(rng):
    scores = rng.random((4, 50)).astype(np.float32)
    scores[scores < 0.3] = -np.inf
    _check(scores, 10)


def test_topk_all_ties():
    scores = np.full((2, 40), 1.5, np.float32)
    _check(scores, 7)  # smallest doc ids win


def test_topk_no_matches():
    scores = np.full((3, 20), -np.inf, np.float32)
    s, d = topk_score_doc(jnp.asarray(scores), 5)
    assert np.all(np.asarray(s) == -np.inf)


def test_topk_fewer_than_k():
    scores = np.full((1, 30), -np.inf, np.float32)
    scores[0, [3, 17]] = [2.0, 9.0]
    _check(scores, 10)


def test_topk_k_exceeds_n():
    scores = np.asarray([[1.0, 2.0, 3.0]], np.float32)
    s, d = topk_score_doc(jnp.asarray(scores), 8)
    assert np.asarray(s).shape == (1, 8)
    assert np.asarray(d)[0, :3].tolist() == [2, 1, 0]


def test_topk_boundary_tie_cluster():
    # 5 docs above, then 10 tied exactly at the k-th score: the selection
    # must take the smallest tied doc ids
    scores = np.full((1, 64), -np.inf, np.float32)
    scores[0, 50:55] = [9, 8, 7, 6, 5]
    scores[0, 10:20] = 2.0
    _check(scores, 8)
