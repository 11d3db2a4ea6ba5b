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


def test_exact_top_k_fast_path(rng, monkeypatch):
    """Force the block-max chunk-selection fast path and pin exactness
    incl. tie-breaks against the oracle on adversarial shapes."""
    import rucene_tpu.ops.topk as topk_mod

    monkeypatch.setattr(topk_mod, "_FAST_MIN_N", 0)
    n, k = 65536, 16
    # (a) random with -inf holes
    scores = rng.random((4, n)).astype(np.float32)
    scores[scores < 0.5] = -np.inf
    _check(scores, k)
    # (b) heavy duplicate clusters straddling the k-th rank (forces the
    # completeness check to either hold exactly or take the fallback)
    scores = np.full((3, n), -np.inf, np.float32)
    scores[0, :200] = 3.0  # 200 ties, k=16 -> smallest indices win
    scores[1, ::7] = 1.25
    scores[1, 100:110] = 9.0
    scores[2, :] = 2.5  # whole row tied (count_gt==0 -> fallback branch)
    _check(scores, k)
    # (c) fewer matches than k
    scores = np.full((2, n), -np.inf, np.float32)
    scores[0, [5, 99, 4000]] = [1.0, 2.0, 3.0]
    _check(scores, k)
    # (d) ascending values (approx binning worst case is uniform strides)
    scores = np.tile(np.arange(n, dtype=np.float32), (2, 1))
    _check(scores, k)


def test_stable_top_k_oracle(rng):
    """stable_top_k must match the (value desc, index asc) oracle on
    tie-heavy inputs regardless of backend top_k tie behavior (the TPU
    TopK custom call returns arbitrary tied indices at some shapes)."""
    from rucene_tpu.ops.topk import stable_top_k

    for k in (1, 7, 64, 200):
        # few distinct values -> ties everywhere, including at rank k
        s = (rng.integers(0, 9, (5, 1024)) / 8.0).astype(np.float32)
        s[rng.random((5, 1024)) < 0.3] = -np.inf
        v, i = stable_top_k(jnp.asarray(s), k)
        v, i = np.asarray(v), np.asarray(i)
        for r in range(5):
            order = np.lexsort((np.arange(1024), -s[r]))[:k]
            assert np.array_equal(i[r], order), (k, r)
            assert np.array_equal(v[r], s[r][order]), (k, r)


def test_topk_boundary_tie_cluster():
    # 5 docs above, then 10 tied exactly at the k-th score: the selection
    # must take the smallest tied doc ids
    scores = np.full((1, 64), -np.inf, np.float32)
    scores[0, 50:55] = [9, 8, 7, 6, 5]
    scores[0, 10:20] = 2.0
    _check(scores, 8)
