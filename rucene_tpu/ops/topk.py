"""Exact vectorized top-k with Lucene tie-breaking (score desc, doc id asc).

Replaces the reference's scalar binary-heap HitQueue
(rucene src/core/search/collector/top_docs.rs:68-77) with a constant-depth
device formulation: one lax.top_k pass selects the strictly-above set and
the k-th score, threshold ties resolve by cumsum + searchsorted (smallest
doc ids first), then a tiny 2k-element lexicographic sort orders the
candidates. Non-matching docs carry -inf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)
_DOC_PAD = jnp.int32(2**31 - 1)


def topk_score_doc(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """scores: f32[B, N] with -inf for non-matching docs; doc id == column.

    Returns (top_scores f32[B,k], top_docs i32[B,k]); slots beyond the number
    of matches hold (-inf, 2^31-1).
    """
    b, n = scores.shape
    kk = min(k, n)

    vals, idx = jax.lax.top_k(scores, kk)  # [B,kk], sorted desc
    thr = vals[:, -1]  # k-th best score per row

    above = scores > thr[:, None]
    m = jnp.sum(above, axis=1).astype(jnp.int32)  # strictly-above count (< kk when thr finite)

    # part 1: every strictly-above doc — top_k sorts descending, so they are
    # exactly the first m entries of the same pass (no second top_k needed)
    j = jnp.arange(kk, dtype=jnp.int32)[None, :]
    a_valid = j < m[:, None]
    a_scores = jnp.where(a_valid, vals, NEG_INF)
    a_docs = jnp.where(a_valid, idx.astype(jnp.int32), _DOC_PAD)

    # part 2: ties at the threshold, smallest doc ids first. The t-th
    # smallest tie doc is searchsorted(cumsum(eq), t+1) — cheaper than a
    # second full top_k pass (the tie count is monotone in doc id)
    finite_thr = thr[:, None] > NEG_INF
    eq = (scores == thr[:, None]) & finite_thr
    rank = jnp.cumsum(eq.astype(jnp.int32), axis=1)
    tgt = jnp.arange(1, kk + 1, dtype=jnp.int32)
    pos = jax.vmap(lambda r: jnp.searchsorted(r, tgt, side="left"))(rank)
    have = rank[:, -1]  # total tie count per row
    e_needed = kk - m
    e_valid = (j < e_needed[:, None]) & (j < have[:, None]) & finite_thr[:, :1]
    e_docs = jnp.where(e_valid, pos.astype(jnp.int32), _DOC_PAD)
    e_scores = jnp.where(e_valid, thr[:, None], NEG_INF)

    # merge the <=2k candidates and order by (-score, doc)
    c_scores = jnp.concatenate([a_scores, e_scores], axis=1)
    c_docs = jnp.concatenate([a_docs, e_docs], axis=1)
    neg, docs_sorted, scores_sorted = jax.lax.sort(
        (-c_scores, c_docs, c_scores), num_keys=2, dimension=-1
    )
    out_scores = scores_sorted[:, :kk]
    out_docs = docs_sorted[:, :kk]
    if kk < k:
        pad_s = jnp.full((b, k - kk), NEG_INF, dtype=scores.dtype)
        pad_d = jnp.full((b, k - kk), _DOC_PAD, dtype=jnp.int32)
        out_scores = jnp.concatenate([out_scores, pad_s], axis=1)
        out_docs = jnp.concatenate([out_docs, pad_d], axis=1)
    return out_scores, out_docs
