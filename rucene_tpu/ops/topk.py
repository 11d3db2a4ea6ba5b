"""Exact vectorized top-k with Lucene tie-breaking (score desc, doc id asc).

Replaces the reference's scalar binary-heap HitQueue
(rucene src/core/search/collector/top_docs.rs:68-77) with vectorized
selection.

IMPORTANT: jax.lax.top_k's documented lower-index tie-break is NOT honored
by the TPU backend at every shape — measured on v5e, the TopK custom call
returns arbitrary tied indices at e.g. [16, 32768] k=256 and [256, 1M]
k=1000 (stable at neighboring shapes; the lowering choice is
unpredictable). BM25 score ties are routine (equal tf + equal norm byte
quantize to identical f32; constant-score rows tie EVERYWHERE), so raw
lax.top_k indices must never reach results. stable_top_k below synthesizes
an exact top-k from primitives whose output is deterministic regardless of
tie handling:

  1. value pass: lax.top_k values are set-correct whatever the index
     order; take the k-th value as the threshold.
  2. selection pass: build a DISTINCT key per column
     (2N-i for scores > kth, N-i for scores == kth, 0 otherwise);
     distinct keys make the top-k set unique, so any conforming top-k
     returns exactly the k columns Lucene's heap would keep. Keys are f32
     (exact integers while 2N < 2^24 — TPU's fast TopK path; i32 TopK
     measured ~10x slower at [256, 1M]).
  3. order pass: lax.sort over the [B, k] survivors with
     num_keys=2 (-score, index) — exact (score desc, doc asc).

Wide rows go through exact_top_k: a block-max candidate-selection pass
(the top-k analog of the skip lists' block-max metadata,
skip_writer.rs:21-40) that shrinks the stable selection to ~k*chunk
candidate columns. Because the chunk selection is itself tie-broken by
(chunk max desc, chunk index asc), the candidate set PROVABLY contains
the true (score desc, doc asc) top-k — no fallback branch is needed:
if a winner w sat in an unselected chunk, each of the k selected chunks
would hold an element with a higher score than w, or an equal score at a
lower index (the whole selected chunk precedes w's chunk), i.e. k
distinct elements all beating w — contradiction.

Non-matching docs carry -inf.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# plain Python scalars, NOT jnp values: module-level device arrays would
# initialize the jax backend (and grab the axon TPU tunnel) at import time
NEG_INF = float("-inf")
_DOC_PAD = 2**31 - 1

# fast path engages above this width (full top_k at [256, 1M] costs
# ~126 ms on a v5e chip — it dominates every wide-row path's device time;
# lax.approx_max_k was measured NO faster at these shapes, hence this
# hand-rolled selection)
_FAST_MIN_N = 32_768
_CHUNK = 256  # docs per block-max chunk (lane-aligned reduce)


def _distinct_keys(scores: jax.Array, kth: jax.Array) -> jax.Array:
    """Distinct selection keys ordered by (score band desc, index asc):
    columns > kth get 2N-i, == kth get N-i, rest 0. f32 while exact
    (2N < 2^24), else i32 (slower TopK lowering, used only on very wide
    rows where the chunked path bounds N anyway)."""
    b, n = scores.shape
    dt = jnp.float32 if 2 * n < (1 << 24) else jnp.int32
    iota = jax.lax.broadcasted_iota(dt, (b, n), 1)
    two_n = jnp.asarray(2 * n, dt)
    nn = jnp.asarray(n, dt)
    zero = jnp.asarray(0, dt)
    return jnp.where(
        scores > kth, two_n - iota, jnp.where(scores == kth, nn - iota, zero)
    )


def stable_top_k(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over f32[B, N] with GUARANTEED (value desc, index asc)
    ordering on every backend (see module docstring: TPU lax.top_k breaks
    its documented tie order at some shapes). Cost: two [B, N] top-k
    passes + one [B, k] two-key sort. Returns (vals f32[B,kk],
    idx i32[B,kk]) with kk = min(k, N)."""
    b, n = scores.shape
    kk = min(k, n)
    vals = jax.lax.top_k(scores, kk)[0]  # values are tie-order-free
    kth = vals[:, -1:]
    sel = _distinct_keys(scores, kth)
    idx = jax.lax.top_k(sel, kk)[1].astype(jnp.int32)
    sv = jnp.take_along_axis(scores, idx, axis=1)
    negs, si = jax.lax.sort((-sv, idx), num_keys=2, dimension=-1)
    return -negs, si


def exact_top_k(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Drop-in stable_top_k that is fast on wide rows, via block-max chunk
    selection:

      1. reduce scores to per-chunk maxes [B, C] (chunk = 256, or 128 at
         k > 128 to bound the candidate width);
      2. take the top-k chunks per row, tie-broken by (max desc, chunk
         index asc) — the tiny [B, C] stable selection; sort the chosen
         ids ASCENDING so the gathered candidate layout preserves
         original index order;
      3. run the stable selection over just the candidates [B, k*chunk]
         and map candidate positions back to original columns.

    Completeness holds with NO fallback (module docstring has the
    one-line proof); the trailing n % chunk columns form a pseudo-chunk
    that is always appended to the candidates.

    RUCENE_FAST_TOPK=0 forces plain stable_top_k."""
    b, n = scores.shape
    kk = min(k, n)
    chunk = _CHUNK if kk <= 128 else 128
    c = n // chunk
    if (
        n < _FAST_MIN_N
        or kk >= c
        or kk * chunk * 2 >= n
        or os.environ.get("RUCENE_FAST_TOPK", "1") == "0"
    ):
        return stable_top_k(scores, kk)
    r = n - c * chunk
    chunks = scores[:, : c * chunk].reshape(b, c, chunk)
    cmax = jnp.max(chunks, axis=2)  # [B, C]
    # stable chunk selection: (max desc, chunk index asc), via the same
    # distinct-key trick on the tiny [B, C] array
    cthr = jax.lax.top_k(cmax, kk)[0][:, -1:]
    cidx = jax.lax.top_k(_distinct_keys(cmax, cthr), kk)[1]
    cidx_sorted = jnp.sort(cidx, axis=1)  # ascending -> index-order layout
    cand = jnp.take_along_axis(
        chunks, cidx_sorted[:, :, None].astype(jnp.int32), axis=1
    ).reshape(b, kk * chunk)
    if r:
        cand = jnp.concatenate([cand, scores[:, c * chunk :]], axis=1)
    cvals, cj = stable_top_k(cand, kk)  # exact within the candidates
    # map candidate-local position back to the original column
    cj_main = jnp.clip(cj, 0, kk * chunk - 1)
    base = jnp.take_along_axis(cidx_sorted, cj_main // chunk, axis=1)
    cols = (base * chunk + cj_main % chunk).astype(jnp.int32)
    if r:
        cols = jnp.where(cj >= kk * chunk, c * chunk + (cj - kk * chunk), cols)
    return cvals, cols


def extent_top_k_lanes(
    score: jax.Array,
    docm: jax.Array,
    start: jax.Array,
    items: jax.Array,
    max_items: int,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact per-row top-k over contiguous work-item extents of flat lane
    arrays — the wide-row path for executors whose rows own disjoint
    slices of a [W, 128] lane grid (single-term rows, pair-gallop
    extents). Never materializes the [B, max_items*128] dense row layout
    (537 MB at 1M docs, the measured dominant cost of the old
    vmap-dynamic-slice formulation): selection runs at ITEM granularity
    first, then only k items' lanes are gathered per row.

      1. cmax[W] = per-item lane max (one [W,128] reduce);
      2. per row, a stable (max desc, item asc) top-min(k, max_items)
         chunk selection over its [max_items] item-max view — the same
         block-max argument as exact_top_k proves the selected items
         contain the true (score desc, doc asc) top-k;
      3. gather the selected items' lanes ([B, ksel, 128]) and run the
         stable selection over just those candidates.

    Requirements: per extent, items ascend by doc and lanes ascend by doc
    within an item (so index-asc tie-break == doc-asc); non-matching
    lanes carry score == -inf and docm == 2^31-1; extents are disjoint.
    score/docm: [W, 128]; start/items: i32[B]. Returns
    (scores f32[B, k], docs i32[B, k]) padded with (-inf, 2^31-1)."""
    w = score.shape[0]
    b = start.shape[0]
    mi = max(max_items, 1)
    cmax = jnp.max(score, axis=1)  # [W]
    cflat = jnp.concatenate([cmax, jnp.full(mi, NEG_INF, cmax.dtype)])

    def row_view(s, n):
        v = jax.lax.dynamic_slice(cflat, (s,), (mi,))
        j = jnp.arange(mi, dtype=jnp.int32)
        return jnp.where(j < n, v, NEG_INF)

    crows = jax.vmap(row_view)(start, items)  # [B, mi]
    ksel = min(k, mi)
    cthr = jax.lax.top_k(crows, ksel)[0][:, -1:]
    cidx = jax.lax.top_k(_distinct_keys(crows, cthr), ksel)[1].astype(jnp.int32)
    cidx = jnp.sort(cidx, axis=1)  # ascending -> doc-asc candidate layout
    sel_ok = cidx < items[:, None]
    gi = jnp.clip(start[:, None] + cidx, 0, w - 1)
    cs = jnp.where(sel_ok[:, :, None], score[gi], NEG_INF).reshape(b, ksel * 128)
    cd = jnp.where(sel_ok[:, :, None], docm[gi], _DOC_PAD).reshape(b, ksel * 128)
    kk = min(k, ksel * 128)
    ts, tj = stable_top_k(cs, kk)
    got = ts > NEG_INF
    td = jnp.where(got, jnp.take_along_axis(cd, tj, axis=1), _DOC_PAD)
    if kk < k:
        ts = jnp.concatenate(
            [ts, jnp.full((b, k - kk), NEG_INF, jnp.float32)], axis=1
        )
        td = jnp.concatenate(
            [td, jnp.full((b, k - kk), jnp.int32(_DOC_PAD))], axis=1
        )
    return ts, td


def topk_score_doc(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """scores: f32[B, N] with -inf for non-matching docs; doc id == column.

    Returns (top_scores f32[B,k], top_docs i32[B,k]); slots beyond the number
    of matches hold (-inf, 2^31-1).
    """
    b, n = scores.shape
    kk = min(k, n)
    vals, idx = exact_top_k(scores, kk)  # ties -> lower index first
    got = vals > NEG_INF
    out_docs = jnp.where(got, idx.astype(jnp.int32), _DOC_PAD)
    if kk < k:
        pad_s = jnp.full((b, k - kk), NEG_INF, dtype=scores.dtype)
        pad_d = jnp.full((b, k - kk), _DOC_PAD, dtype=jnp.int32)
        vals = jnp.concatenate([vals, pad_s], axis=1)
        out_docs = jnp.concatenate([out_docs, pad_d], axis=1)
    return vals, out_docs
