"""Intersection-driven exact-phrase verify — the TPU route for
common x common phrases that admission keeps OFF the position-plane
cache.

The reference's ExactPhraseScorer walks both huge postings lists with a
skip-list leapfrog (phrase_scorer.rs:122): work ~ df_min, tens of ms on
one core when both terms are frequent. The candidate-table pipeline
(phrase_device.py) is bounded by its 65536-candidate cap ~ df_min, so it
cannot take those rows either, and a position plane costs 75-143 MB of
cache per term (phrase_path._plane_resident_terms admission). But the
CO-OCCURRENCE set is tiny even when both dfs are huge: two 500K-df terms
at 8.8M docs intersect in ~28K docs. This kernel computes that set from
the ALREADY-RESIDENT u8 tf planes (codec/device.add_tf_planes: every
term with df >= mdp/512 has one) with one dense AND, then verifies
positions for just those docs:

  1. and_mask = live & AND_t (tf_plane[slot_t] > 0)        -- O(md) VPU
  2. compact doc ids into a static [cand_cap] table (cumsum scatter)
  3. per term: locate each candidate in the term's postings — branchless
     binary search over the decoded residency (docs_dec block firsts,
     then the in-block lanes), cumsum freqs for the position offset
  4. gather each candidate's position window from the packed stream and
     count aligned runs (same bit math as ops/phrase_plane's build)
  5. scatter phrase freqs to a dense [md] plane and reuse the standard
     BM25 denominator-plane scoring + exact tie-broken top-k

Exactness: candidates whose intersection exceeds cand_cap or whose term
freq exceeds FMAX flag the row's overflow count; the caller re-runs such
rows on the scalar engine, so results stay exact for every input.
total_hits is exact: every doc containing all phrase terms is a
candidate, and each candidate's phrase freq is verified.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rucene_tpu.codec.device import DeviceSegment
from rucene_tpu.ops.phrase_plane import FMAX

CAND_CAP = 65536  # static candidate capacity; larger intersections spill
VERIFY_SUB = 8192  # candidates per membership-verify scan step


@partial(jax.jit, static_argnames=("k", "n_terms", "cand_cap", "fmax"))
def phrase_isect_search(
    dev: DeviceSegment,
    plane_slot: jax.Array,  # i32[n_terms] tf-plane row per phrase slot
    blk_lo: jax.Array,  # i32[n_terms] first global block id per term
    blk_hi: jax.Array,  # i32[n_terms] one-past-last block id per term
    pos_width: jax.Array,  # i32[n_terms] packed position-delta width
    pos_start: jax.Array,  # i32[n_terms] word offset of the term's stream
    denom: jax.Array,  # f32[md] BM25 denominator plane for the field
    live: jax.Array,  # bool[md]
    weight: jax.Array,  # f32[] = boost * sum(idf) * (k1+1)
    k: int,
    n_terms: int,
    cand_cap: int = CAND_CAP,
    fmax: int = FMAX,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One phrase row -> (scores f32[k], docs i32[k], hits i32, ov i32).

    Requires decoded residency (docs_dec/freqs_dec) and a tf-plane slot
    for every term — the caller gates on both."""
    md = dev.max_doc_padded
    p = dev.tf_planes.shape[0]

    # --- 1. dense intersection over resident tf planes ---
    and_mask = live
    for t in range(n_terms):
        sl = jnp.clip(plane_slot[t], 0, p - 1)
        and_mask = and_mask & (dev.tf_planes[sl] > 0)
    n_cand = jnp.sum(and_mask.astype(jnp.int32))
    ov = jnp.where(n_cand > cand_cap, jnp.int32(1), jnp.int32(0))

    # --- 2. compact candidate doc ids to [cand_cap] (doc-ascending) ---
    pos_idx = jnp.cumsum(and_mask.astype(jnp.int32)) - 1
    scatter_to = jnp.where(and_mask & (pos_idx < cand_cap), pos_idx, cand_cap)
    docs_c = jnp.full((cand_cap + 1,), md, jnp.int32).at[scatter_to].set(
        jnp.arange(md, dtype=jnp.int32), mode="drop"
    )[:cand_cap]
    cvalid = docs_c < md

    limit = dev.positions.shape[0] - 1
    fidx = jnp.arange(fmax, dtype=jnp.int32)
    nbr = dev.docs_dec.shape[0]

    pos_t = []  # [cand_cap, fmax] absolute positions per term
    pvalid_t = []  # [cand_cap, fmax] validity per term
    for t in range(n_terms):
        # --- 3a. block via branchless binary search on block-first docs:
        # largest b in [lo, hi) with docs_dec[b, 0] <= doc ---
        lo = blk_lo[t]
        hi = blk_hi[t]
        left = jnp.full((cand_cap,), 0, jnp.int32) + lo
        right = jnp.maximum(hi - 1, lo)
        right = jnp.full((cand_cap,), 0, jnp.int32) + right
        for _ in range(18):  # 2^18 > max blocks/term at 8.8M+ docs
            mid = (left + right + 1) >> 1
            first = dev.docs_dec[jnp.clip(mid, 0, nbr - 1), 0]
            ge = first <= docs_c
            left = jnp.where(ge, mid, left)
            right = jnp.where(ge, right, mid - 1)
        b = jnp.clip(left, 0, nbr - 1)

        # --- 3b. lane within the block + freq + position offset ---
        cnt_b = dev.blk_count[b]  # i32[cand]
        lane_valid = jnp.arange(128, dtype=jnp.int32)[None, :] < cnt_b[:, None]
        drow = jnp.where(
            lane_valid, dev.docs_dec[b], jnp.int32(2**31 - 1)
        )  # [cand, 128]
        frow = jnp.where(lane_valid, dev.freqs_dec[b].astype(jnp.int32), 0)
        lane = jnp.sum((drow < docs_c[:, None]).astype(jnp.int32), axis=1)
        lane = jnp.clip(lane, 0, 127)
        present = (
            jnp.take_along_axis(drow, lane[:, None], axis=1)[:, 0] == docs_c
        )
        freq_d = jnp.take_along_axis(frow, lane[:, None], axis=1)[:, 0]
        freq_d = jnp.where(present & cvalid, freq_d, 0)
        csum = jnp.cumsum(frow, axis=1)
        before = jnp.take_along_axis(csum, lane[:, None], axis=1)[:, 0] - jnp.where(
            present, freq_d, 0
        )
        pos_off = dev.blk_pos_base[b] + before

        # row overflow when a candidate's freq exceeds the window
        ov = ov + jnp.sum((freq_d > fmax).astype(jnp.int32))

        # --- 4. gather the packed position window (build_position_plane
        # bit math: per-occurrence delta extraction + running cumsum) ---
        w32 = pos_width[t].astype(jnp.int32)
        vmask = jnp.where(
            w32 >= 32,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << w32.astype(jnp.uint32)) - 1,
        )
        occ = pos_off[:, None] + fidx[None, :]  # [cand, fmax]
        pv = cvalid[:, None] & (fidx[None, :] < freq_d[:, None])
        bitpos = occ * w32
        widx = pos_start[t].astype(jnp.int32) + (bitpos >> 5)
        shift = (bitpos & 31).astype(jnp.uint32)
        w0 = dev.positions[jnp.clip(widx, 0, limit)]
        w1 = dev.positions[jnp.clip(widx + 1, 0, limit)]
        lo_b = w0 >> shift
        hi_b = jnp.where(
            shift == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - shift)
        )
        deltas = ((lo_b | hi_b) & vmask).astype(jnp.int32)
        deltas = jnp.where(pv, deltas, 0)
        pos_abs = jnp.cumsum(deltas, axis=1)
        pos_t.append(jnp.where(pv, pos_abs, jnp.int32(-(10 ** 9))))
        pvalid_t.append(pv)

    # --- 5. membership verify, chunked over candidates ---
    n_sub = cand_cap // min(cand_cap, VERIFY_SUB)
    sub = cand_cap // n_sub

    def verify_chunk(ci):
        s0 = pos_t[0][ci]  # [sub, fmax]
        ok = pvalid_t[0][ci]
        for t in range(1, n_terms):
            st = pos_t[t][ci]  # [sub, fmax]
            hit = jnp.any(
                s0[:, :, None] + t == st[:, None, :], axis=2
            )  # [sub, fmax]
            ok = ok & hit
        return jnp.sum(ok.astype(jnp.int32), axis=1)  # [sub]

    idx = jnp.arange(cand_cap, dtype=jnp.int32).reshape(n_sub, sub)
    pf_c = jax.lax.map(verify_chunk, idx).reshape(cand_cap)

    # --- 6. dense scoring tail (same semantics as the plane path) ---
    pf_dense = (
        jnp.zeros((md + 1,), jnp.float32)
        .at[jnp.where(cvalid, docs_c, md)]
        .add(pf_c.astype(jnp.float32), mode="drop")[:md]
    )
    match = pf_dense > 0
    score = weight * pf_dense / (pf_dense + denom)
    scores_dense = jnp.where(match, score, -jnp.inf)
    from rucene_tpu.ops.topk import topk_score_doc

    top_scores, top_docs = topk_score_doc(scores_dense[None, :], k)
    hits = jnp.sum(match.astype(jnp.int32))
    return top_scores[0], top_docs[0], hits, ov
