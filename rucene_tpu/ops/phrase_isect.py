"""Intersection-driven exact-phrase verify — the TPU route for
common x common phrases that admission keeps OFF the position-plane
cache.

The reference's ExactPhraseScorer walks both huge postings lists with a
skip-list leapfrog (phrase_scorer.rs:122): work ~ df_min, tens to
hundreds of ms on one core when both terms are frequent — and on this
engine those rows used to SERIALIZE on the single host core (48/64
timed phrase rows at 8.8M = 447 ms of a 536 ms batch,
exp/logs/bench_8m_k100_r5d.log). The candidate-table pipeline
(phrase_device.py) is bounded by its 65536-candidate cap ~ df_min, so
it cannot take them, and a position plane costs 75-143 MB of cache per
term (phrase_path._plane_resident_terms admission).

But the CO-OCCURRENCE set is much smaller than df_min: two 500K-df
terms at 8.8M docs intersect in ~28K docs. This kernel computes that
set from the ALREADY-RESIDENT u8 tf planes and verifies positions for
just those docs, with device work PROPORTIONAL to the intersection
size (a dynamic-trip-count chunk loop — no hard candidate cap):

  1. and_mask = live & AND_t (tf_plane[slot_t] > 0)        -- O(md) VPU
  2. compact doc ids into a doc-ascending [md] table (cumsum scatter)
  3. loop over CHUNK-candidate slices, ceil(count/CHUNK) real
     iterations: per term, locate each candidate in the postings —
     branchless binary search over the decoded residency (block firsts,
     then in-block lanes), cumsum freqs for the position offset; gather
     each candidate's packed position window (ops/phrase_plane bit
     math); count aligned runs; scatter phrase freqs into a dense [md]
     accumulator
  4. dense BM25 denominator-plane scoring + exact tie-broken top-k
     (the position-plane path's tail)

Exactness: total_hits is exact — every doc containing all phrase terms
is a candidate and every candidate is verified. Candidates whose term
freq exceeds the FMAX position window flag the row's overflow count and
the caller re-runs the row on the scalar engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rucene_tpu.codec.device import DeviceSegment
from rucene_tpu.ops.phrase_plane import FMAX

CHUNK = 65536  # candidates per loop step (bounds the gather transients)
MASK_W = 4  # u32 words of the per-candidate position mask (128 positions)


@partial(jax.jit, static_argnames=("k", "n_terms", "fmax"))
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
    fmax: int = FMAX,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One phrase row -> (scores f32[k], docs i32[k], hits i32, ov i32).

    Requires decoded residency (docs_dec/freqs_dec) and a tf-plane slot
    for every term — the caller gates on both."""
    md = dev.max_doc_padded
    p = dev.tf_planes.shape[0]
    chunk = min(CHUNK, md)

    # --- 1. dense intersection over resident tf planes ---
    and_mask = live
    for t in range(n_terms):
        sl = jnp.clip(plane_slot[t], 0, p - 1)
        and_mask = and_mask & (dev.tf_planes[sl] > 0)
    n_cand = jnp.sum(and_mask.astype(jnp.int32))

    # --- 2. compact candidate doc ids (doc-ascending), md = invalid ---
    pos_idx = jnp.cumsum(and_mask.astype(jnp.int32)) - 1
    scatter_to = jnp.where(and_mask, pos_idx, md)
    docs_all = jnp.full((md + 1,), md, jnp.int32).at[scatter_to].set(
        jnp.arange(md, dtype=jnp.int32), mode="drop"
    )

    limit = dev.positions.shape[0] - 1
    fidx = jnp.arange(fmax, dtype=jnp.int32)
    nbr = dev.docs_dec.shape[0]

    def chunk_step(ci, carry):
        pf_dense, ov = carry
        docs_c = jax.lax.dynamic_slice(docs_all, (ci * chunk,), (chunk,))
        cvalid = docs_c < md

        masks_t = []  # u32[chunk, MASK_W] per term
        for t in range(n_terms):
            # --- 3a. block: largest b in [lo, hi) with first_doc <= doc
            lo = blk_lo[t]
            hi = blk_hi[t]
            left = jnp.full((chunk,), 0, jnp.int32) + lo
            right = jnp.full((chunk,), 0, jnp.int32) + jnp.maximum(hi - 1, lo)
            for _ in range(18):  # 2^18 > max blocks/term at 8.8M+ docs
                mid = (left + right + 1) >> 1
                first = dev.docs_dec[jnp.clip(mid, 0, nbr - 1), 0]
                ge = first <= docs_c
                left = jnp.where(ge, mid, left)
                right = jnp.where(ge, right, mid - 1)
            b = jnp.clip(left, 0, nbr - 1)

            # --- 3b. lane within the block + freq + position offset ---
            cnt_b = dev.blk_count[b]
            lane_valid = (
                jnp.arange(128, dtype=jnp.int32)[None, :] < cnt_b[:, None]
            )
            drow = jnp.where(
                lane_valid, dev.docs_dec[b], jnp.int32(2**31 - 1)
            )
            frow = jnp.where(lane_valid, dev.freqs_dec[b].astype(jnp.int32), 0)
            lane = jnp.sum((drow < docs_c[:, None]).astype(jnp.int32), axis=1)
            lane = jnp.clip(lane, 0, 127)
            present = (
                jnp.take_along_axis(drow, lane[:, None], axis=1)[:, 0]
                == docs_c
            )
            freq_d = jnp.take_along_axis(frow, lane[:, None], axis=1)[:, 0]
            freq_d = jnp.where(present & cvalid, freq_d, 0)
            csum = jnp.cumsum(frow, axis=1)
            before = (
                jnp.take_along_axis(csum, lane[:, None], axis=1)[:, 0]
                - jnp.where(present, freq_d, 0)
            )
            pos_off = dev.blk_pos_base[b] + before

            ov = ov + jnp.sum((freq_d > fmax).astype(jnp.int32))

            # --- 4. packed position window (build_position_plane math)
            w32 = pos_width[t].astype(jnp.int32)
            vmask = jnp.where(
                w32 >= 32,
                jnp.uint32(0xFFFFFFFF),
                (jnp.uint32(1) << w32.astype(jnp.uint32)) - 1,
            )
            occ = pos_off[:, None] + fidx[None, :]
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

            # positions past the 128-bit window can't be verified by the
            # mask AND below: flag them (row spills, exactness kept)
            ov = ov + jnp.sum((pv & (pos_abs >= 32 * MASK_W)).astype(jnp.int32))

            # per-candidate position BIT MASK (a plane in registers):
            # positions are unique per (doc, term), so summing distinct
            # power-of-two bits IS the OR — O(MASK_W * fmax) per
            # candidate instead of the O(fmax^2) membership cube that
            # made zipf-head rows ~1.5 s (bench_8m_k100_r5f.log)
            word_of = pos_abs >> 5
            bit_of = jnp.uint32(1) << (pos_abs & 31).astype(jnp.uint32)
            mask_words = []
            for w in range(MASK_W):
                bits = jnp.where(pv & (word_of == w), bit_of, jnp.uint32(0))
                mask_words.append(jnp.sum(bits, axis=1, dtype=jnp.uint32))
            masks_t.append(jnp.stack(mask_words, axis=1))

        # --- shifted-AND popcount over the candidate masks (the position
        # -plane verify, restricted to the co-occurrence set) ---
        from rucene_tpu.ops.phrase_plane import _shift_right

        acc = masks_t[0]
        for t in range(1, n_terms):
            acc = acc & _shift_right(masks_t[t], t)
        pf_c = jnp.sum(jax.lax.population_count(acc), axis=1).astype(
            jnp.int32
        )

        pf_dense = pf_dense.at[jnp.where(cvalid, docs_c, md)].add(
            pf_c.astype(jnp.float32), mode="drop"
        )
        return (pf_dense, ov)

    n_chunks = (n_cand + chunk - 1) // chunk
    pf_dense, ov = jax.lax.fori_loop(
        0,
        n_chunks,
        chunk_step,
        (jnp.zeros((md + 1,), jnp.float32), jnp.int32(0)),
    )
    pf_dense = pf_dense[:md]

    # --- 5. dense scoring tail (same semantics as the plane path) ---
    match = pf_dense > 0
    score = weight * pf_dense / (pf_dense + denom)
    scores_dense = jnp.where(match, score, -jnp.inf)
    from rucene_tpu.ops.topk import topk_score_doc

    top_scores, top_docs = topk_score_doc(scores_dense[None, :], k)
    hits = jnp.sum(match.astype(jnp.int32))
    return top_scores[0], top_docs[0], hits, ov
