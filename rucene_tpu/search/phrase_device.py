"""Device-side phrase execution (exact and sloppy).

reference: rucene src/core/search/scorer/phrase_scorer.rs:122
(ExactPhraseScorer): conjunction of the phrase terms, then per-doc
verification that positions line up consecutively; scoring is BM25 with
freq = number of phrase occurrences. Sloppy (phrase_scorer.rs:442,
SloppyPhraseScorer): this engine's semantics are an ordered greedy chain
(first slot-j position strictly after the previous slot's pick), match iff
total gap <= slop, freq = sum of 1/(distance+1) per slot-0 occurrence.

TPU shape of that pipeline, one jitted program per batch of phrase queries:

  1. decode every (query, slot, block) work item of every phrase term
     (slot = position of the term in the phrase), keeping per-lane position
     offsets: blk_pos_base + running freq sum locates each (term, doc)'s
     slice of the flat positions stream;
  2. sort lanes by (row, doc, slot): a doc is a candidate iff its group has
     one lane per slot (count == n_terms) — the conjunction;
  3. compact candidates into a [C, NMAX] table (rank-scatter), gather each
     slot's position window [C, NMAX, FMAX];
  4. verify: phrase_freq(c) = |{p in slot0 positions : p + j in slot_j}|,
     a static loop of vectorized membership tests;
  5. BM25 with tf = phrase_freq, then the exact candidate top-k.

Static capacity knobs (C candidates, FMAX positions/term/doc) bound the
shapes; rows that overflow either are flagged and re-run on the host
engine, so results stay exact for every input.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rucene_tpu.codec.device import DeviceSegment
from rucene_tpu.ops.decode import decode_doc_blocks, decode_freq_blocks

NMAX = 8  # max phrase length (terms); longer -> host
SLOP_CAP = 32  # max device slop (one jit bucket); wider -> host
DOC_PAD = jnp.int32(2**31 - 1)


class PhraseBatch(NamedTuple):
    wi_block: jax.Array  # i32[W] block id
    wi_row: jax.Array  # i32[W] query row
    wi_slot: jax.Array  # i32[W] term position within the phrase
    wi_valid: jax.Array  # bool[W]
    n_terms: jax.Array  # i32[B]
    weight: jax.Array  # f32[B] = boost * sum(idf) * (k1+1)
    fid: jax.Array  # i32[B] field row (cache/norms)
    cache: jax.Array  # f32[F,256]
    # position-stream coordinates are PER WORK ITEM (not per row/slot):
    # in a combined/sharded view the same (row, slot) reads a different
    # per-leaf stream, and a candidate doc lives in exactly one leaf, so
    # the lane that contributed it carries the right offsets
    wi_pos_width: jax.Array  # i32[W] packed position-delta width
    wi_pos_start: jax.Array  # i32[W] word offset of the term's stream
    slop: jax.Array  # i32[B] per-row slop (0 = exact)


def execute_phrases_impl(
    dev: DeviceSegment, pb: PhraseBatch, k: int, cand_cap: int, fmax: int,
    slop_max: int = 0, has_ef: bool = False,
):
    """Returns (scores f32[B,k], docs i32[B,k], hits i32[B], overflow bool[B])."""
    b = pb.n_terms.shape[0]
    md = dev.max_doc_padded

    blk = pb.wi_block
    off = dev.blk_off[blk]
    dbits = dev.blk_doc_bits[blk]
    fbits = dev.blk_freq_bits[blk]
    base = dev.blk_base[blk]
    cnt = jnp.where(pb.wi_valid, dev.blk_count[blk], 0)
    pos_base = dev.blk_pos_base[blk]

    if dev.docs_dec is not None:
        from rucene_tpu.ops.decode import INVALID_DOC

        sb = jnp.clip(blk, 0, dev.docs_dec.shape[0] - 1)
        valid = jnp.arange(128, dtype=jnp.int32)[None, :] < cnt[:, None]
        docs = jnp.where(valid, dev.docs_dec[sb], INVALID_DOC)
        freqs = jnp.where(valid, dev.freqs_dec[sb].astype(jnp.int32), 0)
    else:
        docs, valid = decode_doc_blocks(
            dev.data, off, dbits, base, cnt, has_ef=has_ef
        )  # [W,128]
        freqs = decode_freq_blocks(dev.data, off, dbits, fbits, valid)
    # per-lane start into the positions stream
    pos_off = pos_base[:, None] + (jnp.cumsum(freqs, axis=1) - freqs)

    # ---- flatten lanes and group by (row, doc) ----
    l = docs.size
    f_row = jnp.broadcast_to(pb.wi_row[:, None], docs.shape).reshape(-1)
    f_slot = jnp.broadcast_to(pb.wi_slot[:, None], docs.shape).reshape(-1)
    f_doc = jnp.where(valid, docs, DOC_PAD).reshape(-1)
    f_pos = pos_off.reshape(-1)
    f_freq = freqs.reshape(-1)
    f_pw = jnp.broadcast_to(pb.wi_pos_width[:, None], docs.shape).reshape(-1)
    f_ws = jnp.broadcast_to(pb.wi_pos_start[:, None], docs.shape).reshape(-1)
    f_ok = valid.reshape(-1) & dev.live[jnp.clip(f_doc, 0, md - 1)] & (f_doc < md)

    key_row = jnp.where(f_ok, f_row, jnp.int32(b))
    key_doc = jnp.where(f_ok, f_doc, DOC_PAD)
    s_row, s_doc, s_slot, s_pos, s_freq, s_pw, s_ws = jax.lax.sort(
        (key_row, key_doc, f_slot, f_pos, f_freq, f_pw, f_ws),
        num_keys=3, dimension=-1,
    )

    # group extents: a candidate group has exactly n_terms lanes, slots 0..n-1
    prev_row = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_row[:-1]])
    prev_doc = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_doc[:-1]])
    is_start = (s_row < b) & ((s_row != prev_row) | (s_doc != prev_doc))
    # group id = cumsum of starts - 1
    gid = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    gid = jnp.where((s_row < b), gid, cand_cap + 1)  # park padding lanes
    # count lanes per group; candidate iff count == n_terms[row]
    grp_count = (
        jnp.zeros((cand_cap + 2,), jnp.int32)
        .at[jnp.clip(gid, 0, cand_cap + 1)]
        .add(jnp.where(s_row < b, 1, 0), mode="drop")
    )
    # scatter group tables
    grp_row = jnp.full((cand_cap + 2,), b, jnp.int32).at[
        jnp.where(is_start, jnp.clip(gid, 0, cand_cap + 1), cand_cap + 1)
    ].set(s_row, mode="drop")
    grp_doc = jnp.full((cand_cap + 2,), DOC_PAD).at[
        jnp.where(is_start, jnp.clip(gid, 0, cand_cap + 1), cand_cap + 1)
    ].set(s_doc, mode="drop")
    # per-slot pos/freq: index by (gid, slot of lane within phrase)
    tbl_pos = jnp.zeros((cand_cap + 2, NMAX), jnp.int32).at[
        jnp.clip(gid, 0, cand_cap + 1), jnp.clip(s_slot, 0, NMAX - 1)
    ].set(s_pos, mode="drop")
    tbl_freq = jnp.zeros((cand_cap + 2, NMAX), jnp.int32).at[
        jnp.clip(gid, 0, cand_cap + 1), jnp.clip(s_slot, 0, NMAX - 1)
    ].set(s_freq, mode="drop")
    tbl_pw = jnp.ones((cand_cap + 2, NMAX), jnp.int32).at[
        jnp.clip(gid, 0, cand_cap + 1), jnp.clip(s_slot, 0, NMAX - 1)
    ].set(s_pw, mode="drop")
    tbl_ws = jnp.zeros((cand_cap + 2, NMAX), jnp.int32).at[
        jnp.clip(gid, 0, cand_cap + 1), jnp.clip(s_slot, 0, NMAX - 1)
    ].set(s_ws, mode="drop")

    c_row = grp_row[:cand_cap]
    c_doc = grp_doc[:cand_cap]
    c_ok = (c_row < b) & (grp_count[:cand_cap] == pb.n_terms[jnp.clip(c_row, 0, b - 1)])

    # overflow handling: too many groups, or any candidate occurrence count
    # beyond FMAX -> that row must be recomputed on the host
    n_groups = jnp.sum(is_start.astype(jnp.int32))
    too_many = n_groups > cand_cap
    freq_over = jnp.zeros((b + 1,), jnp.bool_).at[jnp.clip(c_row, 0, b)].max(
        c_ok & (jnp.max(tbl_freq[:cand_cap], axis=1) > fmax), mode="drop"
    )
    overflow = freq_over[:b] | too_many

    # ---- position windows: unpack fixed-width deltas + cumsum ----
    fidx = jnp.arange(fmax, dtype=jnp.int32)
    occ = tbl_pos[:cand_cap, :, None] + fidx[None, None, :]  # [C, NMAX, FMAX]
    pvalid = fidx[None, None, :] < tbl_freq[:cand_cap, :, None]
    w_slot = tbl_pw[:cand_cap]  # [C,NMAX] per-candidate per-slot stream coords
    ws_slot = tbl_ws[:cand_cap]
    bitpos = occ * w_slot[:, :, None]
    widx = ws_slot[:, :, None] + (bitpos >> 5)
    shift = (bitpos & 31).astype(jnp.uint32)
    pos_limit = dev.positions.shape[0] - 1
    w0 = dev.positions[jnp.clip(widx, 0, pos_limit)]
    w1 = dev.positions[jnp.clip(widx + 1, 0, pos_limit)]
    lo = w0 >> shift
    hi = jnp.where(shift == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - shift))
    mask = jnp.where(
        w_slot[:, :, None] >= 32,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << w_slot[:, :, None].astype(jnp.uint32)) - jnp.uint32(1),
    )
    deltas = ((lo | hi) & mask).astype(jnp.int32)
    deltas = jnp.where(pvalid, deltas, 0)
    pwin = jnp.cumsum(deltas, axis=-1)  # absolute positions per run
    pwin = jnp.where(pvalid, pwin, jnp.int32(-(2**30)))

    base_pos = pwin[:, 0, :]  # [C, FMAX] slot-0 positions
    base_valid = pvalid[:, 0, :]
    if slop_max == 0:
        # exact: slot j must contain p0 + j (ExactPhraseScorer,
        # phrase_scorer.rs:122); pf = match count
        match_f0 = base_valid
        for j in range(1, NMAX):
            need = (jnp.int32(j) < pb.n_terms[jnp.clip(c_row, 0, b - 1)])[:, None]
            hit = jnp.any(
                pwin[:, j, None, :] == (base_pos[:, :, None] + j), axis=-1
            )  # [C, FMAX]
            match_f0 = match_f0 & jnp.where(need, hit, True)
        pf = jnp.sum(match_f0 & base_valid, axis=1).astype(jnp.float32)  # [C]
    else:
        # sloppy: greedy ordered chain — for each slot-0 occurrence take the
        # FIRST slot-j position strictly after the previous slot's pick;
        # match iff total gap <= row slop; sloppy freq = 1/(distance+1)
        # summed as an ascending-distance histogram so the host oracle
        # (host_engine.phrase_postings) reproduces it bit-for-bit
        # (SloppyPhraseScorer analog, phrase_scorer.rs:442).
        big = jnp.int32(2**30)
        n_of_row = pb.n_terms[jnp.clip(c_row, 0, b - 1)]  # [C]
        prev = base_pos  # [C, FMAX]
        found = base_valid
        for j in range(1, NMAX):
            need = (jnp.int32(j) < n_of_row)[:, None]  # [C,1]
            cand = pwin[:, j, None, :]  # [C, 1, FMAX]
            gt = (cand > prev[:, :, None]) & pvalid[:, j, None, :]
            nxt = jnp.min(jnp.where(gt, cand, big), axis=-1)  # [C, FMAX]
            found = found & jnp.where(need, nxt < big, True)
            prev = jnp.where(need, jnp.minimum(nxt, big), prev)
        distance = prev - base_pos - (n_of_row[:, None] - 1)
        row_slop = pb.slop[jnp.clip(c_row, 0, b - 1)][:, None]
        matched_f0 = found & base_valid & (distance <= row_slop)
        pf = jnp.zeros((base_pos.shape[0],), jnp.float32)
        for d in range(slop_max + 1):
            cnt = jnp.sum(matched_f0 & (distance == d), axis=1).astype(jnp.float32)
            pf = pf + cnt * jnp.float32(1.0 / (d + 1.0))

    # ---- BM25 with tf = phrase_freq ----
    safe_row = jnp.clip(c_row, 0, b - 1)
    safe_doc = jnp.clip(c_doc, 0, md - 1)
    norm_b = dev.norms.reshape(-1)[pb.fid[safe_row] * md + safe_doc].astype(jnp.int32)
    cval = pb.cache.reshape(-1)[pb.fid[safe_row] * 256 + norm_b]
    score = pb.weight[safe_row] * pf / (pf + cval)
    matched = c_ok & (pf > 0)

    # ---- exact per-row top-k over candidates ----
    key_r = jnp.where(matched, c_row, jnp.int32(b))
    key_s = jnp.where(matched, -score, jnp.inf)
    key_d = jnp.where(matched, c_doc, DOC_PAD)
    o_row, o_negs, o_doc = jax.lax.sort((key_r, key_s, key_d), num_keys=3)
    pr = jnp.concatenate([jnp.full((1,), -1, jnp.int32), o_row[:-1]])
    fresh = o_row < b  # docs unique per row already
    fint = fresh.astype(jnp.int32)
    c_excl = jnp.cumsum(fint) - fint
    idx = jnp.arange(cand_cap, dtype=jnp.int32)
    row_change = o_row != pr
    row_start = jax.lax.associative_scan(jnp.maximum, jnp.where(row_change, idx, 0))
    rank = c_excl - jnp.take(c_excl, row_start)
    sel = fresh & (rank < k)
    out_scores = jnp.full((b, k), -jnp.inf, jnp.float32).at[
        jnp.where(sel, o_row, b), jnp.where(sel, rank, 0)
    ].set(-o_negs, mode="drop")
    out_docs = jnp.full((b, k), DOC_PAD).at[
        jnp.where(sel, o_row, b), jnp.where(sel, rank, 0)
    ].set(o_doc, mode="drop")
    hits = jnp.zeros((b,), jnp.int32).at[jnp.where(fresh, o_row, b)].add(
        jnp.ones_like(o_row), mode="drop"
    )
    return out_scores, out_docs, hits, overflow


execute_phrases = jax.jit(
    execute_phrases_impl,
    static_argnames=("k", "cand_cap", "fmax", "slop_max", "has_ef"),
)
