"""Pallas TPU kernel: fused postings-block decode.

The XLA decode (ops/decode.py) performs two random HBM gathers per posting
lane (the 2-word window), which is gather-latency-bound on TPU. This kernel
instead DMAs, per work item, the aligned 2048-word window containing the
block (Mosaic requires 1024-word-aligned HBM slices; one block needs at
most 256 words), then extracts all 128 lanes with on-chip ops:

  word fetch : one-hot row-select as an MXU matmul over 16-bit word halves
               (f32-exact) + a VPU one-hot column select — no gathers;
  bit extract: uint32 shift/mask per lane;
  doc ids    : log-step shift-add prefix sum over the 128 deltas.

This is the TPU shape of the reference's fused SSE block decoder
(rucene src/core/codec/postings/simd_block_decoder.rs:24 — read+unpack+
prefix-sum in one pass). The pure-XLA ops.decode path remains the CPU /
fallback implementation; tests assert bit-identical outputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rucene_tpu.util.packing import EF_TAG, EF_UNARY_WORDS

BLOCK = 128
WIN_ROWS = 16  # 16 rows x 128 words = 2048-word window (two 1024 tiles)
G = 8  # work items per program
DATA_ALIGN_PAD = WIN_ROWS * 128  # build_device_segment pads data by this


def _decode_kernel(off_ref, dbits_ref, fbits_ref, base_ref,
                   data_ref, docs_ref, freqs_ref, norms_ref, scratch, sems,
                   *, g_items, has_ef, fid_ref=None, cache_ref=None):
    pid = pl.program_id(0)
    slot = pid % 2

    def dma(sl, step, g):
        i = step * g_items + g
        row0 = (off_ref[i] >> 10) * 8  # 1024-word-aligned start row
        return pltpu.make_async_copy(
            data_ref.at[pl.ds(row0, WIN_ROWS), :], scratch.at[sl, g], sems.at[sl, g]
        )

    # cross-step double buffering: this step's windows were started by the
    # previous step; we start the NEXT step's into the other slot so DMA
    # latency hides behind compute (manual DMAs get no BlockSpec pipeline)
    @pl.when(pid == 0)
    def _():
        for g in range(g_items):
            dma(0, 0, g).start()

    @pl.when(pid + 1 < pl.num_programs(0))
    def _():
        for g in range(g_items):
            dma((pid + 1) % 2, pid + 1, g).start()

    gb = g_items * BLOCK
    lane_all = jax.lax.broadcasted_iota(jnp.int32, (gb, 1), 0) % BLOCK
    item_of = jax.lax.broadcasted_iota(jnp.int32, (gb, 1), 0) // BLOCK
    row_iota_all = jax.lax.broadcasted_iota(jnp.int32, (gb, g_items * WIN_ROWS), 1)
    col_iota_all = jax.lax.broadcasted_iota(jnp.int32, (gb, BLOCK), 1)

    for g in range(g_items):
        dma(slot, pid, g).wait()

    # stacked 8-bit limbs of every window: [G*WIN_ROWS, 4*128]. 8-bit
    # limbs are exact under the MXU's bf16 input rounding.
    words_all = scratch[slot].reshape(g_items * WIN_ROWS, BLOCK)
    limbs_cat = jnp.concatenate(
        [((words_all >> (8 * j)) & 0xFF).astype(jnp.float32) for j in range(4)],
        axis=1,
    )  # [G*WIN_ROWS, 512]

    # per-item scalars (SMEM prefetch reads)
    i0 = pid * g_items
    off_s = [off_ref[i0 + g] & 1023 for g in range(g_items)]
    db_s = [dbits_ref[i0 + g] for g in range(g_items)]
    fb_s = [fbits_ref[i0 + g] for g in range(g_items)]
    base_s = [base_ref[i0 + g] for g in range(g_items)]
    if has_ef:
        is_ef_s = [db >= EF_TAG for db in db_s]
        l_ef_s = [jnp.maximum(db - EF_TAG, 0) for db in db_s]
        eff_db_s = [
            jnp.where(e, l, db)
            for e, l, db in zip(is_ef_s, l_ef_s, db_s)
        ]
        dwords_s = [
            jnp.where(e, 4 * l + EF_UNARY_WORDS, 4 * db)
            for e, l, db in zip(is_ef_s, l_ef_s, db_s)
        ]
    else:
        eff_db_s = db_s
        dwords_s = [4 * db for db in db_s]

    def per_item(vals):
        """Python list of per-item scalars -> [G*BLOCK, 1] lane broadcast."""
        out = jnp.zeros((gb, 1), jnp.int32)
        for g in range(g_items):
            out = jnp.where(item_of == g, vals[g], out)
        return out

    band = item_of * WIN_ROWS  # each item's row band in the stacked limbs

    def fetch_all(widx):
        """widx i32[G*BLOCK, 1] per-lane WINDOW-LOCAL word indices; one
        block-diagonal MXU matmul fetches every item's words at once."""
        rowsel = (row_iota_all == (widx >> 7) + band).astype(jnp.float32)
        parts = jnp.dot(rowsel, limbs_cat, preferred_element_type=jnp.float32)
        row_int = (
            parts[:, 0:128].astype(jnp.int32)
            | (parts[:, 128:256].astype(jnp.int32) << 8)
            | (parts[:, 256:384].astype(jnp.int32) << 16)
            | (parts[:, 384:512].astype(jnp.int32) << 24)
        )  # [G*BLOCK, 128]
        colsel = (col_iota_all == (widx & 127)).astype(jnp.int32)
        return jnp.sum(colsel * row_int, axis=1, keepdims=True).astype(jnp.uint32)

    def extract_all(bits_s, word_base_s):
        """Per-item widths/word-bases (scalar lists) -> [G*BLOCK, 1]."""
        bits_l = per_item(bits_s)
        base_l = per_item([o + wb for o, wb in zip(off_s, word_base_s)])
        bitpos = lane_all * bits_l
        widx = base_l + (bitpos >> 5)
        shift = (bitpos & 31).astype(jnp.uint32)
        w0 = fetch_all(widx)
        w1 = fetch_all(widx + 1)
        lo = w0 >> shift
        hi = jnp.where(shift == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - shift))
        mask = jnp.where(
            bits_l >= 32,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << bits_l.astype(jnp.uint32)) - jnp.uint32(1),
        )
        return ((lo | hi) & mask).astype(jnp.int32)

    def prefix_sum_all(col):
        # inclusive per-item prefix sum over the stacked [G*BLOCK, 1]
        # column: 7 shift-add steps; the lane_all mask stops carries at
        # item boundaries (no cumsum in Mosaic)
        acc = col
        for s in (1, 2, 4, 8, 16, 32, 64):
            rolled = pltpu.roll(acc, shift=s, axis=0)
            acc = acc + jnp.where(lane_all >= s, rolled, 0)
        return acc

    # doc plane (FOR deltas / EF low bits), freqs and inline norms for ALL
    # items in three batched extracts (the kernel was MXU-invocation and
    # per-item-chain bound; everything per-lane now runs G items wide)
    low_all = extract_all(eff_db_s, [0] * g_items)
    for_docs_all = prefix_sum_all(low_all)
    freq_all = extract_all(fb_s, dwords_s)
    norm_all = extract_all([jnp.int32(8)] * g_items, [d + 4 * f for d, f in zip(dwords_s, fb_s)])

    def per_item_row(vals):
        """Per-item scalars -> [g_items, 1] sublane broadcast."""
        out = jnp.zeros((g_items, 1), jnp.int32)
        gi = jax.lax.broadcasted_iota(jnp.int32, (g_items, 1), 0)
        for g in range(g_items):
            out = jnp.where(gi == g, vals[g], out)
        return out

    base_rows = per_item_row(base_s)
    if not has_ef:
        # FOR-only work list: ONE [G,128] store, no per-item writes/conds
        docs_ref[...] = base_rows + for_docs_all.reshape(g_items, BLOCK)
    else:
        # Batched Elias-Fano decode (no per-item lax.cond — the per-item
        # EF path's small matmuls plus one column->row relayout per item
        # dominated EF-heavy 1M-doc work lists). The 384-bit unary plane
        # is read lane-wise with the SAME batched fetch as the packed
        # planes; select_i (position of the (i+1)-th one) = #positions
        # whose running rank <= i, summed per item with one-hot MXU
        # matmuls (a segment reduce without any vector transpose).
        item_oh_T = (
            jax.lax.broadcasted_iota(jnp.int32, (g_items, gb), 1) // BLOCK
            == jax.lax.broadcasted_iota(jnp.int32, (g_items, gb), 0)
        ).astype(jnp.float32)  # [g, gb] item membership
        item_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (gb, g_items), 1) == item_of
        ).astype(jnp.float32)  # [gb, g]
        ubase_s = [o + 4 * l for o, l in zip(off_s, l_ef_s)]
        word_in_lane = lane_all >> 5  # 0..3
        bitsel = (lane_all & 31).astype(jnp.uint32)
        last_lane = lane_all == BLOCK - 1
        sel_rows = jnp.zeros((g_items, BLOCK), jnp.float32)
        off_prev = jnp.zeros((gb, 1), jnp.int32)
        for r in range(3):  # 3 x 128 bits = the 384-bit unary plane
            widx_r = per_item([ub + 4 * r for ub in ubase_s]) + word_in_lane
            w_r = fetch_all(widx_r)  # [gb,1]
            bit_r = ((w_r >> bitsel) & jnp.uint32(1)).astype(jnp.int32)
            cum_r = prefix_sum_all(bit_r) + off_prev  # running rank [gb,1]
            m_r = (col_iota_all >= cum_r).astype(jnp.float32)  # [gb,128]
            sel_rows = sel_rows + jnp.dot(
                item_oh_T, m_r, preferred_element_type=jnp.float32
            )
            tot_r = jnp.dot(  # per-item ones so far = rank at last lane
                item_oh_T,
                jnp.where(last_lane, cum_r, 0).astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )  # [g,1]
            off_prev = jnp.dot(
                item_oh, tot_r, preferred_element_type=jnp.float32
            ).astype(jnp.int32)
        iota_row = jax.lax.broadcasted_iota(jnp.int32, (g_items, BLOCK), 1)
        hi_rows = sel_rows.astype(jnp.int32) - iota_row
        l_rows = per_item_row(l_ef_s)
        ef_docs_rows = (hi_rows << l_rows) + low_all.reshape(g_items, BLOCK)
        is_ef_rows = per_item_row(
            [e.astype(jnp.int32) for e in is_ef_s]
        ) > 0
        docs_ref[...] = base_rows + jnp.where(
            is_ef_rows, ef_docs_rows, for_docs_all.reshape(g_items, BLOCK)
        )
    # freqs/norms: ONE sublane->lane relayout per plane per step instead
    # of one per item (the column->row writes dominated the kernel)
    freqs_ref[...] = freq_all.reshape(g_items, BLOCK)
    if cache_ref is None:
        norms_ref[...] = norm_all.reshape(g_items, BLOCK)
    else:
        # BM25 denominator select IN-KERNEL: cval = cache[fid, norm_byte]
        # as a one-hot VPU select from the resident [F,256] table. The
        # XLA-fusion equivalent is a per-lane gather that serializes
        # (~300 ms/batch at 16M lanes on v5e); the select is exact — it
        # copies the precomputed f32 table entry bit-for-bit.
        fid_s = [fid_ref[i0 + g] for g in range(g_items)]
        fid_l = per_item(fid_s)
        iota256 = jax.lax.broadcasted_iota(jnp.int32, (gb, 256), 1)
        onehot = (iota256 == norm_all).astype(jnp.float32)
        tbl = jnp.zeros((gb, 256), jnp.float32)
        for f in range(cache_ref.shape[0]):
            row = cache_ref[f, :][None, :]
            tbl = jnp.where(fid_l == f, jnp.broadcast_to(row, (gb, 256)), tbl)
        cval_col = jnp.sum(onehot * tbl, axis=1, keepdims=True)
        norms_ref[...] = cval_col.reshape(g_items, BLOCK)



# NOTE (r5): a v2 tile-compaction decode kernel (4x fewer MXU FLOPs via
# compacted [512, (limb, item)] operands) lived here and was DELETED
# after its on-chip A/B lost to v1: 361.5 vs 465.4 QPS at 1M packed mode
# (exp/logs/bench_1m_packed_v2_r5.log) — the extra transpose/compaction
# steps cost more than the saved select FLOPs at serving shapes. The
# deletion commit holds the implementation.


MAX_CHUNK = 8192  # scalar-prefetch arrays live in SMEM: 4 * 32KB per chunk


@partial(jax.jit, static_argnames=("interpret", "has_ef"))
def decode_work_items_pallas(
    data2d: jax.Array,  # int32[N/128, 128]; N 1024-aligned with >=2048 pad
    off: jax.Array,  # int32[W] word offsets
    dbits: jax.Array,
    fbits: jax.Array,
    base: jax.Array,
    interpret: bool = False,
    has_ef: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Raw (docs, freqs, norm_bytes) int32[W,128]; caller applies
    count/validity masks.
    W must be a multiple of G (work lists are power-of-two padded). Large
    work lists are split into MAX_CHUNK slices so per-item metadata fits
    in SMEM. has_ef=False (STATIC, caller checked blk_doc_bits) compiles
    the FOR-only program with no EF machinery at all."""
    w_total = off.shape[0]
    if w_total > MAX_CHUNK:
        outs = [
            decode_work_items_pallas(
                data2d,
                off[s : s + MAX_CHUNK],
                dbits[s : s + MAX_CHUNK],
                fbits[s : s + MAX_CHUNK],
                base[s : s + MAX_CHUNK],
                interpret=interpret,
                has_ef=has_ef,
            )
            for s in range(0, w_total, MAX_CHUNK)
        ]
        return tuple(
            jnp.concatenate([o[j] for o in outs], axis=0) for j in range(3)
        )
    w = w_total
    g_items = min(G, w)  # small (pow2-padded) lists use one item per step
    assert w % g_items == 0, f"work list {w} not a multiple of {g_items}"
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(w // g_items,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            # index_map receives (grid idx, *scalar_prefetch_refs)
            pl.BlockSpec((g_items, BLOCK), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_items, BLOCK), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_items, BLOCK), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, g_items, WIN_ROWS, BLOCK), jnp.int32),
            pltpu.SemaphoreType.DMA((2, g_items)),
        ],
    )
    docs, freqs, norms = pl.pallas_call(
        partial(_decode_kernel, g_items=g_items, has_ef=has_ef),
        out_shape=[
            jax.ShapeDtypeStruct((w, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((w, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((w, BLOCK), jnp.int32),
        ],
        grid_spec=spec,
        interpret=interpret,
    )(off, dbits, fbits, base, data2d)
    return docs, freqs, norms


def _scoring_kernel(off_ref, dbits_ref, fbits_ref, base_ref, fid_ref,
                    data_ref, cache_ref, docs_ref, freqs_ref, cval_ref,
                    scratch, sems, *, g_items, has_ef):
    _decode_kernel(
        off_ref, dbits_ref, fbits_ref, base_ref, data_ref, docs_ref,
        freqs_ref, cval_ref, scratch, sems, g_items=g_items, has_ef=has_ef,
        fid_ref=fid_ref, cache_ref=cache_ref,
    )


@partial(jax.jit, static_argnames=("interpret", "has_ef"))
def decode_score_work_items_pallas(
    data2d: jax.Array,
    off: jax.Array,
    dbits: jax.Array,
    fbits: jax.Array,
    base: jax.Array,
    fid: jax.Array,  # i32[W] per-item norms/cache row
    cache: jax.Array,  # f32[F, 256] norm-byte -> BM25 denominator
    interpret: bool = False,
    has_ef: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Like decode_work_items_pallas, but the third output is the BM25
    denominator cval = cache[fid, norm_byte] (f32[W,128]) selected
    in-kernel instead of the raw norm byte."""
    w_total = off.shape[0]
    f_pad = -(-cache.shape[0] // 8) * 8  # f32 sublane tile
    if cache.shape[0] != f_pad:
        cache = jnp.pad(cache, ((0, f_pad - cache.shape[0]), (0, 0)))
    if w_total > MAX_CHUNK:
        outs = [
            decode_score_work_items_pallas(
                data2d,
                off[s : s + MAX_CHUNK],
                dbits[s : s + MAX_CHUNK],
                fbits[s : s + MAX_CHUNK],
                base[s : s + MAX_CHUNK],
                fid[s : s + MAX_CHUNK],
                cache,
                interpret=interpret,
                has_ef=has_ef,
            )
            for s in range(0, w_total, MAX_CHUNK)
        ]
        return tuple(
            jnp.concatenate([o[j] for o in outs], axis=0) for j in range(3)
        )
    w = w_total
    g_items = min(G, w)
    assert w % g_items == 0, f"work list {w} not a multiple of {g_items}"
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(w // g_items,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((f_pad, 256), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g_items, BLOCK), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_items, BLOCK), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_items, BLOCK), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, g_items, WIN_ROWS, BLOCK), jnp.int32),
            pltpu.SemaphoreType.DMA((2, g_items)),
        ],
    )
    docs, freqs, cval = pl.pallas_call(
        partial(_scoring_kernel, g_items=g_items, has_ef=has_ef),
        out_shape=[
            jax.ShapeDtypeStruct((w, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((w, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((w, BLOCK), jnp.float32),
        ],
        grid_spec=spec,
        interpret=interpret,
    )(off, dbits, fbits, base, fid, data2d, cache)
    return docs, freqs, cval
