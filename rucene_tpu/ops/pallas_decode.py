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
                   data_ref, docs_ref, freqs_ref, norms_ref, scratch, sems, *, g_items):
    pid = pl.program_id(0)

    def start_dma(g):
        i = pid * g_items + g
        row0 = (off_ref[i] >> 10) * 8  # 1024-word-aligned start row
        return pltpu.make_async_copy(
            data_ref.at[pl.ds(row0, WIN_ROWS), :], scratch.at[g], sems.at[g]
        )

    for g in range(g_items):
        start_dma(g).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, WIN_ROWS), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)

    for g in range(g_items):
        i = pid * g_items + g
        start_dma(g).wait()
        words = scratch[g]  # int32[WIN_ROWS, 128]
        # 8-bit limbs: exact under the MXU's bf16 input rounding (<=255
        # needs 8 mantissa bits; 16-bit halves would be corrupted).
        # All four limbs ride ONE matmul per fetch pair (concatenated
        # along columns); w0/w1 ride stacked rowsel rows — 1 MXU call
        # per extract instead of 8 (the kernel was MXU-invocation-bound).
        limbs_cat = jnp.concatenate(
            [((words >> (8 * j)) & 0xFF).astype(jnp.float32) for j in range(4)],
            axis=1,
        )  # [WIN_ROWS, 512]
        local = off_ref[i] & 1023  # word offset inside the window

        def _rows_to_int(parts):
            return (
                parts[:, 0:128].astype(jnp.int32)
                | (parts[:, 128:256].astype(jnp.int32) << 8)
                | (parts[:, 256:384].astype(jnp.int32) << 16)
                | (parts[:, 384:512].astype(jnp.int32) << 24)
            )

        def fetch(widx):
            """widx int32[128,1] window-absolute word index -> uint32[128,1]."""
            rowsel = (row_iota == (widx >> 7)).astype(jnp.float32)  # [128,16]
            parts = jnp.dot(rowsel, limbs_cat, preferred_element_type=jnp.float32)
            row_int = _rows_to_int(parts)  # [128, 128]
            colsel = (col_iota == (widx & 127)).astype(jnp.int32)  # [128,128]
            w = jnp.sum(colsel * row_int, axis=1, keepdims=True)
            return w.astype(jnp.uint32)

        def fetch2(widx0, widx1):
            """Two window-absolute word columns in one MXU call."""
            rowsel = jnp.concatenate(
                [
                    (row_iota == (widx0 >> 7)).astype(jnp.float32),
                    (row_iota == (widx1 >> 7)).astype(jnp.float32),
                ],
                axis=0,
            )  # [256, WIN_ROWS]
            parts = jnp.dot(rowsel, limbs_cat, preferred_element_type=jnp.float32)
            row_int = _rows_to_int(parts)  # [256, 128]
            c0 = (col_iota == (widx0 & 127)).astype(jnp.int32)
            c1 = (col_iota == (widx1 & 127)).astype(jnp.int32)
            w0 = jnp.sum(c0 * row_int[0:BLOCK], axis=1, keepdims=True)
            w1 = jnp.sum(c1 * row_int[BLOCK : 2 * BLOCK], axis=1, keepdims=True)
            return w0.astype(jnp.uint32), w1.astype(jnp.uint32)

        def extract(bits, word_base):
            bitpos = lane * bits
            widx = local + word_base + (bitpos >> 5)
            shift = (bitpos & 31).astype(jnp.uint32)
            w0, w1 = fetch2(widx, widx + 1)
            lo = w0 >> shift
            hi = jnp.where(shift == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - shift))
            mask = jnp.where(
                bits >= 32,
                jnp.uint32(0xFFFFFFFF),
                (jnp.uint32(1) << jnp.uint32(bits)) - jnp.uint32(1),
            )
            return ((lo | hi) & mask).astype(jnp.int32)

        def prefix_sum(col):
            # inclusive prefix sum: 7 shift-add steps (no cumsum in Mosaic);
            # rolled-in tail entries are masked off by lane index
            acc = col
            for s in (1, 2, 4, 8, 16, 32, 64):
                rolled = pltpu.roll(acc, shift=s, axis=0)
                acc = acc + jnp.where(lane >= s, rolled, 0)
            return acc

        db = dbits_ref[i]
        is_ef = db >= EF_TAG
        l_ef = jnp.maximum(db - EF_TAG, 0)
        dwords = jnp.where(is_ef, 4 * l_ef + EF_UNARY_WORDS, 4 * db)

        def docs_for(_):
            deltas = extract(db, 0)
            return prefix_sum(deltas)

        def docs_ef(_):
            # Elias-Fano plane: low bits FOR-packed at width l, high bits a
            # 384-bit unary stream. select_i (position of the i-th one) is
            # recovered transpose-free: per 128-bit row r, compare the
            # running rank column against a target iota ([128,128], lanes =
            # targets), reduce over positions, then row->column via an
            # identity mask (Mosaic has no cheap vector transpose).
            low = extract(l_ef, 0)  # [128,1]; l==0 -> zeros
            ubase = 4 * l_ef
            sel_row = jnp.zeros((1, BLOCK), jnp.int32)
            off_r = jnp.int32(0)
            for r in range(3):  # 3 rows x 128 bits = the 384-bit plane
                widx = local + ubase + r * 4 + (lane >> 5)
                w_r = fetch(widx)  # [128,1] uint32
                bit_r = ((w_r >> (lane & 31).astype(jnp.uint32)) & jnp.uint32(1)).astype(jnp.int32)
                cum_r = prefix_sum(bit_r) + off_r  # global rank at each position
                m_r = (col_iota >= cum_r).astype(jnp.int32)  # [pos, target]
                sel_row = sel_row + jnp.sum(m_r, axis=0, keepdims=True)
                off_r = jnp.max(cum_r)  # running total of ones so far
            # row [1,128] -> column [128,1] via the identity mask
            ident = (col_iota == lane).astype(jnp.int32)
            sel_col = jnp.sum(
                ident * jnp.broadcast_to(sel_row, (BLOCK, BLOCK)), axis=1, keepdims=True
            )
            hi = sel_col - lane
            return (hi << l_ef) + low

        vcol = jax.lax.cond(is_ef, docs_ef, docs_for, None)
        docs_ref[g, :] = (base_ref[i] + vcol)[:, 0]
        fb = fbits_ref[i]
        freqs_ref[g, :] = extract(fb, dwords)[:, 0]
        # inline norm-byte plane: 32 fixed-width words after the freqs
        norms_ref[g, :] = extract(jnp.int32(8), dwords + 4 * fb)[:, 0]


from functools import partial


MAX_CHUNK = 8192  # scalar-prefetch arrays live in SMEM: 4 * 32KB per chunk


@partial(jax.jit, static_argnames=("interpret",))
def decode_work_items_pallas(
    data2d: jax.Array,  # int32[N/128, 128]; N 1024-aligned with >=2048 pad
    off: jax.Array,  # int32[W] word offsets
    dbits: jax.Array,
    fbits: jax.Array,
    base: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Raw (docs, freqs, norm_bytes) int32[W,128]; caller applies
    count/validity masks.
    W must be a multiple of G (work lists are power-of-two padded). Large
    work lists are split into MAX_CHUNK slices so per-item metadata fits
    in SMEM."""
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
            pltpu.VMEM((g_items, WIN_ROWS, BLOCK), jnp.int32),
            pltpu.SemaphoreType.DMA((g_items,)),
        ],
    )
    docs, freqs, norms = pl.pallas_call(
        partial(_decode_kernel, g_items=g_items),
        out_shape=[
            jax.ShapeDtypeStruct((w, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((w, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((w, BLOCK), jnp.int32),
        ],
        grid_spec=spec,
        interpret=interpret,
    )(off, dbits, fbits, base, data2d)
    return docs, freqs, norms
