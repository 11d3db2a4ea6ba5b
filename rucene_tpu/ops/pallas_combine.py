"""Mosaic hist-matmul combine: decoded posting lanes -> dense per-query
accumulators via one-hot MXU matmuls instead of XLA scatter-add.

The dense executor branch's scatter-add costs ~17-27ns per lane
(serialization-bound) — the dominant device cost at million-doc corpora.
This kernel accumulates the same sums as bucket tiles on the MXU: the
host (ops/combine_tables.py) orders (work item, bucket) entries by bucket;
each grid step processes G entries of ONE bucket, building for every entry
a [128 cols, 128 lanes] value matrix (3 bf16 score limbs + the clause-count
encoding, one column group per query row) and a [128 lanes, 128 docs]
one-hot doc matrix per 128-doc chunk of the bucket, then accumulates
dot(values, one_hot) into the bucket's [4*32, C] tile. Output blocks use
Pallas revisiting: consecutive steps of one bucket keep the tile in VMEM;
the tile flushes to HBM when the bucket changes.

Exactness: scores split into three bf16 limbs (s = hi + mid + lo up to
~half an f32 ulp; each product with a 0/1 one-hot is exact; f32 MXU
accumulation). Clause-count encodings are powers of two < 2^17, exact in
bf16, with per-doc sums < 2^24 — integer-exact in f32. Combine order
differs from the scatter path only in float association, the same
tolerance class as the executor's documented scatter behavior.

Row capacity: 32 query rows per kernel call (the 128 columns hold 4
groups of 32); callers chunk larger batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rucene_tpu.ops.combine_tables import C_BUCKET, G_ENTRIES, MAX_ROWS


def _combine_kernel(gb_ref, gf_ref, docs_ref, sc_ref, row_ref, enc_ref, out_ref):
    t = pl.program_id(0)
    bucket = gb_ref[t]
    g_entries = docs_ref.shape[0]
    c_bucket = out_ref.shape[2]
    sub = t % 8  # row/enc blocks cover 8 grid steps (tiling minimum)

    local = docs_ref[...] - bucket * c_bucket  # [G, 128] i32
    inb = (local >= 0) & (local < c_bucket)
    s = jnp.where(inb, sc_ref[...], 0.0)  # [G, 128] f32
    # three-limb bf16 split (exact residuals; see module docstring)
    hi = s.astype(jnp.bfloat16)
    r1 = s - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    r2 = r1 - mid.astype(jnp.float32)
    lo = r2.astype(jnp.bfloat16)
    # one transpose per step puts lane-local doc ids on sublanes for the
    # one-hot RHS; everything else is broadcast-built (no relayouts)
    local_t = jnp.where(inb, local, -1).transpose(1, 0)  # [128, G]

    colid = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    chunk_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    vals_g = []
    for g in range(g_entries):
        r = row_ref[sub, g]
        encv = enc_ref[sub, g]
        sel0 = (colid == r).astype(jnp.float32)
        sel1 = (colid == MAX_ROWS + r).astype(jnp.float32)
        sel2 = (colid == 2 * MAX_ROWS + r).astype(jnp.float32)
        sel3 = (colid == 3 * MAX_ROWS + r).astype(jnp.float32)
        vals_g.append(
            (
                sel0 * hi[g : g + 1, :].astype(jnp.float32)
                + sel1 * mid[g : g + 1, :].astype(jnp.float32)
                + sel2 * lo[g : g + 1, :].astype(jnp.float32)
                + sel3 * encv
            ).astype(jnp.bfloat16)  # [128 cols, 128 lanes]; one limb per col
        )
    chunk_accs = []
    for ch in range(c_bucket // 128):
        a = jnp.zeros((128, 128), jnp.float32)
        for g in range(g_entries):
            oh = (local_t[:, g : g + 1] == chunk_iota + ch * 128).astype(
                jnp.bfloat16
            )
            a = a + jnp.dot(vals_g[g], oh, preferred_element_type=jnp.float32)
        chunk_accs.append(a)
    acc = jnp.concatenate(chunk_accs, axis=1)

    contrib_scores = acc[0:MAX_ROWS] + acc[MAX_ROWS : 2 * MAX_ROWS] + acc[
        2 * MAX_ROWS : 3 * MAX_ROWS
    ]
    contrib_counts = acc[3 * MAX_ROWS : 4 * MAX_ROWS]
    contrib = jnp.concatenate([contrib_scores, contrib_counts], axis=0)

    @pl.when(gf_ref[t] == 1)
    def _():
        out_ref[0] = contrib

    @pl.when(gf_ref[t] == 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


def _pad_tg(arr, t, g):
    """[T*G] -> [ceil8(T), 128]: per-step row padded to the VMEM tile
    minimum (block = 8 steps x 128)."""
    t8 = ((t + 7) // 8) * 8
    out = jnp.zeros((t8, 128), arr.dtype)
    return out.at[:t, :g].set(arr.reshape(t, g))


@partial(jax.jit, static_argnames=("n_buckets", "c_bucket", "interpret"))
def combine_lanes_pallas(
    g_bucket: jax.Array,  # i32[T]
    g_first: jax.Array,  # i32[T]
    docs_e: jax.Array,  # i32[T*G, 128] absolute doc ids per entry lane
    sc_e: jax.Array,  # f32[T*G, 128] scores (0 outside)
    row_e: jax.Array,  # i32[T*G] query row per entry
    enc_e: jax.Array,  # f32[T*G] clause-count encoding per entry
    n_buckets: int,
    c_bucket: int = C_BUCKET,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (acc_score f32[32, n_buckets*c_bucket],
    acc_counts f32[32, n_buckets*c_bucket])."""
    t = g_bucket.shape[0]
    g_entries = docs_e.shape[0] // t

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(
                (g_entries, 128), lambda i, gb, gf: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g_entries, 128), lambda i, gb, gf: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, 128), lambda i, gb, gf: (i // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, 128), lambda i, gb, gf: (i // 8, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * MAX_ROWS, c_bucket),
            lambda i, gb, gf: (gb[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _combine_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_buckets, 2 * MAX_ROWS, c_bucket), jnp.float32
        ),
        interpret=interpret,
    )(
        g_bucket,
        g_first,
        docs_e,
        sc_e,
        _pad_tg(row_e, t, g_entries),
        _pad_tg(enc_e, t, g_entries),
    )
    # [NB, 64, C] -> [64, NB*C] -> scores [32, md], counts [32, md]
    flat = out.transpose(1, 0, 2).reshape(2 * MAX_ROWS, n_buckets * c_bucket)
    return flat[:MAX_ROWS], flat[MAX_ROWS:]


def combine_lanes_reference(
    docs: np.ndarray, sc: np.ndarray, rows: np.ndarray, encs: np.ndarray,
    wi_valid: np.ndarray, b: int, md: int,
) -> tuple[np.ndarray, np.ndarray]:
    """numpy oracle: plain scatter-add of every valid lane."""
    acc_s = np.zeros((b, md), np.float64)
    acc_c = np.zeros((b, md), np.int64)
    w, lanes = docs.shape
    for i in range(w):
        if not wi_valid[i]:
            continue
        for l2 in range(lanes):
            d = docs[i, l2]
            if 0 <= d < md:
                acc_s[rows[i], d] += sc[i, l2]
                acc_c[rows[i], d] += encs[i]
    return acc_s, acc_c
