"""Device-side postings block decode: vectorized bit-unpack + delta prefix-sum.

This replaces the reference's scalar/SSE block decoders
(rucene src/core/codec/postings/simd_block_decoder.rs:24,
 posting_reader.rs:343-1100) with a batched XLA formulation: for any batch of
blocks (arbitrary leading shape), gather a 2-word window per lane from the
flat packed-words buffer and shift/mask — no per-value loop, no branches.
Works identically on CPU and TPU; a Pallas variant lives in
rucene_tpu.ops.pallas_decode for the TPU hot path.

Layout contract (see rucene_tpu.util.packing): 128 values at width ``bits``
occupy exactly 4*bits uint32 words (128*bits/32), LSB-first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rucene_tpu.util.packing import BLOCK_SIZE

# docid sentinel for masked / padded lanes: larger than any valid doc id so
# sorted combines push padding to the end.
INVALID_DOC = jnp.int32(2**31 - 1)


def unpack(data: jax.Array, word_off: jax.Array, bits: jax.Array) -> jax.Array:
    """Unpack BLOCK_SIZE values per block from ``data``.

    data:     uint32[W] flat packed buffer (one trailing pad word recommended)
    word_off: int32[...] word offset of each block
    bits:     int32[...] bit width of each block (1..32)
    returns:  uint32[..., BLOCK_SIZE]
    """
    data = data.astype(jnp.uint32)
    lane = jnp.arange(BLOCK_SIZE, dtype=jnp.int32)
    bitpos = lane * bits[..., None]  # [..., 128]
    widx = word_off[..., None] + (bitpos >> 5)
    shift = (bitpos & 31).astype(jnp.uint32)
    limit = data.shape[0] - 1
    w0 = data[jnp.clip(widx, 0, limit)]
    w1 = data[jnp.clip(widx + 1, 0, limit)]
    lo = w0 >> shift
    hi = jnp.where(shift == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - shift))
    mask = jnp.where(
        bits[..., None] >= 32,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << bits[..., None].astype(jnp.uint32)) - jnp.uint32(1),
    )
    return (lo | hi) & mask


def decode_doc_blocks(
    data: jax.Array,
    word_off: jax.Array,
    doc_bits: jax.Array,
    base: jax.Array,
    count: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Decode doc-id blocks: bit-unpack deltas then inclusive prefix-sum.

    base:  int32[...] doc id preceding the block (-1 for a list's first block)
    count: int32[...] valid docs in the block (BLOCK_SIZE, or less for tail)
    returns (docids int32[...,128] with INVALID_DOC padding, valid bool mask)
    """
    deltas = unpack(data, word_off, doc_bits).astype(jnp.int32)
    docs = base[..., None] + jnp.cumsum(deltas, axis=-1)
    valid = jnp.arange(BLOCK_SIZE, dtype=jnp.int32) < count[..., None]
    docs = jnp.where(valid, docs, INVALID_DOC)
    return docs, valid


def decode_freq_blocks(
    data: jax.Array,
    word_off: jax.Array,
    doc_bits: jax.Array,
    freq_bits: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """Decode the freq half of doc blocks (stored right after the doc words:
    freq words start at word_off + 4*doc_bits). Padded lanes get freq 0."""
    freq_off = word_off + 4 * doc_bits
    freqs = unpack(data, freq_off, freq_bits).astype(jnp.int32)
    return jnp.where(valid, freqs, 0)


def decode_norm_blocks(
    data: jax.Array,
    word_off: jax.Array,
    doc_bits: jax.Array,
    freq_bits: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """Decode the inline norm-byte plane (32 words after the freq words).
    One SmallFloat byte per posting, stored at pack time so scoring never
    random-gathers a [fields, max_doc] norms table. Padded lanes get 0."""
    norm_off = word_off + 4 * (doc_bits + freq_bits)
    nb = unpack(data, norm_off, jnp.full_like(doc_bits, 8)).astype(jnp.int32)
    return jnp.where(valid, nb, 0)
