"""Host-side fixed-width bit packing for 128-value postings blocks.

Format: each block packs BLOCK_SIZE unsigned values at a fixed bit width
``bits`` (1..32), LSB-first into a little-endian uint32 word stream: value
``i`` occupies bit positions [i*bits, (i+1)*bits). This is the on-disk and
in-HBM layout decoded by the device kernels in rucene_tpu.ops.decode.

The reference's analogous component is the FOR/packed-ints block codec
(rucene src/core/util/packed/packed_simd.rs, codec/postings/for_util.rs);
we use a single flat LSB-first layout rather than its lane-interleaved SSE
layout, because the TPU decoder is a vectorized shift/mask over a gathered
word window, not a 4-lane SSE register dance.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # docs per postings block (parity: posting_format.rs:36)

# Elias-Fano doc-plane encoding (adaptive per block, the analog of the
# reference's PF/EF/BITSET choice, posting_reader.rs:336-341):
# blk_doc_bits = EF_TAG + l marks an EF plane with low width l; the unary
# high-bit plane is a fixed EF_UNARY_WORDS words (384 bits: 128 ones +
# <=255 zeros because l is chosen so (last-base) >> l < 256). l == 0 is
# the dense/bitmap (reference BITSET) regime.
EF_TAG = 64
EF_UNARY_WORDS = 12


def doc_plane_words_np(doc_bits: np.ndarray) -> np.ndarray:
    """Words occupied by each block's doc plane (vectorized, both encodings)."""
    db = np.asarray(doc_bits)
    return np.where(db >= EF_TAG, 4 * (db - EF_TAG) + EF_UNARY_WORDS, 4 * db)


def decode_ef_doc_plane(words: np.ndarray, l: int) -> np.ndarray:
    """Numpy reference EF decode: plane words -> cumulative offsets
    v_i = doc_i - base, int64[BLOCK_SIZE]. ``words`` = 4*l low words then
    EF_UNARY_WORDS unary words."""
    if l:
        low = unpack_block(words[: 4 * l].astype(np.uint64), l).astype(np.int64)
    else:
        low = np.zeros(BLOCK_SIZE, np.int64)
    uw = words[4 * l : 4 * l + EF_UNARY_WORDS].astype(np.uint32)
    bits = ((uw[:, None] >> np.arange(32, dtype=np.uint32)) & np.uint32(1)).reshape(-1)
    ones_pos = np.flatnonzero(bits)[:BLOCK_SIZE].astype(np.int64)
    hi = ones_pos - np.arange(BLOCK_SIZE, dtype=np.int64)
    return (hi << l) + low


def bits_required(max_value: int) -> int:
    """Minimum bit width to represent max_value (at least 1, at most 32)."""
    if max_value < 0:
        raise ValueError(f"negative value {max_value} cannot be bit-packed")
    return max(1, int(max_value).bit_length())


def words_per_block(bits: int, n: int = BLOCK_SIZE) -> int:
    return (n * bits + 31) // 32


def pack_block(values: np.ndarray, bits: int) -> np.ndarray:
    """Pack ``values`` (uint32, len<=BLOCK_SIZE after padding by caller) at
    ``bits`` width into a uint32 word array. len(values) must be BLOCK_SIZE."""
    values = np.asarray(values, dtype=np.uint64)
    n = len(values)
    if n != BLOCK_SIZE:
        raise ValueError(f"pack_block expects exactly {BLOCK_SIZE} values, got {n}")
    if bits < 1 or bits > 32:
        raise ValueError(f"bits must be in [1,32], got {bits}")
    if bits < 32 and np.any(values >> np.uint64(bits)):
        raise ValueError(f"value out of range for {bits}-bit packing")
    nwords = words_per_block(bits, n)
    out = np.zeros(nwords, dtype=np.uint64)
    bitpos = np.arange(n, dtype=np.uint64) * np.uint64(bits)
    widx = (bitpos >> np.uint64(5)).astype(np.int64)
    shift = bitpos & np.uint64(31)
    lo = (values << shift) & np.uint64(0xFFFFFFFF)
    hi = values >> (np.uint64(32) - shift)  # shift==0 -> values>>32 == 0 (uint64)
    np.bitwise_or.at(out, widx, lo)
    spill = widx + 1 < nwords
    np.bitwise_or.at(out, widx[spill] + 1, hi[spill])
    return out.astype(np.uint32)


def unpack_block(words: np.ndarray, bits: int, n: int = BLOCK_SIZE) -> np.ndarray:
    """Reference (numpy) decoder; the JAX decoder must match this exactly."""
    words = np.asarray(words, dtype=np.uint64)
    bitpos = np.arange(n, dtype=np.uint64) * np.uint64(bits)
    widx = (bitpos >> np.uint64(5)).astype(np.int64)
    shift = bitpos & np.uint64(31)
    padded = np.concatenate([words, np.zeros(1, dtype=np.uint64)])
    lo = padded[widx] >> shift
    hi = np.where(shift == 0, np.uint64(0), padded[widx + 1] << (np.uint64(32) - shift))
    mask = np.uint64(0xFFFFFFFF) if bits == 32 else (np.uint64(1) << np.uint64(bits)) - np.uint64(1)
    return ((lo | hi) & mask).astype(np.uint32)


def pack_array(values: np.ndarray, bits: int) -> np.ndarray:
    """Bit-pack an arbitrary-length uint64 array at width <=57 into uint64
    words viewed as little-endian u8 bytes -> returned as uint8. Values up
    to 57 bits fit a 2-word (16-byte) window, which the decoder reads via
    byte gathers; doc-values columns use this (direct_writer.rs analog)."""
    values = np.asarray(values, dtype=np.uint64)
    if bits < 1 or bits > 57:
        raise ValueError(f"bits must be in [1,57], got {bits}")
    if bits < 64 and np.any(values >> np.uint64(bits)):
        raise ValueError(f"value out of range for {bits}-bit packing")
    n = len(values)
    total_bytes = (n * bits + 7) // 8 + 8  # +8 pad for the 2-word window
    out = np.zeros((total_bytes + 7) // 8, dtype=np.uint64)
    out_bytes = out.view(np.uint8)
    bitpos = np.arange(n, dtype=np.uint64) * np.uint64(bits)
    bidx = (bitpos >> np.uint64(3)).astype(np.int64)  # starting byte
    shift = bitpos & np.uint64(7)
    # each value occupies <= 8 bytes starting at bidx after shifting
    shifted = values << shift  # fits in u64 for bits<=57, shift<=7
    for b in range(8):
        np.bitwise_or.at(
            out_bytes, bidx + b, ((shifted >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.uint8)
        )
    return out_bytes[:total_bytes].copy()


def unpack_array(data: np.ndarray, bits: int, n: int) -> np.ndarray:
    """Inverse of pack_array: uint8 buffer -> uint64[n]."""
    data = np.asarray(data, dtype=np.uint8)
    if n == 0:
        return np.zeros(0, np.uint64)
    bitpos = np.arange(n, dtype=np.uint64) * np.uint64(bits)
    bidx = (bitpos >> np.uint64(3)).astype(np.int64)
    shift = bitpos & np.uint64(7)
    padded = np.concatenate([data, np.zeros(8, np.uint8)])
    acc = np.zeros(n, np.uint64)
    for b in range(8):
        acc |= padded[bidx + b].astype(np.uint64) << np.uint64(8 * b)
    mask = (np.uint64(1) << np.uint64(bits)) - np.uint64(1)
    return (acc >> shift) & mask
