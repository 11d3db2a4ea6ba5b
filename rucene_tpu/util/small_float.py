"""Lucene SmallFloat byte315 quantization (3-bit mantissa, 5-bit exponent, zero-exp 15).

BM25 norm parity depends bit-for-bit on this encoding; semantics match the
reference implementation (rucene src/core/util/small_float.rs:16-37).
"""

from __future__ import annotations

import numpy as np


def float_to_byte315(f: float | np.ndarray) -> np.ndarray:
    """Encode float32 -> uint8 with 3-bit mantissa / 5-bit exponent.

    Vectorized over numpy arrays; scalar input returns a 0-d array.
    """
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32)
    small = bits >> (24 - 3)
    lo = np.int32((63 - 15) << 3)
    hi = lo + np.int32(0x100)
    out = (small - lo).astype(np.int64)
    out = np.where(small <= lo, np.where(bits <= 0, 0, 1), out)
    out = np.where(small >= hi, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: int | np.ndarray) -> np.ndarray:
    """Decode uint8 -> float32 (inverse of float_to_byte315 on its range)."""
    b8 = np.asarray(b, dtype=np.uint32)
    bits = (b8 << (24 - 3)) + np.uint32((63 - 15) << 24)
    out = bits.view(np.float32)
    return np.where(b8 == 0, np.float32(0.0), out)


def norm_table() -> np.ndarray:
    """The 256-entry decoded field-length table used by BM25.

    NORM_TABLE[i] = 1 / f^2 with f = byte315_to_float(i); entry 0 maps to
    1/NORM_TABLE[255] (reference bm25_similarity.rs:34-43).
    """
    f = byte315_to_float(np.arange(256, dtype=np.uint32))
    with np.errstate(divide="ignore"):
        table = (np.float32(1.0) / (f * f)).astype(np.float32)
    table[0] = np.float32(1.0) / table[255]
    return table
