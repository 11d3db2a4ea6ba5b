"""Utility layer (reference: rucene src/core/util/)."""

from rucene_tpu.util.small_float import byte315_to_float, float_to_byte315, norm_table


def next_pow2(n: int, floor: int = 1) -> int:
    """Smallest power of two >= max(n, floor); shape-bucketing helper to keep
    the number of distinct jit specializations bounded."""
    v = max(int(n), floor)
    return 1 << (v - 1).bit_length()


def round_up(n: int, m: int) -> int:
    return ((int(n) + m - 1) // m) * m


__all__ = [
    "byte315_to_float",
    "float_to_byte315",
    "next_pow2",
    "norm_table",
    "round_up",
]
