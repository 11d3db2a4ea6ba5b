"""Block KD-tree for multi-dimensional point data.

The reference builds a recursive-median-split BKD with packed leaf blocks
(rucene src/core/util/bkd/bkd_writer.rs:313, bkd_reader.rs:68) and walks it
with a scalar intersect visitor. The batched shape here: the same
median-split leaf partition, but the QUERY is one vectorized pass over the
leaf bounding boxes ([L, D] min/max arrays) followed by a vectorized scan
of only the intersecting leaves — leaves fully inside the range contribute
all their docs without per-point tests. Sublinear for selective ranges,
never worse than one extra [L, D] compare for full scans.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BKD_LEAF = 1024  # points per leaf (reference default 1024, bkd_writer.rs)


@dataclass
class BKDTree:
    """Leaf-ordered points + per-leaf bounding boxes."""

    vals: np.ndarray  # i64[N, D] in leaf order
    docs: np.ndarray  # i32[N]
    leaf_start: np.ndarray  # i64[L+1]
    box_min: np.ndarray  # i64[L, D]
    box_max: np.ndarray  # i64[L, D]


def build_bkd(vals: np.ndarray, docs: np.ndarray, leaf_size: int = BKD_LEAF) -> BKDTree:
    """Recursive median split on the widest dimension (bkd_writer.rs
    split-dim selection), iterative via an explicit stack."""
    vals = np.asarray(vals, np.int64)
    docs = np.asarray(docs, np.int32)
    n, d = vals.shape
    order = np.arange(n)
    stack = [(0, n)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo <= leaf_size:
            continue
        sub = vals[order[lo:hi]]
        widths = sub.max(axis=0) - sub.min(axis=0)
        dim = int(np.argmax(widths))
        mid = (hi - lo) // 2
        part = np.argpartition(sub[:, dim], mid, kind="introselect")
        order[lo:hi] = order[lo:hi][part]
        stack.append((lo, lo + mid))
        stack.append((lo + mid, hi))
    return tree_from_leaf_ordered(vals[order], docs[order], leaf_size)


def _leaf_extents(n: int, leaf_size: int = BKD_LEAF) -> list[tuple[int, int]]:
    """Leaf boundaries are a pure function of n (median always splits at
    (hi-lo)//2), so a tree can be rebuilt from leaf-ordered arrays alone —
    no tree sections in the .seg container."""
    out: list[tuple[int, int]] = []
    stack = [(0, n)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo <= leaf_size:
            out.append((lo, hi))
            continue
        mid = (hi - lo) // 2
        stack.append((lo, lo + mid))
        stack.append((lo + mid, hi))
    out.sort()
    return out


def tree_from_leaf_ordered(
    vals: np.ndarray, docs: np.ndarray, leaf_size: int = BKD_LEAF
) -> BKDTree:
    """Reconstruct the BKD view over arrays already in build_bkd leaf order
    (the on-disk layout): recompute extents + boxes only."""
    vals = np.asarray(vals, np.int64)
    docs = np.asarray(docs, np.int32)
    if len(vals) == 0:
        d0 = vals.shape[1] if vals.ndim == 2 else 1
        return BKDTree(
            vals=vals.reshape(0, d0),
            docs=docs,
            leaf_start=np.zeros(1, np.int64),
            box_min=np.zeros((0, d0), np.int64),
            box_max=np.zeros((0, d0), np.int64),
        )
    extents = _leaf_extents(len(vals), leaf_size)
    ls = len(extents)
    d = vals.shape[1]
    box_min = np.empty((ls, d), np.int64)
    box_max = np.empty((ls, d), np.int64)
    for i, (lo, hi) in enumerate(extents):
        box_min[i] = vals[lo:hi].min(axis=0)
        box_max[i] = vals[lo:hi].max(axis=0)
    starts = np.asarray([e[0] for e in extents] + [len(vals)], np.int64)
    return BKDTree(vals=vals, docs=docs, leaf_start=starts, box_min=box_min, box_max=box_max)


def bkd_range_docs(tree: BKDTree, lower, upper) -> np.ndarray:
    """Docs with lower[j] <= vals[:, j] <= upper[j] for all j (None = open).
    One vectorized leaf-box pass, then a vectorized scan of the candidate
    leaves; fully-contained leaves skip per-point tests (bkd_reader.rs
    CELL_INSIDE_QUERY)."""
    d = tree.vals.shape[1]
    lo = np.asarray(
        [(-(2**62) if (lower is None or lower[j] is None) else lower[j]) for j in range(d)],
        np.int64,
    )
    hi = np.asarray(
        [((2**62) if (upper is None or upper[j] is None) else upper[j]) for j in range(d)],
        np.int64,
    )
    overlaps = ((tree.box_max >= lo) & (tree.box_min <= hi)).all(axis=1)
    inside = ((tree.box_min >= lo) & (tree.box_max <= hi)).all(axis=1)
    partial = overlaps & ~inside
    out = []
    for li in np.flatnonzero(inside):
        out.append(tree.docs[tree.leaf_start[li] : tree.leaf_start[li + 1]])
    pidx = np.flatnonzero(partial)
    if len(pidx):
        ranges = [
            np.arange(tree.leaf_start[li], tree.leaf_start[li + 1]) for li in pidx
        ]
        rows = np.concatenate(ranges)
        v = tree.vals[rows]
        m = ((v >= lo[None, :]) & (v <= hi[None, :])).all(axis=1)
        out.append(tree.docs[rows[m]])
    if not out:
        return np.zeros(0, np.int64)
    return np.unique(np.concatenate(out)).astype(np.int64)
