"""Host-side entry tables for the hist-matmul combine kernel.

The combine kernel (ops/pallas_combine.py) replaces the XLA scatter-add of
decoded posting lanes into dense [B, max_doc] accumulators — the dominant
device cost of the dense executor branch at large corpora (~17-27ns per
lane, serialization-bound). It accumulates per-BUCKET tiles on the MXU
instead: lanes land in their doc bucket's [C, cols] tile via a one-hot
matmul (the histogram-by-matmul trick), which is bandwidth/MXU-bound.

This module assigns work items (query, clause, 128-doc block) to the doc
buckets they overlap, using only host-resident block metadata
(blk_first_doc / blk_last_doc — the conjunction-pruning tables). An item
spanning several buckets is replayed once per overlapped bucket with
in-kernel masking; items spanning more than SPARSE_SPAN buckets (rare
terms) go to a scatter residue instead, so duplication stays bounded.

Entries are ordered by bucket and padded so each kernel grid step handles
G entries of ONE bucket; every bucket gets at least one (possibly dummy)
entry so the output block is always initialized.
"""

from __future__ import annotations

import numpy as np

from rucene_tpu.util import next_pow2

C_BUCKET = 1024  # docs per bucket (output tile height)
G_ENTRIES = 8  # entries per kernel grid step
SPARSE_SPAN = 16  # items overlapping more buckets go to the scatter residue
MAX_ROWS = 32  # kernel column layout: 4 groups (hi/mid/lo/enc) x 32 rows


class CombineTables:
    __slots__ = (
        "e_item", "e_row", "e_enc", "g_bucket", "g_first", "n_steps",
        "residue_items", "n_buckets",
    )

    def __init__(self, e_item, e_row, e_enc, g_bucket, g_first, n_steps,
                 residue_items, n_buckets):
        self.e_item = e_item  # i32[T*G] work-item index (-1 = inert)
        self.e_row = e_row  # i32[T*G] query row of the entry
        self.e_enc = e_enc  # i32[T*G] clause-count encoding
        self.g_bucket = g_bucket  # i32[T] bucket id per grid step
        self.g_first = g_first  # i32[T] 1 on a bucket's first step
        self.n_steps = n_steps  # T
        self.residue_items = residue_items  # i32[R] items for scatter path
        self.n_buckets = n_buckets


def build_combine_tables(
    wi_block: np.ndarray,  # i32[W] block ids (host copy)
    wi_row: np.ndarray,  # i32[W]
    wi_enc: np.ndarray,  # i32[W]
    wi_valid: np.ndarray,  # bool[W]
    n_items: int,
    blk_first: np.ndarray,  # i64[NB] per-block first doc
    blk_last: np.ndarray,  # i64[NB] per-block last doc
    max_doc_padded: int,
    c_bucket: int = C_BUCKET,
    g_entries: int = G_ENTRIES,
) -> CombineTables:
    n_buckets = (max_doc_padded + c_bucket - 1) // c_bucket
    valid = np.asarray(wi_valid[:n_items], bool)
    blk = np.asarray(wi_block[:n_items])
    if len(blk_first) == 0 or not valid.any():
        # no decodable blocks (e.g. points-only segment): dummy entries only
        first = np.zeros(n_items, np.int64)
        last = np.zeros(n_items, np.int64)
        valid = np.zeros(n_items, bool)
    else:
        first = blk_first[np.clip(blk, 0, len(blk_first) - 1)] // c_bucket
        last = np.maximum(
            blk_last[np.clip(blk, 0, len(blk_last) - 1)] // c_bucket, first
        )
    span = np.where(valid, last - first + 1, 0)

    dense_sel = np.flatnonzero(valid & (span <= SPARSE_SPAN))
    residue = np.flatnonzero(valid & (span > SPARSE_SPAN)).astype(np.int32)

    # one entry per (item, overlapped bucket)
    spans = span[dense_sel].astype(np.int64)
    item_rep = np.repeat(dense_sel, spans)
    off_in_item = np.arange(len(item_rep)) - np.repeat(
        np.concatenate([[0], np.cumsum(spans)])[:-1], spans
    )
    e_bucket = (first[dense_sel].repeat(spans) + off_in_item).astype(np.int64)

    # add one dummy entry per bucket so every output tile is initialized
    all_buckets = np.arange(n_buckets, dtype=np.int64)
    e_bucket = np.concatenate([e_bucket, all_buckets])
    item_all = np.concatenate([item_rep, np.full(n_buckets, -1, np.int64)])

    order = np.argsort(e_bucket, kind="stable")
    e_bucket = e_bucket[order]
    item_all = item_all[order]

    # group by bucket into steps of g_entries (pad each bucket's tail)
    counts = np.bincount(e_bucket, minlength=n_buckets)
    steps_per_bucket = (counts + g_entries - 1) // g_entries  # >= 1
    n_steps = int(steps_per_bucket.sum())
    t_slots = n_steps * g_entries

    e_item = np.full(t_slots, -1, np.int64)
    # destination slot of each entry: bucket's step base * G + index within
    step_base = np.concatenate([[0], np.cumsum(steps_per_bucket)])[:-1]
    entry_base = np.concatenate([[0], np.cumsum(counts)])[:-1]
    within = np.arange(len(e_bucket)) - entry_base[e_bucket]
    dest = step_base[e_bucket] * g_entries + within
    e_item[dest] = item_all

    g_bucket = np.repeat(np.arange(n_buckets, dtype=np.int64), steps_per_bucket)
    g_first = np.zeros(n_steps, np.int32)
    g_first[step_base] = 1

    # pad the step count to a power of two (stable jit shapes): padding
    # steps revisit the FINAL bucket with inert entries, so its tile just
    # stays resident a little longer before the last flush
    t_pad = next_pow2(max(n_steps, 1), 1)
    if t_pad > n_steps:
        extra = t_pad - n_steps
        g_bucket = np.concatenate(
            [g_bucket, np.full(extra, n_buckets - 1, np.int64)]
        )
        g_first = np.concatenate([g_first, np.zeros(extra, np.int32)])
        e_item = np.concatenate(
            [e_item, np.full(extra * g_entries, -1, np.int64)]
        )
        n_steps = t_pad

    safe = np.maximum(e_item, 0)
    e_row = np.where(e_item >= 0, wi_row[:n_items][safe], 0).astype(np.int32)
    e_enc = np.where(e_item >= 0, wi_enc[:n_items][safe], 0).astype(np.int32)

    return CombineTables(
        e_item=e_item.astype(np.int32),
        e_row=e_row,
        e_enc=e_enc,
        g_bucket=g_bucket.astype(np.int32),
        g_first=g_first,
        n_steps=n_steps,
        residue_items=residue,
        n_buckets=n_buckets,
    )
