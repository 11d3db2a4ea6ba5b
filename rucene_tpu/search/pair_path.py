"""Host-side tables for the pair-gallop boolean executor.

The reference evaluates AND/OR of two terms with a doc-at-a-time
iterator leapfrog over skip lists (rucene
src/core/search/scorer/conjunction_scorer.rs, disjunction_scorer.rs:24,
skip_reader.rs:118). The batched TPU analog (executor.execute_flat_pair)
keeps owner lanes (AND: the smaller list; OR: both lists) and resolves
each lane's membership in the other list by binary search inside the
probe blocks that overlap its own block. This module builds, per leaf,
the owner work list + (owner item, probe block) pair list from the
host-resident block doc-range metadata — the same structure skip lists
encode — entirely with vectorized numpy.

Eligibility (pair2_eligible): rows of exactly two positive term clauses
(MUST+MUST or SHOULD+SHOULD with min_should <= 1), plain (no dismax /
const / demote), no ranges, decoded-residency devices.
"""

from __future__ import annotations

import numpy as np

from rucene_tpu.search.query import Occur
from rucene_tpu.util import next_pow2


def pair2_eligible(rq, weight_row) -> bool:
    """One row's eligibility (weights must be resolvable: positive for
    scoring slots). weight_row: f32[t_pad] for this row."""
    if (
        not rq.plain
        or rq.match_all
        or rq.ranges
        or rq.phrases
        or rq.groups
        or len(rq.clauses) != 2
    ):
        return False
    occs = [c.occur for c in rq.clauses]
    if all(o == Occur.SHOULD for o in occs):
        if rq.effective_min_should() > 1:
            return False
    elif all(o == Occur.MUST for o in occs):
        # min_should_match > 0 with zero SHOULD clauses matches nothing
        # (boolean_query.rs min_should semantics) — not modeled here
        if rq.effective_min_should() != 0:
            return False
    else:
        return False
    return bool(weight_row[0] > 0 and weight_row[1] > 0)


def build_pair_work(leaf, rqs, weight, field_id, block_start, block_count,
                    b_pad: int | None = None):
    """Owner work list + pair tables for one leaf.

    Returns (work_tuple, pair_host) where work_tuple feeds
    make_flat_batch (wi_block..wi_valid, n, wi_tslot) and pair_host is a
    dict of numpy arrays matching executor.PairBatch plus the static
    max_lanes_a / max_lanes_b."""
    b = b_pad or next_pow2(max(len(rqs), 1), 1)
    blk_first = leaf.packed.blk_first_doc
    blk_last = leaf.packed.blk_last_doc

    oi_block: list[np.ndarray] = []
    oi_row: list[np.ndarray] = []
    oi_weight: list[np.ndarray] = []
    oi_fid: list[np.ndarray] = []
    oi_mode: list[np.ndarray] = []
    oi_pw: list[np.ndarray] = []
    pr_item: list[np.ndarray] = []
    pr_pblk: list[np.ndarray] = []
    row_a = np.zeros((b, 2), np.int32)  # start, items
    row_b = np.zeros((b, 2), np.int32)
    n_items = 0

    def emit(row, s, c, w, f, mode, pw, ps, pc):
        """One extent: owner blocks [s, s+c) probing probe blocks
        [ps, ps+pc); returns item count."""
        nonlocal n_items
        blocks = np.arange(s, s + c, dtype=np.int32)
        oi_block.append(blocks)
        oi_row.append(np.full(c, row, np.int32))
        oi_weight.append(np.full(c, w, np.float32))
        oi_fid.append(np.full(c, f, np.int32))
        oi_mode.append(np.full(c, mode, np.int32))
        oi_pw.append(np.full(c, pw, np.float32))
        if pc > 0:
            pfirst = blk_first[ps : ps + pc]
            plast = blk_last[ps : ps + pc]
            lo = np.searchsorted(plast, blk_first[s : s + c], side="left")
            hi = np.searchsorted(pfirst, blk_last[s : s + c], side="right")
            cnt = np.maximum(hi - lo, 0)
            total = int(cnt.sum())
            if total:
                item_of = np.repeat(np.arange(c), cnt)
                offs = np.arange(total) - np.repeat(
                    np.concatenate([[0], np.cumsum(cnt)])[:-1], cnt
                )
                pr_item.append((n_items + item_of).astype(np.int32))
                pr_pblk.append((ps + lo[item_of] + offs).astype(np.int32))
        n_items += c
        return c

    for i, rq in enumerate(rqs):
        slots = []
        for j, c in enumerate(rq.clauses):
            slots.append(
                (
                    int(block_start[i, j]),
                    int(block_count[i, j]),
                    float(weight[i, j]),
                    int(field_id[i, j]),
                )
            )
        (s0, c0, w0, f0), (s1, c1, w1, f1) = slots
        is_and = rq.clauses[0].occur == Occur.MUST
        if is_and:
            if c0 == 0 or c1 == 0:
                continue  # a required term is absent: row matches nothing
            # owner = smaller list; probe contributes the other's score
            if c0 <= c1:
                row_a[i] = (n_items, emit(i, s0, c0, w0, f0, 3, w1, s1, c1))
            else:
                row_a[i] = (n_items, emit(i, s1, c1, w1, f1, 3, w0, s0, c0))
        else:
            if c0 > 0:
                row_a[i] = (
                    n_items,
                    emit(i, s0, c0, w0, f0, 1, w1 if c1 else 0.0, s1, c1),
                )
            if c1 > 0:
                # second extent owns docs NOT in the first list
                row_b[i] = (n_items, emit(i, s1, c1, w1, f1, 2, 0.0, s0, c0))

    w_pad = next_pow2(max(n_items, 1), 8)
    work = (
        np.zeros(w_pad, np.int32),
        np.zeros(w_pad, np.int32),
        np.zeros(w_pad, np.float32),
        np.zeros(w_pad, np.int32),
        np.zeros(w_pad, np.int32),
        np.zeros(w_pad, bool),
        n_items,
        np.zeros(w_pad, np.int32),
    )
    if n_items:
        work[0][:n_items] = np.concatenate(oi_block)
        work[1][:n_items] = np.concatenate(oi_row)
        work[2][:n_items] = np.concatenate(oi_weight)
        work[3][:n_items] = np.concatenate(oi_fid)
        work[5][:n_items] = True
    mode_arr = np.zeros(w_pad, np.int32)
    pw_arr = np.zeros(w_pad, np.float32)
    if n_items:
        mode_arr[:n_items] = np.concatenate(oi_mode)
        pw_arr[:n_items] = np.concatenate(oi_pw)
    np_pairs = int(sum(len(x) for x in pr_item))
    pp_pad = next_pow2(max(np_pairs, 1), 8)
    pr_item_arr = np.full(pp_pad, -1, np.int32)
    pr_pblk_arr = np.zeros(pp_pad, np.int32)
    if np_pairs:
        pr_item_arr[:np_pairs] = np.concatenate(pr_item)
        pr_pblk_arr[:np_pairs] = np.concatenate(pr_pblk)

    max_a = int(row_a[:, 1].max()) if b else 0
    max_b = int(row_b[:, 1].max()) if b else 0
    pair_host = dict(
        oi_mode=mode_arr,
        oi_pw=pw_arr,
        pr_item=pr_item_arr,
        pr_pblk=pr_pblk_arr,
        row_a_start=row_a[:, 0].copy(),
        row_a_items=row_a[:, 1].copy(),
        row_b_start=row_b[:, 0].copy(),
        row_b_items=row_b[:, 1].copy(),
        max_lanes_a=next_pow2(max(max_a, 1), 1) * 128,
        max_lanes_b=next_pow2(max_b, 1) * 128 if max_b else 0,
    )
    return work, pair_host
