"""Host-side routing/tables for the dense tf-plane executor
(executor.execute_planes).

The reference serves high-df boolean clauses through the same skip-list
leapfrog as everything else (rucene src/core/search/scorer/
conjunction_scorer.rs, disjunction_scorer.rs:24); on TPU, once a clause's
df passes ~md/512 its postings are effectively a dense column, so the
fastest evaluation is to keep a resident u8 tf plane per hot term
(codec/device.add_tf_planes) and stream [B, md] fused elementwise math —
no probe compares, no scatter, and near-zero per-batch host table work
(two dict lookups per clause instead of per-block work lists).

Eligibility is exact-semantics-preserving: plain boolean rows (any mix of
SHOULD / MUST / FILTER / MUST_NOT term clauses, honoring
min_should_match) whose every term PRESENT in a segment has a plane
there. A term absent from a segment rides as an inert slot (-1), which
matches the lane executor's behavior (required-absent => row matches
nothing in that segment).
"""

from __future__ import annotations

import numpy as np

from rucene_tpu.search.query import Occur

PLANE_T_CAP = 8  # max clauses per row (ENC_NOT nibble caps MUST_NOT at 15)


def plane_structural(rq) -> bool:
    """Row-shape eligibility (segment-independent)."""
    return (
        rq.plain
        and not rq.match_all
        and not rq.ranges
        and not rq.phrases
        and not rq.groups
        and 1 <= len(rq.clauses) <= PLANE_T_CAP
    )


def plane_eligible_rows(rqs, leaves) -> list[bool]:
    """Per-row eligibility across ALL leaves: structural shape + every
    term that exists in a leaf has a plane slot there. Requires every
    leaf to carry planes (mixed-residency readers fall back wholesale —
    rows must take one class on every leaf)."""
    for lf in leaves:
        if (
            getattr(lf, "plane_slots", None) is None
            or lf.device.tf_planes is None
            or not lf.plane_slots
        ):
            return [False] * len(rqs)
    flags = []
    for rq in rqs:
        ok = plane_structural(rq)
        if ok:
            for lf in leaves:
                for c in rq.clauses:
                    rec = lf.term_record(c.term.field, c.term.text)
                    if rec is not None and rec.block_start not in lf.plane_slots:
                        ok = False
                        break
                if not ok:
                    break
        flags.append(ok)
    return flags


def build_plane_batch(leaf, rqs, b_pad: int, t_pad: int):
    """(slot i32[b_pad,t_pad], kindenc i32[b_pad,t_pad], same_fid,
    active_slots) for one leaf. same_fid: the shared norms row when every
    present clause in the batch targets one field, else -1 (STATIC jit
    arg selecting the broadcast-cval program)."""
    from rucene_tpu.search.executor import ENC_NOT, ENC_REQUIRED, ENC_SHOULD

    slot = np.full((b_pad, t_pad), -1, np.int32)
    kind = np.zeros((b_pad, t_pad), np.int32)
    fids: set[int] = set()
    active = 0
    for i, rq in enumerate(rqs):
        for j, c in enumerate(rq.clauses):
            rec = leaf.term_record(c.term.field, c.term.text)
            if rec is None:
                continue
            slot[i, j] = leaf.plane_slots[rec.block_start]
            if c.occur in (Occur.MUST, Occur.FILTER):
                kind[i, j] = ENC_REQUIRED
            elif c.occur == Occur.SHOULD:
                kind[i, j] = ENC_SHOULD
            else:
                kind[i, j] = ENC_NOT
            fids.add(leaf.packed.fields[c.term.field].field_id)
            active += 1
    same_fid = fids.pop() if len(fids) == 1 else -1
    return slot, kind, same_fid, active


def plane_row_chunk(b_pad: int, mdp: int) -> int:
    """Rows per execute_planes dispatch: bound the [B, md] f32 score
    accumulator to ~1 GB (8.8M-doc segments would otherwise materialize
    9 GB at B=256). Power of two so chunks tile b_pad evenly."""
    import os

    budget = int(os.environ.get("RUCENE_PLANE_ROWS_MB", 1024)) << 20
    rows = max(budget // (4 * max(mdp, 1)), 8)
    return min(b_pad, 1 << (int(rows).bit_length() - 1))  # floor pow2
