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


def plane_row_chunk(b_pad: int, mdp: int) -> int:
    """Rows per execute_planes dispatch: bound the [B, md] f32 score
    accumulator to ~1 GB (8.8M-doc segments would otherwise materialize
    9 GB at B=256). Power of two so chunks tile b_pad evenly."""
    import os

    budget = int(os.environ.get("RUCENE_PLANE_ROWS_MB", 1024)) << 20
    rows = max(budget // (4 * max(mdp, 1)), 8)
    return min(b_pad, 1 << (int(rows).bit_length() - 1))  # floor pow2
