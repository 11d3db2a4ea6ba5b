"""Flat batch-table builders: queries -> executor work lists.

Split from searcher.py (it had regrown past 2,000 lines — VERDICT r2
weak #8): everything here is segment- or batch-level table assembly with
no searcher state. make_flat_batch is the ONE device-input assembly
point every entry path routes through.

reference: the per-leaf Weight->Scorer construction these tables replace
lives in rucene src/core/search/query/term_query.rs:146 and
boolean_query.rs:196-272; conjunction pruning mirrors the skip-list
leapfrog (skip_reader.rs:118).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rucene_tpu.search.executor import FlatQueryBatch
from rucene_tpu.search.query import Occur
from rucene_tpu.util import next_pow2
from rucene_tpu.util.metrics import METRICS


class QueryPlan:
    """Per-(searcher, query) cached host work — the TPU-serving analog of
    the reference's per-reader Weight construction + query cache
    (rucene src/core/search/searcher.rs:234, query_cache.rs:229): rewrite,
    per-clause weights, per-leaf term resolution and routing flags are all
    reader-stable, so a repeated query re-pays NONE of them (profile r4a:
    ~60 ms/batch of the dispatch tax was exactly this recomputation).
    Entries pin the query object (identity-keyed caches must hold a strong
    ref so a recycled id() can never serve a stale plan)."""

    __slots__ = ("q", "rq", "clause_row", "stats_terms", "leaf_rows", "flags")

    def __init__(self, q, rq):
        self.q = q
        self.rq = rq
        self.clause_row = None  # (w[T], occ[T], nreq, msm, match_all, boost)
        self.stats_terms = None  # [(field, text)] for _gather_stats
        self.leaf_rows: dict = {}  # id(leaf) -> per-leaf resolution dict
        self.flags: dict = {}  # routing flags (pure/single/pair2/plane)


def clause_row_for(rq, sim, doc_freqs, stats, plan=None):
    """One row's segment-independent tables, cached on the plan."""
    if plan is not None and plan.clause_row is not None:
        return plan.clause_row
    slots = rq.all_slots()
    wrow = np.zeros(len(slots), np.float32)
    orow = np.zeros(len(slots), np.int32)
    for j, (occ, c) in enumerate(slots):
        orow[j] = occ
        if occ in (int(Occur.SHOULD), int(Occur.MUST)):
            wrow[j] = sim.term_weight(
                doc_freqs[(c.term.field, c.term.text)], stats[c.term.field],
                c.boost,
            )
    row = (wrow, orow, rq.n_required, rq.effective_min_should(),
           rq.match_all, rq.boost)
    if plan is not None:
        plan.clause_row = row
    return row


def build_clause_tables(rqs, sim, doc_freqs, stats, b_pad: int, t_pad: int,
                        plans=None):
    """Segment-independent per-batch tables: weights, occur kinds, boolean
    controls. Padding rows (i >= len(rqs)) match nothing. plans: aligned
    QueryPlan list — cached rows skip the per-slot weight math."""
    weight = np.zeros((b_pad, t_pad), dtype=np.float32)
    occur = np.zeros((b_pad, t_pad), dtype=np.int32)
    n_required = np.zeros(b_pad, dtype=np.int32)
    min_should = np.ones(b_pad, dtype=np.int32)
    match_all_rows = np.zeros(b_pad, dtype=bool)
    boosts = np.ones(b_pad, dtype=np.float32)
    for i, rq in enumerate(rqs):
        wrow, orow, nreq, msm, ma, bo = clause_row_for(
            rq, sim, doc_freqs, stats, plans[i] if plans else None
        )
        n_required[i] = nreq
        min_should[i] = msm
        match_all_rows[i] = ma
        boosts[i] = bo
        weight[i, : len(wrow)] = wrow
        occur[i, : len(orow)] = orow
    return weight, occur, n_required, min_should, match_all_rows, boosts


def leaf_rows_for(leaf, rq, plan=None):
    """One row's per-segment term resolution (block ranges, norms rows,
    doc freqs, plane slots), cached on the plan per leaf identity."""
    lid = id(leaf)
    if plan is not None:
        row = plan.leaf_rows.get(lid)
        if row is not None:
            return row
    slots = rq.all_slots()
    bs = np.zeros(len(slots), np.int32)
    bc = np.zeros(len(slots), np.int32)
    fid = np.zeros(len(slots), np.int32)
    df = np.zeros(len(slots), np.int32)
    pslot = np.full(len(slots), -1, np.int32)
    plane_slots = getattr(leaf, "plane_slots", None)
    plane_ok = True
    for j, (_occ, c) in enumerate(slots):
        rec = leaf.term_record(c.term.field, c.term.text)
        if rec is None:
            continue
        bs[j] = rec.block_start
        bc[j] = rec.block_count
        df[j] = rec.doc_freq
        fid[j] = leaf.packed.fields[c.term.field].field_id
        if plane_slots:
            ps = plane_slots.get(rec.block_start)
            if ps is None:
                plane_ok = False
            else:
                pslot[j] = ps
        else:
            plane_ok = False
    row = dict(bs=bs, bc=bc, fid=fid, df=df, pslot=pslot, plane_ok=plane_ok)
    if plan is not None:
        plan.leaf_rows[lid] = row
    return row


def build_leaf_tables(leaf, rqs, b_pad: int, t_pad: int, plans=None):
    """Per-segment term resolution: block ranges + norms-row ids."""
    block_start = np.zeros((b_pad, t_pad), dtype=np.int32)
    block_count = np.zeros((b_pad, t_pad), dtype=np.int32)
    field_id = np.zeros((b_pad, t_pad), dtype=np.int32)
    for i, rq in enumerate(rqs):
        row = leaf_rows_for(leaf, rq, plans[i] if plans else None)
        n = len(row["bs"])
        block_start[i, :n] = row["bs"]
        block_count[i, :n] = row["bc"]
        field_id[i, :n] = row["fid"]
    return block_start, block_count, field_id


def build_flat_work(
    block_start: np.ndarray,
    block_count: np.ndarray,
    weight: np.ndarray,
    field_id: np.ndarray,
    occur: np.ndarray,
    w_pad: int | None = None,
):
    """Flatten [B,T] slot tables into the executor's block work list:
    one entry per (query, clause, block). Fully vectorized numpy."""
    from rucene_tpu.search.executor import (
        ENC_DEMOTE,
        ENC_NOT,
        ENC_REQUIRED,
        ENC_SHOULD,
        OCC_DEMOTE,
    )

    b, t = block_start.shape
    enc_slot = (
        np.where((occur == int(Occur.MUST)) | (occur == int(Occur.FILTER)), ENC_REQUIRED, 0)
        + np.where(occur == int(Occur.SHOULD), ENC_SHOULD, 0)
        + np.where(occur == int(Occur.MUST_NOT), ENC_NOT, 0)
        + np.where(occur == OCC_DEMOTE, ENC_DEMOTE, 0)
    ).astype(np.int32)

    bs = block_start.ravel()
    bc = block_count.ravel()
    sel = bc > 0
    bs, bc = bs[sel], bc[sel]
    rows = np.repeat(np.arange(b, dtype=np.int32), t)[sel]
    wsl = weight.ravel()[sel]
    fid = field_id.ravel()[sel]
    enc = enc_slot.ravel()[sel]

    n = int(bc.sum())
    item_slot = np.repeat(np.arange(len(bc)), bc)
    start_of = np.concatenate([[0], np.cumsum(bc)])[:-1]
    within = np.arange(n) - start_of[item_slot]
    slot_flat = np.flatnonzero(sel)  # original (row*t + tslot) per slot

    # floor 1024 (pow2, multiple of the pallas G): small work lists cost
    # nothing to pad, but their length otherwise buckets by the SEGMENT'S
    # query-term content — under NRT every fresh flush segment minted new
    # W buckets whose executor compiles ran ~50 s each on the shared axon
    # service (exp/logs/bench_nrt_probe_compiles.log)
    w = next_pow2(max(n, 1), 1024) if w_pad is None else w_pad
    if n > w:
        raise ValueError(f"work list {n} exceeds pad {w}")
    wi_block = np.zeros(w, np.int32)
    wi_row = np.zeros(w, np.int32)
    wi_weight = np.zeros(w, np.float32)
    wi_fid = np.zeros(w, np.int32)
    wi_enc = np.zeros(w, np.int32)
    wi_valid = np.zeros(w, bool)
    wi_tslot = np.zeros(w, np.int32)  # clause index (for block-max bounds)
    wi_block[:n] = bs[item_slot] + within
    wi_row[:n] = rows[item_slot]
    wi_weight[:n] = wsl[item_slot]
    wi_fid[:n] = fid[item_slot]
    wi_enc[:n] = enc[item_slot]
    wi_valid[:n] = True
    wi_tslot[:n] = (slot_flat % t)[item_slot]
    return wi_block, wi_row, wi_weight, wi_fid, wi_enc, wi_valid, n, wi_tslot


def dedupe_work(wi_block, wi_valid, wi_fid):
    """Distinct-block decode tables for FlatQueryBatch: Zipf query mixes
    repeat hot terms across rows, so the same blocks appear in many work
    items — decode each once ([D] axis) and let per-item lanes gather.
    Returns (wi_ublock, wi_uvalid, wi_ufid, wi_inv) or None when the
    distinct count pads to the same size as the work list (no saving,
    and skipping keeps the single-program shape)."""
    n = int(wi_valid.sum())
    if n == 0:
        return None
    vb = wi_block[:n]
    ub, first_idx = np.unique(vb, return_index=True)
    d_pad = next_pow2(max(len(ub), 1), 8)  # floor 8: pallas G
    if d_pad >= len(wi_block):
        return None
    ublock = np.zeros(d_pad, np.int32)
    uvalid = np.zeros(d_pad, bool)
    ufid = np.zeros(d_pad, np.int32)
    ublock[: len(ub)] = ub
    uvalid[: len(ub)] = True
    ufid[: len(ub)] = wi_fid[:n][first_idx]
    inv = np.zeros(len(wi_block), np.int32)
    inv[:n] = np.searchsorted(ub, vb).astype(np.int32)
    METRICS.incr("search.decode_dedup_items", int(n - len(ub)))
    return ublock, uvalid, ufid, inv


_CVAL_CACHE: dict = {}  # (id(norm_dec), cache bytes) -> (norm_dec ref, table)


def _build_cval_table(norm_dec, blk_fid, cache_flat):
    """f32[NBr,128] BM25 denominators = cache[fid, norm_byte] per lane.
    The same per-lane small-table gather the packed path runs per
    dispatch — here it runs ONCE per (device, stats) build, so the
    decoded-mode hot path never touches it. Values are bit-identical to
    the packed path's (same table, same indices)."""
    idx = blk_fid[:, None] * 256 + norm_dec.astype(jnp.int32)
    return cache_flat[idx]


_build_cval_jit = None


def cval_table_for(dev, cache: np.ndarray):
    """Cached decoded-mode denominator table; None for packed-only views.
    Entries hold a strong ref to the keyed array so a recycled id() can
    never serve a stale table (the _view_filters uid lesson)."""
    global _build_cval_jit
    if dev is None or dev.norm_dec is None:
        return None
    key = (id(dev.norm_dec), cache.tobytes())
    ent = _CVAL_CACHE.get(key)
    if ent is not None and ent[0] is dev.norm_dec:
        return ent[1]
    if _build_cval_jit is None:
        _build_cval_jit = jax.jit(_build_cval_table)
    tbl = _build_cval_jit(
        dev.norm_dec, dev.blk_fid, jnp.asarray(cache.reshape(-1))
    )
    _CVAL_CACHE[key] = (dev.norm_dec, tbl)
    while len(_CVAL_CACHE) > 8:
        _CVAL_CACHE.pop(next(iter(_CVAL_CACHE)))
    return tbl


_CVAL_PLANE_CACHE: dict = {}  # (id(norms), cache bytes) -> (norms ref, planes)


def _build_cval_planes(norms, cache):
    """f32[F, MDp] per-doc BM25 denominators from the resident norms rows:
    cval_planes[f, d] = cache[f, norms[f, d]] — bit-identical values to the
    lane path's per-lane cache lookup (same table, same byte)."""
    return jnp.take_along_axis(cache, norms.astype(jnp.int32), axis=1)


_build_cval_planes_jit = None


def cval_plane_for(dev, cache: np.ndarray):
    """Cached dense denominator planes for the tf-plane executor; keyed by
    (norms identity, stats bytes) with a strong ref pin (recycled-id()
    safety, same as _CVAL_CACHE)."""
    global _build_cval_planes_jit
    key = (id(dev.norms), cache.tobytes())
    ent = _CVAL_PLANE_CACHE.get(key)
    if ent is not None and ent[0] is dev.norms:
        return ent[1]
    if _build_cval_planes_jit is None:
        _build_cval_planes_jit = jax.jit(_build_cval_planes)
    planes = _build_cval_planes_jit(dev.norms, jnp.asarray(cache))
    _CVAL_PLANE_CACHE[key] = (dev.norms, planes)
    while len(_CVAL_PLANE_CACHE) > 8:
        _CVAL_PLANE_CACHE.pop(next(iter(_CVAL_PLANE_CACHE)))
    return planes


def make_flat_batch(work, n_required, min_should, cache, dedupe: bool = False,
                    dev=None):
    """Device FlatQueryBatch from a host work tuple (build_flat_work /
    prune_conjunctions / _subset_work output). The ONE place executor
    inputs are assembled — every entry point (flat/single/sorted/collapse/
    synonym/probe) routes through here (VERDICT r2 weak #6: six hand-rolled
    copies made each new batch field a five-site edit). dedupe=True attaches
    distinct-block decode tables (dedupe_work). dev: the DeviceSegment the
    batch will execute against — decoded-residency views get their cval
    table attached here."""
    wi_block, wi_row, wi_weight, wi_fid, wi_enc, wi_valid = work[:6]
    if dedupe and dev is not None and dev.docs_dec is not None:
        # decode-dedup exists to skip EXPENSIVE repeated block unpacks; in
        # decoded mode a decode is one row gather, so the per-dispatch
        # host np.unique/searchsorted costs more than it saves
        dedupe = os.environ.get("RUCENE_DEDUP") == "1"
    dd = dedupe_work(wi_block, wi_valid, wi_fid) if dedupe else None
    cval_dec = cval_table_for(dev, cache)
    return jax.device_put(
        FlatQueryBatch(
            wi_block=wi_block, wi_row=wi_row, wi_weight=wi_weight,
            wi_fid=wi_fid, wi_enc=wi_enc, wi_valid=wi_valid,
            n_required=n_required, min_should=min_should, cache=cache,
            wi_ublock=None if dd is None else dd[0],
            wi_uvalid=None if dd is None else dd[1],
            wi_ufid=None if dd is None else dd[2],
            wi_inv=None if dd is None else dd[3],
            cval_dec=cval_dec,
        )
    )


def prune_conjunctions(work, n_required: np.ndarray, blk_ranges):
    """EXACT conjunction pruning: drop work items whose block doc-range
    cannot overlap some required (MUST/FILTER) clause of the same query.

    The reference leapfrogs skip lists on advance() (skip_reader.rs:118,
    conjunction_scorer.rs); the batched analog intersects block doc
    intervals on the host BEFORE any decode. Sound for every clause kind:
    a doc in a dropped block fails that required clause, so it can neither
    match nor contribute score/counts to a match — results are bit-identical.

    work: the 8-tuple from build_flat_work; blk_ranges = (blk_first_doc,
    blk_last_doc) host arrays. Returns a (possibly) smaller 8-tuple plus
    the number of dropped items."""
    wi_block, wi_row, wi_weight, wi_fid, wi_enc, wi_valid, n_items, wi_tslot = work

    if n_items == 0 or not (np.asarray(n_required) >= 1).any():
        return work, 0
    blk_first, blk_last = blk_ranges
    n = n_items
    blk = wi_block[:n]
    row = wi_row[:n]
    slot = wi_tslot[:n]
    enc = wi_enc[:n]

    starts = blk_first[blk].astype(np.int64)
    ends = blk_last[blk].astype(np.int64)

    is_req = (enc >> 16) > 0  # bits 16+ carry the required count
    keep = np.ones(n, bool)
    # wi_row ascending (build_flat_work order): row segments are contiguous
    row_starts = np.searchsorted(row, np.arange(len(n_required)), side="left")
    row_ends = np.searchsorted(row, np.arange(len(n_required)), side="right")
    for r in np.flatnonzero(np.asarray(n_required) >= 1):
        lo, hi = int(row_starts[r]), int(row_ends[r])
        if hi - lo < 1:
            continue
        slots_r = slot[lo:hi]
        req_slots = np.unique(slots_r[is_req[lo:hi]])
        if len(req_slots) < int(n_required[r]):
            # a required term is absent from this view: the row cannot match
            keep[lo:hi] = False
            continue
        if len(req_slots) == 0 or hi - lo <= 1:
            continue
        for t in req_slots:
            m = slots_r == t
            f = starts[lo:hi][m]  # ascending (runs are block/doc ordered)
            lmax = np.maximum.accumulate(ends[lo:hi][m])
            others = np.flatnonzero(~m)
            if len(others) == 0:
                continue
            # survive iff some interval of clause t overlaps [start, end]:
            # last interval with f <= end must reach back past start
            j = np.searchsorted(f, ends[lo:hi][others], side="right") - 1
            ok = (j >= 0) & (lmax[np.maximum(j, 0)] >= starts[lo:hi][others])
            keep[lo + others] &= ok
    dropped = int(n - keep.sum())
    if dropped == 0:
        return work, 0
    METRICS.incr("search.conj_pruned_blocks", dropped)
    idx = np.flatnonzero(keep)
    m = len(idx)
    w = next_pow2(max(m, 1), 8)
    out = (
        np.zeros(w, np.int32),
        np.zeros(w, np.int32),
        np.zeros(w, np.float32),
        np.zeros(w, np.int32),
        np.zeros(w, np.int32),
        np.zeros(w, bool),
    )
    out[0][:m] = wi_block[idx]
    out[1][:m] = wi_row[idx]
    out[2][:m] = wi_weight[idx]
    out[3][:m] = wi_fid[idx]
    out[4][:m] = wi_enc[idx]
    out[5][:m] = True
    tslot = np.zeros(w, np.int32)
    tslot[:m] = wi_tslot[idx]
    return out + (m, tslot), dropped


def build_combine_batch(arrays, b_pad, blk_first, blk_last, mdp, enabled):
    """Host-side CombineBatch for the hist-matmul dense combine kernel —
    built exactly when the executor's auto heuristic will take the dense
    branch and the batch fits the kernel's 32-row capacity."""
    import os

    from rucene_tpu.ops.combine_tables import (
        C_BUCKET,
        MAX_ROWS,
        build_combine_tables,
    )
    from rucene_tpu.search.executor import CombineBatch

    if os.environ.get("RUCENE_NO_COMBINE") == "1":  # A/B + debug
        return None
    if not enabled and os.environ.get("RUCENE_COMBINE_INTERPRET") != "1":
        return None
    wi_block, wi_row, wi_weight, wi_fid, wi_enc, wi_valid = arrays
    w = len(wi_block)
    if mdp % C_BUCKET or b_pad * mdp > 12 * (w * 128):
        return None  # candidate strategy will be taken
    # measured: one kernel call at [<=32 rows, >=256K docs] beats the
    # scatter 2.6x, and 8 chunked calls at [256 rows, 50K docs] LOSE to
    # it (1273 vs 1419 QPS) — per-call fixed costs dominate small tiles.
    # At >=256K docs each chunk's tile is large enough that chunking wins
    # too (the [256 rows, 1M docs] scatter alone costs ~0.9s/batch).
    if mdp < (1 << 18):
        return None
    blk_first = np.asarray(blk_first, np.int64)
    blk_last = np.asarray(blk_last, np.int64)
    out = []
    n_chunks = (b_pad + MAX_ROWS - 1) // MAX_ROWS
    for ci in range(n_chunks):
        lo, hi = ci * MAX_ROWS, (ci + 1) * MAX_ROWS
        in_chunk = (wi_row >= lo) & (wi_row < hi)
        tbl = build_combine_tables(
            wi_block, wi_row - lo, wi_enc, wi_valid & in_chunk, w,
            blk_first, blk_last, mdp,
        )
        r_pad = next_pow2(max(len(tbl.residue_items), 1), 8)
        residue = np.full(r_pad, -1, np.int32)
        residue[: len(tbl.residue_items)] = tbl.residue_items
        out.append(
            CombineBatch(
                g_bucket=tbl.g_bucket, g_first=tbl.g_first, e_item=tbl.e_item,
                e_row=tbl.e_row, e_enc=tbl.e_enc.astype(np.float32),
                residue=residue,
            )
        )
    return tuple(out)


def build_range_filter_tables(rqs, b_pad: int):
    """Dedup a batch's range/exists clauses into distinct filter keys and
    per-row slot tables (plane index / occur encoding / constant score).
    Rows without ranges carry idx == -1 (inert)."""
    from rucene_tpu.search.executor import ENC_NOT, ENC_REQUIRED, ENC_SHOULD

    keys: list = []  # representative RangeClause per distinct filter
    key_pos: dict[tuple, int] = {}
    for rq in rqs:
        for r in rq.ranges:
            if r.cache_key not in key_pos:
                key_pos[r.cache_key] = len(keys)
                keys.append(r)
    r_slots = next_pow2(max((len(rq.ranges) for rq in rqs), default=1), 1)
    idx = np.full((b_pad, r_slots), -1, np.int32)
    enc = np.zeros((b_pad, r_slots), np.int32)
    boost = np.zeros((b_pad, r_slots), np.float32)
    for i, rq in enumerate(rqs):
        for j, r in enumerate(rq.ranges):
            idx[i, j] = key_pos[r.cache_key]
            if r.occur in (Occur.MUST, Occur.FILTER):
                enc[i, j] = ENC_REQUIRED
            elif r.occur == Occur.SHOULD:
                enc[i, j] = ENC_SHOULD
            else:
                enc[i, j] = ENC_NOT
            if r.occur in (Occur.MUST, Occur.SHOULD):
                boost[i, j] = np.float32(r.boost)  # constant-score
    return keys, idx, enc, boost


def build_leaf_cache(leaf, sim, stats, n_fields: int | None = None) -> np.ndarray:
    """Per-segment [F,256] norm-byte -> BM25 denominator cache."""
    packed = leaf.packed
    if n_fields is None:
        n_fields = max(leaf.device.num_norm_fields, 1)
    cache = np.zeros((n_fields, 256), dtype=np.float32)
    for name, pf in packed.fields.items():
        has_norms = name in packed.norms
        cache[pf.field_id] = sim.cache_row(stats.get(name) if has_norms else None)
    return cache


