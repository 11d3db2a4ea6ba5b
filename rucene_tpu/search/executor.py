"""The batched boolean/BM25 query engine — one jitted program per
(work-list-size, B, k, segment-bucket) shape.

Where the reference walks one scorer tree per query with skip-list leapfrog
(rucene src/core/search/scorer/conjunction_scorer.rs, bulk_scorer.rs:89-154),
this engine executes a BATCH of queries against a segment in one device
program built around a FLAT WORK LIST: one work item per (query, clause,
128-doc block). No per-term padding — a batch mixing rare and common terms
costs the sum of their real block counts, not batch * max:

  1. gather + bit-unpack each work item's block (ops.decode), prefix-summing
     deltas to absolute doc ids;
  2. score every posting lane with BM25 (norm byte -> cache lookup, exact
     reference float semantics, bm25_similarity.rs:185-215); non-scoring
     clauses (FILTER/MUST_NOT) carry weight 0;
  3. scatter-add scores and clause-match counts into dense per-query
     accumulators over the doc space (score-at-a-time evaluation);
  4. apply boolean semantics (MUST/FILTER counts, min_should_match,
     MUST_NOT, live docs) as a mask;
  5. exact tie-broken vectorized top-k (ops.topk).

Float note: scatter-add applies same-doc contributions in an
XLA-deterministic but clause-order-UNSPECIFIED order, so boolean sums can
differ from a sequential evaluation by a few ULPs — the reference has the
same property (DisjunctionSumScorer sums in heap order, not clause order,
disjunction_scorer.rs:24).

Clause kinds follow BooleanQuery (reference boolean_query.rs:29):
SHOULD=0 MUST=1 FILTER=2 MUST_NOT=3.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rucene_tpu.codec.device import DeviceSegment
from rucene_tpu.ops.decode import (
    decode_doc_blocks,
    decode_freq_blocks,
    decode_norm_blocks,
)
from rucene_tpu.ops.topk import topk_score_doc

OCC_SHOULD = 0
OCC_MUST = 1
OCC_FILTER = 2
OCC_MUST_NOT = 3
OCC_DEMOTE = 4  # BoostingQuery negative member: weightless presence bit

# clause-count encodings packed into one int32 accumulator:
# bits 16+: required (MUST|FILTER) matches, bits 8-15: SHOULD matches,
# bits 4-7: demote (BoostingQuery negative) matches, bits 0-3: MUST_NOT
# matches (so MUST_NOT and demote groups each cap at 15 members)
ENC_REQUIRED = 1 << 16
ENC_SHOULD = 1 << 8
ENC_DEMOTE = 1 << 4
ENC_NOT = 1


class FlatQueryBatch(NamedTuple):
    """Device form of a query batch as a flat block work list.

    Work arrays have one entry per (query, clause, block); padding items
    carry enc == 0 and weight == 0 and point at block 0 with row B (an
    out-of-range accumulator row that scatter-drop discards is NOT used —
    padding rows point at row 0 with zero contribution instead).
    """

    wi_block: jax.Array  # i32[W] global block id in the segment
    wi_row: jax.Array  # i32[W] query row
    wi_weight: jax.Array  # f32[W] boost * idf * (k1+1); 0 for non-scoring
    wi_fid: jax.Array  # i32[W] norms/cache row
    wi_enc: jax.Array  # i32[W] clause-count encoding (0 for padding)
    wi_valid: jax.Array  # bool[W]
    n_required: jax.Array  # i32[B]
    min_should: jax.Array  # i32[B]
    cache: jax.Array  # f32[F,256]
    # optional decode-dedup tables (searcher.dedupe_work): repeated hot
    # terms across query rows reference the SAME blocks, so decode runs
    # once per DISTINCT block [D] and per-item lanes are row gathers.
    # None -> decode directly on wi_block (sharded / low-duplication lists).
    wi_ublock: jax.Array | None = None  # i32[D] distinct block ids (padded)
    wi_uvalid: jax.Array | None = None  # bool[D]
    wi_ufid: jax.Array | None = None  # i32[D] cache row per distinct block
    wi_inv: jax.Array | None = None  # i32[W] item -> distinct-block index
    # decoded-residency mode: f32[NBr,128] BM25 denominators per lane,
    # prebuilt once per (device, stats) — the per-lane cache gather this
    # replaces serializes on TPU (searcher.cval_table_for)
    cval_dec: jax.Array | None = None


class CombineBatch(NamedTuple):
    """Host-built entry tables for the hist-matmul combine kernel
    (ops/pallas_combine.py): the dense branch's scatter-add replacement.
    Built by ops/combine_tables.build_combine_tables from block doc-range
    metadata; residue holds sparse work items that stay on the scatter
    path (pad -1)."""

    g_bucket: jax.Array  # i32[T] bucket per grid step (sorted)
    g_first: jax.Array  # i32[T] 1 on a bucket's first step
    e_item: jax.Array  # i32[T*G] work-item index per entry (-1 inert)
    e_row: jax.Array  # i32[T*G]
    e_enc: jax.Array  # f32[T*G]
    residue: jax.Array  # i32[Rp] sparse items for the scatter path


class RowExtras(NamedTuple):
    """Per-row score-combine overrides for the flat executor (VERDICT r2
    item 4 — DisMax/ConstantScore/Boosting previously served from host
    numpy). Rows without the feature carry inert sentinels.

    Transforms apply to the accumulated (row, doc) score in order:
    1. dismax (disjunction_max_query.rs:43): score = max(member scores)
       + tie * (sum - max), computed as (1-tie)*max + tie*sum;
    2. demote (boosting_query.rs:29): score *= factor where any demote
       member matched (ENC_DEMOTE bits);
    3. const (ConstantScoreQuery): score = const wherever matched.
    """

    dm_tie: jax.Array  # f32[B] tie breaker; < 0 = not a dismax row
    const_on: jax.Array  # bool[B]
    const_val: jax.Array  # f32[B]
    demote: jax.Array  # f32[B] multiply factor (1.0 = inert)


class FilterPlanes(NamedTuple):
    """Constant-score doc-set clauses (point ranges / exists) as dense
    per-doc bool planes, the device form of the reference's cached filter
    DocIdSets (query_cache.rs:229) and PointRangeQuery's constant-score
    weight (point_range_query.rs:366).

    A plane is one [mdp] bool column per DISTINCT filter in the batch
    (deduped + device-cached across batches by the searcher); each query
    row references up to R of them by index with its own occur encoding
    and constant score. idx == -1 marks an inert slot.
    """

    planes: jax.Array  # bool[P, mdp]
    idx: jax.Array  # i32[B, R] plane index per row slot; -1 = inert
    enc: jax.Array  # i32[B, R] clause-count encoding (ENC_* units)
    boost: jax.Array  # f32[B, R] constant score (0 for FILTER/MUST_NOT)


def _apply_planes_dense(acc_score, acc_counts, filters: FilterPlanes):
    """Fold filter planes into dense [B, md] accumulators: each referenced
    plane contributes its occur counts and constant score wherever set —
    identical semantics to host_engine's range fold (constant-score +
    req/should/not counts)."""
    r_slots = filters.idx.shape[1]
    p = filters.planes.shape[0]
    for r in range(r_slots):  # R is tiny and static: unrolled
        pidx = filters.idx[:, r]  # i32[B]
        pl = filters.planes[jnp.clip(pidx, 0, p - 1)]  # bool[B, md]
        on = pl & (pidx >= 0)[:, None]
        acc_score = acc_score + jnp.where(on, filters.boost[:, r][:, None], 0.0)
        acc_counts = acc_counts + jnp.where(on, filters.enc[:, r][:, None], 0)
    return acc_score, acc_counts


def _apply_planes_lanes(sum_sc, sum_enc, o_row, safe_docs, b, filters: FilterPlanes):
    """Fold filter planes into candidate-lane group totals (one gather per
    slot). Caller guarantees candidate completeness: every possible match
    carries at least one decoded lane (i.e. some MUST term clause exists),
    so no match can consist of filter-plane membership alone."""
    r_slots = filters.idx.shape[1]
    p = filters.planes.shape[0]
    row_safe = jnp.clip(o_row, 0, b - 1)
    for r in range(r_slots):
        pidx = filters.idx[row_safe, r]  # i32[L]
        on = (pidx >= 0) & filters.planes[jnp.clip(pidx, 0, p - 1), safe_docs]
        sum_sc = sum_sc + jnp.where(on, filters.boost[row_safe, r], 0.0)
        sum_enc = sum_enc + jnp.where(on, filters.enc[row_safe, r], 0)
    return sum_sc, sum_enc


def decode_score_lanes(
    dev: DeviceSegment, q: FlatQueryBatch, use_pallas: bool = False,
    has_ef: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Shared prologue: gather + unpack each work item's block and score
    every posting lane with BM25. has_ef (STATIC) marks work lists that
    touch Elias-Fano-encoded blocks — both the XLA path and the Mosaic
    kernel specialize on it (batched EF select vs FOR-only program).
    Returns (target i32[W,128] — doc id or md+1 for invalid lanes,
    rows i32[W,1], sc f32[W,128], valid bool[W,128], freqs i32[W,128])."""
    md = dev.max_doc_padded
    cache_flat = q.cache.reshape(-1)

    # decode-dedup: run the (expensive) block decode once per DISTINCT
    # block, then expand to per-item lanes with row gathers — repeated hot
    # terms across a batch's rows otherwise decode the same blocks 3-8x
    # (Zipf query mixes). Scores stay bit-identical: tf/cval are gathered
    # per item and the BM25 expression below is unchanged.
    dedup = q.wi_ublock is not None
    blk = q.wi_ublock if dedup else q.wi_block
    bvalid = q.wi_uvalid if dedup else q.wi_valid
    bfid = q.wi_ufid if dedup else q.wi_fid
    off = dev.blk_off[blk]
    dbits = dev.blk_doc_bits[blk]
    fbits = dev.blk_freq_bits[blk]
    base = dev.blk_base[blk]
    cnt = jnp.where(bvalid, dev.blk_count[blk], 0)

    if dev.docs_dec is not None:
        # decoded residency: the hot path is three [*,128] ROW gathers from
        # the resident planes — no unpack at all, and no EF shape split
        # (posting_reader.rs re-decodes per advance; HBM makes that moot)
        from rucene_tpu.ops.decode import INVALID_DOC

        nbr = dev.docs_dec.shape[0]
        sb = jnp.clip(blk, 0, nbr - 1)
        valid = jnp.arange(128, dtype=jnp.int32)[None, :] < cnt[:, None]
        docs = jnp.where(valid, dev.docs_dec[sb], INVALID_DOC)
        freqs = jnp.where(valid, dev.freqs_dec[sb].astype(jnp.int32), 0)
        if q.cval_dec is not None:
            cval = q.cval_dec[sb]
        else:
            nb_byte = dev.norm_dec[sb].astype(jnp.int32)
            cval = cache_flat[bfid[:, None] * 256 + nb_byte]
    elif use_pallas:
        from rucene_tpu.ops.decode import INVALID_DOC
        from rucene_tpu.ops.pallas_decode import decode_score_work_items_pallas

        data2d = jax.lax.bitcast_convert_type(dev.data, jnp.int32).reshape(-1, 128)
        # the BM25 denominator is selected IN-KERNEL from the [F,256]
        # cache (one-hot VPU select, bit-exact) — an XLA per-lane gather
        # over millions of lanes serializes (~300 ms/batch at 1M docs)
        raw_docs, raw_freqs, cval = decode_score_work_items_pallas(
            data2d, off, dbits, fbits, base, bfid, q.cache, has_ef=has_ef,
        )
        valid = jnp.arange(128, dtype=jnp.int32)[None, :] < cnt[:, None]
        docs = jnp.where(valid, raw_docs, INVALID_DOC)
        freqs = jnp.where(valid, raw_freqs, 0)
    else:
        docs, valid = decode_doc_blocks(
            dev.data, off, dbits, base, cnt, has_ef=has_ef
        )  # [D|W,128]
        freqs = decode_freq_blocks(dev.data, off, dbits, fbits, valid)
        norm_byte = decode_norm_blocks(dev.data, off, dbits, fbits, valid)
        # the norm byte rides inline in the block (postings.py pack
        # layout), so scoring reads the tiny [F,256] cache instead of
        # gathering a [F, max_doc] norms plane
        cval = cache_flat[bfid[:, None] * 256 + norm_byte]

    if dedup:
        inv = q.wi_inv
        docs = docs[inv]
        freqs = freqs[inv]
        cval = cval[inv]
        valid = valid[inv] & q.wi_valid[:, None]
        freqs = jnp.where(valid, freqs, 0)

    tf = freqs.astype(jnp.float32)
    sc = q.wi_weight[:, None] * tf / (tf + cval)
    sc = jnp.where(valid, sc, 0.0)

    target = jnp.where(valid, docs, md + 1)  # out of range -> dropped
    rows = q.wi_row[:, None].astype(jnp.int32)
    return target, rows, sc, valid, freqs


def _combine_dense(dev, q, target, sc, valid, b, md, combine, interpret,
                   need_counts=True):
    """Dense accumulators via the hist-matmul kernel + sparse residue
    scatter. `combine` is a tuple of per-32-row-chunk CombineBatches
    (entry rows are chunk-local). Returns (acc_score f32[b, md],
    acc_counts i32[b, md])."""
    from rucene_tpu.ops.combine_tables import C_BUCKET, MAX_ROWS
    from rucene_tpu.ops.pallas_combine import combine_lanes_pallas

    w = target.shape[0]
    score_parts = []
    count_parts = []
    for ci, cb in enumerate(combine):
        safe_e = jnp.clip(cb.e_item, 0, w - 1)
        live_e = cb.e_item >= 0
        docs_e = jnp.where(live_e[:, None], target[safe_e], md + 1)
        sc_e = jnp.where(live_e[:, None], sc[safe_e], 0.0)
        acc32, cnt32 = combine_lanes_pallas(
            cb.g_bucket, cb.g_first, docs_e, sc_e, cb.e_row, cb.e_enc,
            n_buckets=md // C_BUCKET, interpret=interpret,
        )
        rows_here = min(MAX_ROWS, b - ci * MAX_ROWS)
        score_parts.append(acc32[:rows_here])
        count_parts.append(cnt32[:rows_here])
    acc_score = (
        score_parts[0] if len(score_parts) == 1
        else jnp.concatenate(score_parts, axis=0)
    )
    acc_counts = (
        count_parts[0] if len(count_parts) == 1
        else jnp.concatenate(count_parts, axis=0)
    ).astype(jnp.int32)
    # sparse residue items (global rows): plain scatter of their lanes
    residue = combine[0].residue
    if len(combine) > 1:
        residue = jnp.concatenate([cb.residue for cb in combine])
    rsafe = jnp.clip(residue, 0, w - 1)
    rlive = (residue >= 0)[:, None]
    rtarget = jnp.where(rlive, target[rsafe], md + 1)
    rsc = jnp.where(rlive, sc[rsafe], 0.0)
    rrows = q.wi_row[rsafe][:, None].astype(jnp.int32)
    acc_score = acc_score.at[rrows, rtarget].add(rsc, mode="drop")
    if need_counts:
        # counts need the real per-lane valid mask (scores ride sc==0)
        rvalid = jnp.where(rlive, valid[rsafe], False)
        renc = jnp.where(rvalid, q.wi_enc[rsafe][:, None], 0)
        acc_counts = acc_counts.at[rrows, rtarget].add(renc, mode="drop")
    return acc_score, acc_counts


def execute_flat_impl(
    dev: DeviceSegment,
    q: FlatQueryBatch,
    k: int,
    use_pallas: bool = False,
    pure_disjunction: bool = False,
    strategy: str = "auto",
    has_ef: bool = False,
    filters: FilterPlanes | None = None,
    combine: CombineBatch | None = None,
    combine_interpret: bool = False,
    extras: RowExtras | None = None,
    with_dismax: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Un-jitted executor body (also called inside shard_map by
    parallel.sharded). Returns (scores f32[B,k], docs i32[B,k],
    total_hits i32[B]). use_pallas selects the fused Mosaic decode kernel
    (TPU only). pure_disjunction (STATIC, caller-guaranteed: every row is
    all-SHOULD with positive weights, min_should <= 1, no MUST_NOT) skips
    the clause-count accumulator entirely — a BM25 hit always scores > 0,
    so match == (score > 0); saves one of the two scatter passes (~40 ms
    at the 256q x 50K shape). strategy overrides the dense/candidate
    shape heuristic ("auto" | "dense" | "candidate")."""
    b = q.n_required.shape[0]
    md = dev.max_doc_padded
    target, rows, sc, valid, _ = decode_score_lanes(dev, q, use_pallas, has_ef)

    # --- match + top-k: shape-adaptive strategy ---
    # Dense: scatter-add into [B, md] accumulators and run vectorized top-k
    # (3 passes over B*md) — wins for small corpora / big work lists.
    # Candidate: no dense arrays at all — sort the touched lanes by
    # (row, doc), combine same-doc contributions with a segmented scan, then
    # order by (row, score desc, doc). Memory and time are independent of
    # max_doc, which is what makes many-million-doc corpora viable. Both
    # sizes are static at trace time.
    l_lanes = target.size
    if strategy == "dense" or (strategy == "auto" and b * md <= 12 * l_lanes):
        if combine is not None and pure_disjunction:
            acc_score, _ = _combine_dense(
                dev, q, target, sc, valid, b, md, combine, combine_interpret,
                need_counts=False,
            )
            match = (acc_score > 0.0) & dev.live[None, :]
        elif pure_disjunction:
            acc_score = jnp.zeros((b, md), jnp.float32).at[rows, target].add(sc, mode="drop")
            match = (acc_score > 0.0) & dev.live[None, :]
        else:
            if combine is not None:
                acc_score, acc_counts = _combine_dense(
                    dev, q, target, sc, valid, b, md, combine,
                    combine_interpret,
                )
            else:
                acc_score = jnp.zeros((b, md), jnp.float32).at[rows, target].add(sc, mode="drop")
                inc = jnp.where(valid, q.wi_enc[:, None], 0)
                acc_counts = jnp.zeros((b, md), jnp.int32).at[rows, target].add(inc, mode="drop")
            if filters is not None:
                acc_score, acc_counts = _apply_planes_dense(
                    acc_score, acc_counts, filters
                )
            if extras is not None:
                if with_dismax:
                    acc_max = jnp.zeros((b, md), jnp.float32).at[
                        rows, target
                    ].max(sc, mode="drop")
                    tie = extras.dm_tie[:, None]
                    acc_score = jnp.where(
                        tie >= 0.0,
                        (1.0 - tie) * acc_max + tie * acc_score,
                        acc_score,
                    )
                demote_hit = ((acc_counts >> 4) & 0xF) > 0
                acc_score = jnp.where(
                    demote_hit, acc_score * extras.demote[:, None], acc_score
                )
                acc_score = jnp.where(
                    extras.const_on[:, None], extras.const_val[:, None], acc_score
                )
            req_count = acc_counts >> 16
            should_count = (acc_counts >> 8) & 0xFF
            has_not = (acc_counts & 0xF) > 0
            match = (
                (req_count == q.n_required[:, None])
                & (should_count >= q.min_should[:, None])
                & jnp.logical_not(has_not)
                & dev.live[None, :]
            )
        scores = jnp.where(match, acc_score, -jnp.inf)
        top_scores, top_docs = topk_score_doc(scores, k)
        total_hits = jnp.sum(match, axis=1).astype(jnp.int32)
        return top_scores, top_docs, total_hits

    cdocs = target.reshape(-1)  # [L], md+1 for padding lanes
    crows = jnp.broadcast_to(rows, target.shape).reshape(-1)
    lane_sc = sc.reshape(-1)
    lane_enc = jnp.where(valid, q.wi_enc[:, None], 0).reshape(-1)
    in_range = cdocs < md

    # sort lanes by (row, doc) so each doc's contributions are contiguous.
    # When (b+1)*(md+1) fits in int32, (row, doc) packs into ONE sort key
    # (fewer compares + one fewer carried array); padding lanes get the
    # maximal key either way.
    g_row = jnp.where(in_range, crows, jnp.int32(b))
    g_doc = jnp.where(in_range, cdocs, jnp.int32(2**31 - 1))
    if (b + 1) * (md + 1) < 2**31:
        stride = md + 1
        g_key = jnp.where(
            in_range, crows * stride + cdocs, jnp.int32(2**31 - 1)
        )
        o_key, o_sc, o_enc = jax.lax.sort(
            (g_key, lane_sc, lane_enc), num_keys=1, dimension=-1
        )
        pad = o_key == jnp.int32(2**31 - 1)
        o_row = jnp.where(pad, jnp.int32(b), o_key // stride)
        o_doc = jnp.where(pad, jnp.int32(2**31 - 1), o_key % stride)
    else:
        o_row, o_doc, o_sc, o_enc = jax.lax.sort(
            (g_row, g_doc, lane_sc, lane_enc), num_keys=2, dimension=-1
        )
    p_row = jnp.concatenate([jnp.full((1,), -1, jnp.int32), o_row[:-1]])
    p_doc = jnp.concatenate([jnp.full((1,), -1, jnp.int32), o_doc[:-1]])
    seg_start = (o_row != p_row) | (o_doc != p_doc)

    # segmented inclusive scan: per-(row,doc) running sums. Tree association
    # keeps integer counts exact; f32 sums land within the usual reorder
    # tolerance (the dense scatter's combine order is unspecified too).
    # group totals live on each group's LAST lane
    n_row = jnp.concatenate([o_row[1:], jnp.full((1,), -2, jnp.int32)])
    n_doc = jnp.concatenate([o_doc[1:], jnp.full((1,), -2, jnp.int32)])
    seg_end = (o_row != n_row) | (o_doc != n_doc)
    safe_docs = jnp.clip(o_doc, 0, md - 1)

    if pure_disjunction:
        def comb2(a, x):
            av, af = a
            xv, xf = x
            keep = jnp.logical_not(xf)
            return (xv + jnp.where(keep, av, 0.0), af | xf)

        sum_sc, _ = jax.lax.associative_scan(comb2, (o_sc, seg_start))
        g_match = seg_end & (o_row < b) & (sum_sc > 0.0) & dev.live[safe_docs]
    else:
        def comb(a, x):
            av, ac, af = a
            xv, xc, xf = x
            keep = jnp.logical_not(xf)
            return (xv + jnp.where(keep, av, 0.0), xc + jnp.where(keep, ac, 0), af | xf)

        sum_sc, sum_enc, _ = jax.lax.associative_scan(
            comb, (o_sc, o_enc, seg_start)
        )
        if filters is not None:
            # seg_end lanes carry group totals; adding each lane's own
            # plane bonus is exact there (one bonus per group, not scanned)
            sum_sc, sum_enc = _apply_planes_lanes(
                sum_sc, sum_enc, o_row, safe_docs, b, filters
            )
        if extras is not None:
            row_safe2 = jnp.clip(o_row, 0, b - 1)
            if with_dismax:
                def combm(a, x):
                    av, af = a
                    xv, xf = x
                    keep = jnp.logical_not(xf)
                    return (jnp.maximum(xv, jnp.where(keep, av, 0.0)), af | xf)

                max_sc, _ = jax.lax.associative_scan(combm, (o_sc, seg_start))
                tie = extras.dm_tie[row_safe2]
                sum_sc = jnp.where(
                    tie >= 0.0, (1.0 - tie) * max_sc + tie * sum_sc, sum_sc
                )
            demote_hit = ((sum_enc >> 4) & 0xF) > 0
            sum_sc = jnp.where(
                demote_hit, sum_sc * extras.demote[row_safe2], sum_sc
            )
            sum_sc = jnp.where(
                extras.const_on[row_safe2], extras.const_val[row_safe2], sum_sc
            )
        req_count = sum_enc >> 16
        should_count = (sum_enc >> 8) & 0xFF
        has_not = (sum_enc & 0xF) > 0
        g_match = (
            seg_end
            & (o_row < b)
            & (req_count == q.n_required[jnp.clip(o_row, 0, b - 1)])
            & (should_count >= q.min_should[jnp.clip(o_row, 0, b - 1)])
            & jnp.logical_not(has_not)
            & dev.live[safe_docs]
        )

    # order groups by (row, score desc, doc asc)
    key_row = jnp.where(g_match, o_row, jnp.int32(b))
    key_score = jnp.where(g_match, -sum_sc, jnp.inf)
    key_doc = jnp.where(g_match, o_doc, jnp.int32(2**31 - 1))
    s_row, s_negscore, s_doc = jax.lax.sort(
        (key_row, key_score, key_doc), num_keys=3, dimension=-1
    )
    prev_row = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_row[:-1]])
    fresh = s_row < b  # one lane per group already
    # rank of each fresh lane within its row = fresh lanes before it in the
    # same row (exact integer prefix sums; row start found by max-scan)
    f_int = fresh.astype(jnp.int32)
    c_excl = jnp.cumsum(f_int) - f_int
    idx = jnp.arange(s_row.shape[0], dtype=jnp.int32)
    row_change = s_row != prev_row
    row_start = jax.lax.associative_scan(jnp.maximum, jnp.where(row_change, idx, 0))
    rank = c_excl - jnp.take(c_excl, row_start)
    sel = fresh & (rank < k)
    out_rows = jnp.where(sel, s_row, b)  # OOB row -> dropped
    out_rank = jnp.where(sel, rank, 0)
    top_scores = jnp.full((b, k), -jnp.inf, jnp.float32).at[out_rows, out_rank].set(
        -s_negscore, mode="drop"
    )
    top_docs = jnp.full((b, k), jnp.int32(2**31 - 1)).at[out_rows, out_rank].set(
        s_doc, mode="drop"
    )
    total_hits = (
        jnp.zeros((b,), jnp.int32)
        .at[jnp.where(fresh, s_row, b)]
        .add(jnp.ones_like(s_row), mode="drop")
    )
    return top_scores, top_docs, total_hits


execute_flat = jax.jit(
    execute_flat_impl,
    static_argnames=(
        "k", "use_pallas", "pure_disjunction", "strategy", "has_ef",
        "combine_interpret", "with_dismax",
    ),
)


@partial(jax.jit, static_argnames=("k", "use_pallas", "max_lanes", "has_ef"))
def execute_flat_single(
    dev: DeviceSegment,
    q: FlatQueryBatch,
    row_item_start: jax.Array,  # i32[B] first work-item index of each row
    row_item_count: jax.Array,  # i32[B] work items belonging to each row
    row_hits: jax.Array,  # i32[B] live posting count (the row's total_hits)
    k: int,
    max_lanes: int,
    use_pallas: bool = False,
    has_ef: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Single-scoring-clause rows (plain term queries), no deleted docs:
    each row's lanes are one posting list in doc order, so no cross-clause
    combine OR dense [B, max_doc] accumulator is needed — top-k runs
    directly over a padded per-row lane view. Within a row, lanes ascend by
    doc id, so exact_top_k's lower-index tie-break IS the doc-asc tie-break
    (raw lax.top_k is NOT tie-stable on TPU at every shape — ops/topk.py).
    Memory and time are independent of max_doc (the path that makes
    many-million-doc corpora cheap for the most common query shape).

    Caller guarantees: one scoring clause per row with positive weight, no
    MUST_NOT/FILTER, dev.live all-true over real docs, and every row's
    work items contiguous in the flat list."""
    from rucene_tpu.ops.topk import extent_top_k_lanes

    target, rows, sc, valid, _ = decode_score_lanes(dev, q, use_pallas, has_ef)
    # a real posting always scores > 0 here (single positive-weight clause,
    # tf >= 1); invalid tail lanes carry score 0 and may be interleaved at
    # leaf boundaries in a combined view
    matched = valid & (sc > 0.0)
    score_l = jnp.where(matched, sc, -jnp.inf)
    docm = jnp.where(matched, target, jnp.int32(2**31 - 1))
    top_scores, top_docs = extent_top_k_lanes(
        score_l, docm, row_item_start, row_item_count, max_lanes // 128, k
    )
    total_hits = row_hits.astype(jnp.int32)
    return top_scores, top_docs, total_hits


def _fill_extents(vals: jax.Array, starts: jax.Array, w: int) -> jax.Array:
    """Piecewise-constant expansion: out[i] = vals[e] for i in extent e,
    where extent e covers [starts[e], starts[e+1]). One B-sized
    delta-scatter + one [w] cumsum — no per-lane gather from the [B]
    table (TPU gathers serialize; scans don't). Empty extents collapse
    correctly (their delta and the next extent's land on the same index
    and sum). f32 values must be bitcast to i32 by the caller so the
    telescoping delta sums reproduce exact bit patterns."""
    d = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]])
    arr = jnp.zeros(w, vals.dtype).at[starts].add(d, mode="drop")
    return jnp.cumsum(arr)


@partial(jax.jit, static_argnames=("k", "w", "max_items"))
def execute_flat_single_dec(
    dev: DeviceSegment,
    cval_dec: jax.Array,  # f32[NBr,128] resident BM25 denominators
    tbl: jax.Array,  # i32[4, B]: block_start, block_count, weight(bitcast), hits
    k: int,
    w: int,  # static work-list pad (pow2 >= sum block_count)
    max_items: int,  # static per-row extent cap (pow2)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decoded-residency single-term rows with the work list built ON
    DEVICE from per-row block ranges — the host sends one [4, B] i32
    table instead of a multi-MB flat work list (profile r4b: per-array
    device_put over the axon tunnel was ~30 ms/batch of the dispatch
    tax). Semantics identical to execute_flat_single (same score math,
    same extent top-k); caller guarantees decoded residency, one
    positive-weight scoring clause per row, and no deletes."""
    from rucene_tpu.ops.decode import INVALID_DOC
    from rucene_tpu.ops.topk import extent_top_k_lanes

    bs, bc, w_bits, row_hits = tbl[0], tbl[1], tbl[2], tbl[3]
    nbr = dev.docs_dec.shape[0]
    cum = jnp.cumsum(bc)
    starts = jnp.concatenate([jnp.zeros(1, bc.dtype), cum[:-1]])
    iota = jnp.arange(w, dtype=jnp.int32)
    blk = _fill_extents(bs - starts, starts, w) + iota
    weight = jax.lax.bitcast_convert_type(
        _fill_extents(w_bits, starts, w), jnp.float32
    )
    item_valid = iota < cum[-1]
    sb = jnp.clip(blk, 0, nbr - 1)
    cnt = jnp.where(item_valid, dev.blk_count[sb], 0)
    lane_valid = jnp.arange(128, dtype=jnp.int32)[None, :] < cnt[:, None]
    docs = jnp.where(lane_valid, dev.docs_dec[sb], INVALID_DOC)
    tf = jnp.where(lane_valid, dev.freqs_dec[sb].astype(jnp.float32), 0.0)
    sc = (weight[:, None] * tf) / (tf + cval_dec[sb])
    matched = lane_valid & (sc > 0.0)
    score_l = jnp.where(matched, sc, -jnp.inf)
    docm = jnp.where(matched, docs, jnp.int32(2**31 - 1))
    top_scores, top_docs = extent_top_k_lanes(
        score_l, docm, starts.astype(jnp.int32), bc, max_items, k
    )
    return top_scores, top_docs, row_hits


def _dense_match(dev: DeviceSegment, q: FlatQueryBatch, use_pallas: bool,
                 has_ef: bool = False, filters: FilterPlanes | None = None):
    """Dense boolean evaluation: (match bool[B,md], acc_score f32[B,md])."""
    b = q.n_required.shape[0]
    md = dev.max_doc_padded
    target, rows, sc, valid, _ = decode_score_lanes(dev, q, use_pallas, has_ef)
    acc_score = jnp.zeros((b, md), jnp.float32).at[rows, target].add(sc, mode="drop")
    inc = jnp.where(valid, q.wi_enc[:, None], 0)
    acc_counts = jnp.zeros((b, md), jnp.int32).at[rows, target].add(inc, mode="drop")
    if filters is not None:
        acc_score, acc_counts = _apply_planes_dense(acc_score, acc_counts, filters)
    req_count = acc_counts >> 16
    should_count = (acc_counts >> 8) & 0xFF
    has_not = (acc_counts & 0xF) > 0
    match = (
        (req_count == q.n_required[:, None])
        & (should_count >= q.min_should[:, None])
        & jnp.logical_not(has_not)
        & dev.live[None, :]
    )
    return match, acc_score


@partial(jax.jit, static_argnames=("k", "use_pallas", "reverse", "has_ef"))
def execute_flat_sorted(
    dev: DeviceSegment,
    q: FlatQueryBatch,
    keycol: jax.Array,  # f32[mdp] order-preserving sort key per doc (rank)
    k: int,
    use_pallas: bool = False,
    reverse: bool = False,
    has_ef: bool = False,
    filters: FilterPlanes | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sort-by-field search on the device (reference sort_field machinery,
    field_comparator.rs:367): dense boolean match + top-k by
    (key asc|desc, doc asc) over a per-doc key column. keycol carries
    order-preserving RANKS (exact in f32 for <2^24 distinct values); the
    caller maps ranks back to field values. Returns
    (top_keys f32[B,k], scores f32[B,k], docs i32[B,k], total_hits i32[B])."""
    match, acc_score = _dense_match(dev, q, use_pallas, has_ef, filters)
    sortval = jnp.where(match, keycol[None, :] * (1.0 if reverse else -1.0), -jnp.inf)
    top_negkeys, top_docs = topk_score_doc(sortval, k)
    got = top_negkeys > -jnp.inf
    top_keys = jnp.where(got, top_negkeys * (1.0 if reverse else -1.0), 0.0)
    safe = jnp.clip(top_docs, 0, dev.max_doc_padded - 1)
    scores = jnp.where(got, jnp.take_along_axis(acc_score, safe, axis=1), -jnp.inf)
    total_hits = jnp.sum(match, axis=1).astype(jnp.int32)
    return top_keys, scores, top_docs, total_hits


@partial(jax.jit, static_argnames=("n_keys", "use_pallas", "has_ef"))
def execute_collapse(
    dev: DeviceSegment,
    q: FlatQueryBatch,
    keycol: jax.Array,  # i32[mdp] collapse-key rank per doc
    n_keys: int,
    use_pallas: bool = False,
    has_ef: bool = False,
    filters: FilterPlanes | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Field collapse on the device (reference collapse_top_docs.rs:239):
    best (score desc, doc asc) hit per collapse key. Returns per-key tables
    (best_score f32[B,K] — -inf for absent keys, best_doc i32[B,K],
    total_hits i32[B]); the host merges leaves and takes the final top-k."""
    match, acc_score = _dense_match(dev, q, use_pallas, has_ef, filters)
    md = dev.max_doc_padded
    b = match.shape[0]
    key_b = jnp.broadcast_to(keycol[None, :], (b, md))
    rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, md))
    msc = jnp.where(match, acc_score, -jnp.inf)
    best_score = (
        jnp.full((b, n_keys), -jnp.inf, jnp.float32).at[rows, key_b].max(msc, mode="drop")
    )
    at_best = match & (acc_score == jnp.take_along_axis(
        best_score, jnp.clip(key_b, 0, n_keys - 1), axis=1
    ))
    doc_ids = jnp.broadcast_to(jnp.arange(md, dtype=jnp.int32)[None, :], (b, md))
    mdoc = jnp.where(at_best, doc_ids, jnp.int32(2**31 - 1))
    best_doc = (
        jnp.full((b, n_keys), jnp.int32(2**31 - 1)).at[rows, key_b].min(mdoc, mode="drop")
    )
    total_hits = jnp.sum(match, axis=1).astype(jnp.int32)
    return best_score, best_doc, total_hits


@partial(jax.jit, static_argnames=("use_pallas", "has_ef"))
def execute_probe(
    dev: DeviceSegment,
    q: FlatQueryBatch,  # B == 1
    probe_docs: jax.Array,  # i32[P] local doc ids (may repeat / pad with -1)
    use_pallas: bool = False,
    has_ef: bool = False,
    filters: FilterPlanes | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Evaluate one query densely and read (match, score) at specific docs
    — the device form of the rescorer's per-hit second-pass lookup
    (reference rescorer.rs:130 QueryRescorer::combine inputs)."""
    match, acc_score = _dense_match(dev, q, use_pallas, has_ef, filters)
    safe = jnp.clip(probe_docs, 0, dev.max_doc_padded - 1)
    ok = (probe_docs >= 0) & match[0, safe]
    return ok, jnp.where(ok, acc_score[0, safe], 0.0)


@partial(jax.jit, static_argnames=("k", "use_pallas", "has_ef"))
def execute_synonym(
    dev: DeviceSegment,
    q: FlatQueryBatch,  # one row per SpanOr query; clauses = member terms
    fid_row: jax.Array,  # i32[B] norms/cache row per query
    w_row: jax.Array,  # f32[B] boost * sum(member idf) * (k1+1)
    k: int,
    use_pallas: bool = False,
    has_ef: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Synonym scoring for SpanOrQuery over term clauses (span_or.rs via
    SpanScorer): every span has width 1, so freq(doc) = SUM of member
    tfs and the score is ONE BM25 application with the summed-idf weight
    — unlike the boolean executor, which scores each clause separately.
    Dense tf accumulation + per-doc norm-plane lookup + exact top-k."""
    b = q.n_required.shape[0]
    md = dev.max_doc_padded
    target, rows, _sc, valid, freqs = decode_score_lanes(dev, q, use_pallas, has_ef)
    tf = jnp.zeros((b, md), jnp.float32).at[rows, target].add(
        jnp.where(valid, freqs, 0).astype(jnp.float32), mode="drop"
    )
    norm_rows = dev.norms[fid_row]  # u8[B, md]
    cache_rows = q.cache[fid_row]  # f32[B, 256]
    cval = jnp.take_along_axis(cache_rows, norm_rows.astype(jnp.int32), axis=1)
    match = (tf > 0.0) & dev.live[None, :]
    score = w_row[:, None] * tf / (tf + cval)
    scores = jnp.where(match, score, -jnp.inf)
    top_scores, top_docs = topk_score_doc(scores, k)
    total_hits = jnp.sum(match, axis=1).astype(jnp.int32)
    return top_scores, top_docs, total_hits


@partial(jax.jit, static_argnames=("k", "n_terms", "use_pallas", "has_ef"))
def execute_mixed_planes(
    dev: DeviceSegment,
    q: FlatQueryBatch,  # TERM clauses only; n_required/min_should term-side
    planes: tuple,  # flat row-major: B x n_terms x u32[md, WORDS]
    overflows: tuple,  # B x n_terms x bool[md]
    denoms: tuple,  # B x f32[md] per-row phrase-field denominator planes
    weights: jax.Array,  # f32[B] phrase w2 = boost * sum(idf) * (k1+1)
    k: int,
    n_terms: int,
    use_pallas: bool = False,
    has_ef: bool = False,
    filters: FilterPlanes | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Mixed boolean rows — term clauses PLUS one required exact phrase —
    in one dispatch: dense term accumulators (_dense_match) combined with
    position-plane phrase frequencies (the engine's rewrite makes phrase
    clauses required, host_engine.evaluate_rewritten:217; the reference
    interleaves PhraseScorer in ConjunctionScorer, conjunction_scorer.rs).
    Returns (scores f32[B,k], docs i32[B,k], hits i32[B], ov_count i32[B]);
    rows with ov_count > 0 have term-matching docs whose phrase planes
    overflowed FMAX/PMAX and must be re-run by the host path."""
    from rucene_tpu.ops.phrase_plane import _shift_right

    match_t, acc = _dense_match(dev, q, use_pallas, has_ef, filters)
    b = q.n_required.shape[0]
    pf_rows, ov_rows = [], []
    for i in range(b):
        p = planes[i * n_terms : (i + 1) * n_terms]
        o = overflows[i * n_terms : (i + 1) * n_terms]
        accp = p[0]
        for j in range(1, n_terms):
            accp = accp & _shift_right(p[j], j)
        pf_rows.append(
            jnp.sum(jax.lax.population_count(accp), axis=1).astype(jnp.float32)
        )
        ov_any = o[0]
        present_all = jnp.any(p[0] != 0, axis=1) | o[0]
        for j in range(1, n_terms):
            ov_any = ov_any | o[j]
            present_all = present_all & (jnp.any(p[j] != 0, axis=1) | o[j])
        ov_rows.append(present_all & ov_any)
    pf_all = jnp.stack(pf_rows)  # [B, md]
    needs_host = jnp.stack(ov_rows) & dev.live[None, :]
    denom_all = jnp.stack(denoms)
    ph_score = weights[:, None] * pf_all / (pf_all + denom_all)
    match = match_t & (pf_all > 0) & jnp.logical_not(needs_host)
    scores_dense = jnp.where(match, acc + ph_score, -jnp.inf)
    top_scores, top_docs = topk_score_doc(scores_dense, k)
    hits = jnp.sum(match, axis=1).astype(jnp.int32)
    ov_count = jnp.sum(needs_host & match_t, axis=1).astype(jnp.int32)
    return top_scores, top_docs, hits, ov_count


class PlaneBatch(NamedTuple):
    """Device tables for the dense tf-plane executor (execute_planes):
    boolean rows whose term clauses ALL live as resident u8 tf planes
    (codec/device.add_tf_planes). Each row is up to T slots; slot -1 is
    inert (padding, or a term absent from this segment — which for a
    required clause correctly matches nothing)."""

    slot: jax.Array  # i32[B, T] plane row per clause; -1 inert
    kindenc: jax.Array  # i32[B, T] ENC_REQUIRED/ENC_SHOULD/ENC_NOT; 0 pad
    weight: jax.Array  # f32[B, T] boost*idf*(k1+1); 0 for non-scoring
    fid: jax.Array  # i32[B, T] norms/cache row per clause
    n_required: jax.Array  # i32[B]
    min_should: jax.Array  # i32[B]


@partial(jax.jit, static_argnames=("k", "same_fid"))
def execute_planes(
    planes: jax.Array,  # u8[P, md]
    cval_planes: jax.Array,  # f32[F, md] BM25 denominators per doc
    live: jax.Array,  # bool[md]
    pb: PlaneBatch,
    k: int,
    same_fid: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fully dense boolean/BM25 evaluation over resident tf planes: for
    each row, T gathered u8 rows + fused elementwise math over [B, md] —
    the TPU inversion of skip-list leapfrog for HIGH-DF clauses (rucene
    conjunction_scorer.rs / disjunction_scorer.rs): at df >= md/512 the
    postings of a clause approach a dense column anyway, so streaming the
    column at HBM rate beats any sparse intersection. Scores are
    bit-identical to the lane executor: (weight*tf)/(tf+cval) per clause,
    commutative f32 adds, same match composition as execute_flat_impl.

    same_fid (STATIC): >= 0 when every clause in the batch shares that
    norms row — cval broadcasts from one [md] row (read once per tile)
    instead of a per-row [B, md] gather. Returns (scores f32[B,k],
    docs i32[B,k], total_hits i32[B])."""
    p, md = planes.shape
    b, t = pb.slot.shape
    nf = cval_planes.shape[0]
    acc = jnp.zeros((b, md), jnp.float32)
    cnt = jnp.zeros((b, md), jnp.int32)
    cv_shared = cval_planes[same_fid][None, :] if same_fid >= 0 else None
    for i in range(t):  # T is tiny and static: unrolled, XLA fuses the loop
        sl = pb.slot[:, i]
        on = sl >= 0
        tf = jnp.where(
            on[:, None], planes[jnp.clip(sl, 0, p - 1)].astype(jnp.float32), 0.0
        )
        cv = (
            cv_shared
            if cv_shared is not None
            else cval_planes[jnp.clip(pb.fid[:, i], 0, nf - 1)]
        )
        acc = acc + (pb.weight[:, i][:, None] * tf) / (tf + cv)
        cnt = cnt + jnp.where(tf > 0.0, pb.kindenc[:, i][:, None], 0)
    match = (
        ((cnt >> 16) == pb.n_required[:, None])
        & (((cnt >> 8) & 0xFF) >= pb.min_should[:, None])
        & ((cnt & 0xF) == 0)
        & live[None, :]
    )
    scores = jnp.where(match, acc, -jnp.inf)
    top_scores, top_docs = topk_score_doc(scores, k)
    total_hits = jnp.sum(match, axis=1).astype(jnp.int32)
    return top_scores, top_docs, total_hits


class PairBatch(NamedTuple):
    """Device tables for the pair-gallop executor (execute_flat_pair) —
    the batched TPU analog of the reference's doc-at-a-time leapfrog
    (conjunction_scorer.rs over skip_reader.rs:118), for rows of exactly
    two positive term clauses (AND2 / OR2, the dominant boolean shapes).

    Owner work items are blocks whose lanes CANDIDATE the row's matches.
    The owner is always the DENSER clause (more blocks): its blocks span
    narrow doc ranges, so the number of probe (other-clause) blocks
    overlapping any owner block is small — each owner item carries a
    fixed [MAXP] slot table of overlapping probe block ids, and every
    owner lane resolves membership + the probe clause's BM25 contribution
    with a pure-VPU broadcast compare over those slots. No [B, max_doc]
    accumulator, no lane sort, no scatter (the flat pair-list + segment
    sum formulation measured 0.6-1.2 s/batch at 1M docs — scatter-bound).
    The compare runs as a lax.scan over owner-item chunks: unrolled, XLA
    materialized every [chunk,128,MAXP*128] predicate at once (30 GB of
    HBM temps at 1M docs); per-lane binary search instead of the compare
    measured 10-40x SLOWER (TPU per-lane gathers serialize, ~50M/s).

    OR2 keeps a second extent of the SPARSER clause's lanes carrying
    partial scores (own clause only, possibly duplicating intersection
    docs); the merge takes top-k of the probing extent (full scores) +
    top-2k of the partial extent and dedups by doc, which is exact: if
    2k partial entries outrank a non-duplicate candidate, at most k are
    intersection dupes and the rest outrank it with exact scores, so it
    was never in the top-k. Exact total_hits via inclusion-exclusion
    counted on owner lanes."""

    # owner-item tables (aligned with the FlatQueryBatch work list)
    oi_mode: jax.Array  # i32[W] 1=OR-probing 2=OR-partial 3=AND-probing
    oi_pw: jax.Array  # f32[W] probe clause weight (0 if probe absent)
    pr_slots: jax.Array  # i32[W, MAXP] probe global block ids (-1 inert)
    # per-row lane extents (owner items contiguous per extent, rows asc)
    row_p_start: jax.Array  # i32[B] first owner item, probing extent
    row_p_items: jax.Array  # i32[B]
    row_s_start: jax.Array  # i32[B] partial (OR sparse) extent
    row_s_items: jax.Array  # i32[B]


@partial(jax.jit, static_argnames=("k", "max_lanes_p", "max_lanes_s",
                                   "with_live", "probe_variant",
                                   "topk_variant"))
def execute_flat_pair(
    dev: DeviceSegment,
    q: FlatQueryBatch,
    p: PairBatch,
    k: int,
    max_lanes_p: int,
    max_lanes_s: int,
    with_live: bool = False,
    probe_variant: str = "v3",
    topk_variant: str = "item",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Two-term-clause boolean rows via pair gallop (see PairBatch).
    Decoded-residency only (dev.docs_dec is not None — the caller
    guarantees it). with_live: gather the live mask per lane (segments
    with deletes). probe_variant (STATIC):
      "v3":    membership + probe tf + probe BM25 denominator all resolved
               by the broadcast compare (any field combination);
      "nopcv": caller guarantees BOTH clauses of every row target the SAME
               field — then the probe doc's denominator cval(fid, doc)
               equals the OWNER lane's own denominator (same doc, same
               norms row), already resident in q.cval_dec[owner block]:
               the probe compare carries only tf, cutting its gather +
               select + reduce volume ~40%. Bit-identical scores.
    Returns (scores f32[B,k], docs i32[B,k], total_hits i32[B])."""
    from rucene_tpu.ops.decode import INVALID_DOC

    md = dev.max_doc_padded
    b = p.row_p_start.shape[0]
    target, _rows, sc, valid, _ = decode_score_lanes(dev, q, False, False)
    w, maxp = p.pr_slots.shape

    # --- probe phase: per owner-item chunk, [CH, MAXP*128] windows of
    # probe docs/freqs/denoms resolve every lane's membership by a
    # broadcast compare (each doc appears in at most one probe block, so
    # the masked sums ARE selects — float-exact). lax.scan bounds the
    # predicate temps to one chunk (~2^27 elements) at a time ---
    nbr = dev.docs_dec.shape[0]
    slot_ok_all = p.pr_slots >= 0
    sb_all = jnp.clip(p.pr_slots, 0, nbr - 1)
    ch = min(w, max(8, 8192 // maxp))  # both pow2 -> ch divides w
    steps = w // ch
    with_pcv = probe_variant != "nopcv"

    def probe_chunk(_, ci):
        o = ci * ch
        sb = jax.lax.dynamic_slice_in_dim(sb_all, o, ch)  # [ch, maxp]
        ok = jax.lax.dynamic_slice_in_dim(slot_ok_all, o, ch)
        tg = jax.lax.dynamic_slice_in_dim(target, o, ch)  # [ch, 128]
        pd = jnp.where(
            ok[:, :, None], dev.docs_dec[sb], INVALID_DOC
        ).reshape(ch, 1, maxp * 128)
        pf = jnp.where(
            ok[:, :, None], dev.freqs_dec[sb].astype(jnp.float32), 0.0
        ).reshape(ch, 1, maxp * 128)
        m = pd == tg[:, :, None]  # [ch, 128, maxp*128]
        ptf_c = jnp.sum(jnp.where(m, pf, 0.0), axis=2)  # [ch, 128]
        if not with_pcv:
            return None, (ptf_c, jnp.zeros((ch, 0), jnp.float32))
        pc = q.cval_dec[sb].reshape(ch, 1, maxp * 128)
        pcv_c = jnp.sum(jnp.where(m, pc, 0.0), axis=2)
        return None, (ptf_c, pcv_c)

    _, (ptf, pcv) = jax.lax.scan(
        probe_chunk, None, jnp.arange(steps, dtype=jnp.int32)
    )
    ptf = ptf.reshape(w, 128)
    if with_pcv:
        pcv = pcv.reshape(w, 128)
    else:
        # same-field pair: the probe doc IS the owner lane's doc, so its
        # BM25 denominator is the owner block's resident cval row
        pcv = q.cval_dec[jnp.clip(q.wi_block, 0, nbr - 1)]
    member = ptf > 0.0  # real postings always have tf >= 1
    pw = p.oi_pw[:, None]
    psc = jnp.where(member, pw * ptf / jnp.where(member, ptf + pcv, 1.0), 0.0)

    # --- owner-lane resolution ---
    if with_live:
        alive = valid & dev.live[jnp.clip(target, 0, md - 1)]
    else:
        alive = valid
    mode = p.oi_mode[:, None]  # [W,1] broadcasts over lanes
    match = alive & jnp.where(mode == 3, member, True)
    score = jnp.where(
        match, sc + jnp.where(mode == 2, 0.0, psc), -jnp.inf
    )
    # exact union counts: probing extent counts alive & ~member (for OR;
    # AND counts alive & member), partial extent counts alive — summing
    # both extents yields |A| + |B| - |A∩B| (OR) / |A∩B| (AND)
    count_lane = jnp.where(
        mode == 1, alive & ~member, jnp.where(mode == 2, alive, match)
    ).astype(jnp.int32)

    # --- per-row top-k: item-level block-max chunk selection per extent
    # (ops.topk.extent_top_k_lanes — lanes ascend by doc within an extent,
    # so index-asc tie-break IS doc-asc), then a small dedup + merge over
    # <= 3k candidates. topk_variant="mat" (A/B) instead materializes each
    # row's [max_lanes] view via dynamic-slice and runs exact_top_k ---
    from rucene_tpu.ops.topk import exact_top_k, extent_top_k_lanes

    docm = jnp.where(match, target, jnp.int32(2**31 - 1))

    if topk_variant == "mat":
        pad = max(max_lanes_p, max_lanes_s, 1)
        sflat = jnp.concatenate(
            [score.reshape(-1), jnp.full(pad, -jnp.inf, jnp.float32)]
        )
        dflat = jnp.concatenate(
            [docm.reshape(-1), jnp.full(pad, jnp.int32(2**31 - 1))]
        )

        def extent_topk(start, items, max_lanes, kk):
            def row(s, n):
                sc_v = jax.lax.dynamic_slice(sflat, (s * 128,), (max_lanes,))
                dc_v = jax.lax.dynamic_slice(dflat, (s * 128,), (max_lanes,))
                j = jnp.arange(max_lanes, dtype=jnp.int32)
                in_row = j < n * 128
                return jnp.where(in_row, sc_v, -jnp.inf), jnp.where(
                    in_row, dc_v, jnp.int32(2**31 - 1)
                )

            sc_rows, dc_rows = jax.vmap(row)(start, items)
            k_eff = min(kk, max_lanes)
            ts, tj = exact_top_k(sc_rows, k_eff)
            td = jnp.take_along_axis(
                dc_rows, jnp.clip(tj, 0, max_lanes - 1), axis=1
            )
            got = ts > -jnp.inf
            td = jnp.where(got, td, jnp.int32(2**31 - 1))
            if k_eff < kk:
                ts = jnp.concatenate(
                    [ts, jnp.full((b, kk - k_eff), -jnp.inf, jnp.float32)],
                    axis=1,
                )
                td = jnp.concatenate(
                    [td, jnp.full((b, kk - k_eff), jnp.int32(2**31 - 1))],
                    axis=1,
                )
            return ts, td
    else:
        def extent_topk(start, items, max_lanes, kk):
            return extent_top_k_lanes(
                score, docm, start, items, max_lanes // 128, kk
            )

    ts_p, td_p = extent_topk(p.row_p_start, p.row_p_items, max_lanes_p, k)
    if max_lanes_s > 0:
        ts_s, td_s = extent_topk(p.row_s_start, p.row_s_items, max_lanes_s, 2 * k)
        cs = jnp.concatenate([ts_p, ts_s], axis=1)
        cd = jnp.concatenate([td_p, td_s], axis=1)
        # dedup duplicate docs (keep the higher score = the full entry):
        # sort by (doc, -score), kill adjacent repeats, re-sort by
        # (-score, doc), take k — all at <= 3k width
        d1, ns1 = jax.lax.sort((cd, -cs), num_keys=2, dimension=-1)
        dup = jnp.concatenate(
            [jnp.zeros((b, 1), bool), d1[:, 1:] == d1[:, :-1]], axis=1
        ) & (d1 != jnp.int32(2**31 - 1))
        ns1 = jnp.where(dup, jnp.inf, ns1)
        d1 = jnp.where(dup, jnp.int32(2**31 - 1), d1)
        ns2, d2 = jax.lax.sort((ns1, d1), num_keys=2, dimension=-1)
        top_scores, top_docs = -ns2[:, :k], d2[:, :k]
    else:
        top_scores, top_docs = ts_p, td_p

    # exact total hits: prefix sums of per-item counts, read per extent
    cnt = jnp.concatenate(
        [jnp.cumsum(count_lane.sum(axis=1)), jnp.zeros(1, jnp.int32)]
    )

    def ext_hits(start, items):
        lo = jnp.where(start > 0, cnt[jnp.clip(start - 1, 0, w)], 0)
        hi = jnp.where(
            items > 0, cnt[jnp.clip(start + items - 1, 0, w)], lo
        )
        return hi - lo

    total_hits = (
        ext_hits(p.row_p_start, p.row_p_items)
        + ext_hits(p.row_s_start, p.row_s_items)
    ).astype(jnp.int32)
    return top_scores, top_docs, total_hits


@partial(jax.jit, static_argnames=("k",))
def execute_match_all(
    dev: DeviceSegment, boost: jax.Array, k: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """MatchAllDocsQuery / pure constant-score path: every live doc matches
    with a constant score (reference match_all_query.rs). Scores are equal,
    so the top-k under (score desc, doc asc) is just the FIRST k live docs:
    cumsum + searchsorted instead of a full [B, md] top-k."""
    md = dev.max_doc_padded
    kk = min(k, md)
    live_i = dev.live.astype(jnp.int32)
    n_live = jnp.sum(live_i)
    rank = jnp.cumsum(live_i)
    tgt = jnp.arange(1, kk + 1, dtype=jnp.int32)
    pos = jnp.searchsorted(rank, tgt, side="left").astype(jnp.int32)
    valid = tgt <= n_live
    docs_row = jnp.where(valid, pos, jnp.int32(2**31 - 1))
    b = boost.shape[0]
    top_docs = jnp.broadcast_to(docs_row, (b, kk))
    top_scores = jnp.where(valid[None, :], boost[:, None], -jnp.inf)
    if kk < k:
        top_docs = jnp.concatenate(
            [top_docs, jnp.full((b, k - kk), jnp.int32(2**31 - 1))], axis=1
        )
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((b, k - kk), -jnp.inf, jnp.float32)], axis=1
        )
    total_hits = n_live.astype(jnp.int32)[None].repeat(b)
    return top_scores, top_docs, total_hits
