"""Dense position-plane phrase matching — the TPU shape of heavy exact
phrases (common x common terms), where the candidate-table pipeline
(phrase_device.py) cannot fit its static tables.

The reference's ExactPhraseScorer walks two huge postings lists with a
skip-list leapfrog and per-doc position merges (phrase_scorer.rs:122) —
pointer-chasing a vector machine cannot express. Here each term becomes a
dense bit-packed POSITION PLANE over the whole doc space:

    plane[doc] = 128-bit mask, bit p set iff the term occurs at position p

built once per (leaf, field, term) with one decode + one scatter and
CACHED on device (u32[md,4] = 16 MB at 1M docs) — common terms ("the",
"new", "york") are reused across phrase rows and batches. An n-term exact
phrase is then a shifted AND:

    pf[doc] = popcount( plane_0 & (plane_1 >> 1) & ... & (plane_n >> n-1) )

pure elementwise VPU work, followed by the standard BM25 + dense top-k.
Work is O(md) per row regardless of how common the terms are — at 1M docs
a row verifies in ~1 ms where the scalar leapfrog needs tens of ms on one
core.

Exactness: docs with > FMAX occurrences of a term or any position >= PMAX
are flagged in the term's overflow column; the searcher re-verifies just
those docs on the host (rare — PMAX=128 covers docs shorter than 128
tokens), so results stay exact for every input.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rucene_tpu.codec.device import DeviceSegment
from rucene_tpu.ops.decode import decode_doc_blocks, decode_freq_blocks

PMAX = 128  # positions per doc covered by the plane (4 u32 words)
WORDS = PMAX // 32
# occurrences decoded per (term, doc). Too small and every top-frequency
# term overflows SOMEWHERE in a large corpus (a tf > FMAX doc), spilling
# whole rows; 64 covers any doc up to 64 tokens outright, and longer docs
# only overflow when a term really occurs > 64 times (then the searcher
# host-fixes those docs individually).
FMAX = 64
# work items per scan step: a hot term at 8.8M docs has 131072 blocks and
# the per-item temporaries are [C, 128, FMAX] i32 (~134 MB at C=4096);
# building unchunked OOMed HBM (20 GB of temps). W is pow2-padded, so any
# pow2 C <= W divides it evenly.
BUILD_CHUNK = 4096
# hard per-call work-item ceiling: the W=131072 program (a zipf-head term
# at 8.8M docs, 66360 blocks) reliably CRASHES the axon TPU worker while
# every shape <= 65536 builds fine (exp/logs/plane_build_probe.log — w2 at
# 65536 passes, w0 at 131072 faults; genuine HBM exhaustion instead raises
# a clean RESOURCE_EXHAUSTED, so this is a backend kernel fault, not
# memory). Callers split wider terms into <= MAX_BUILD_ITEMS calls and OR
# the partials — exact, because one term's (doc, position) bits are
# disjoint across blocks.
MAX_BUILD_ITEMS = 65536


@partial(jax.jit, static_argnames=("has_ef", "words"))
def build_position_plane(
    dev: DeviceSegment,
    wi_block: jax.Array,  # i32[W] the term's global block ids (padded)
    wi_valid: jax.Array,  # bool[W]
    pos_width: jax.Array,  # i32[] packed position-delta width
    pos_word_start: jax.Array,  # i32[] word offset of the term's stream
    has_ef: bool = False,
    words: int = WORDS,
) -> tuple[jax.Array, jax.Array]:
    """-> (plane u32[md, words], overflow bool[md]).

    words: u32 words per doc (positions covered = 32*words). The search
    ops are shape-generic, so a leaf whose docs provably fit 64 positions
    (norm-byte upper bound, phrase_path._plane_words) uses words=2 —
    half the plane bytes, double the resident-set capacity.

    One lax.scan step per BUILD_CHUNK work items accumulates directly into
    the packed u32 plane with a scatter-ADD: within one term, (doc,
    position) pairs are unique across all lanes (a doc's occurrences live
    in one lane; positions strictly increase within a doc), so adding
    distinct power-of-two bit values IS the OR — no [md, PMAX] bool
    transient, no [md, WORDS, 32] packing reduce (4.3 GB at 8.8M docs)."""
    md = dev.max_doc_padded
    pmax = 32 * words
    w_items = wi_block.shape[0]
    c = min(w_items, BUILD_CHUNK)
    n_chunks = w_items // c
    limit = dev.positions.shape[0] - 1
    w = pos_width.astype(jnp.int32)
    vmask = jnp.where(
        w >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << w.astype(jnp.uint32)) - 1
    )
    fidx = jnp.arange(FMAX, dtype=jnp.int32)

    def chunk_step(carry, xs):
        plane_flat, overflow = carry
        blk, valid_c = xs
        off = dev.blk_off[blk]
        dbits = dev.blk_doc_bits[blk]
        fbits = dev.blk_freq_bits[blk]
        base = dev.blk_base[blk]
        cnt = jnp.where(valid_c, dev.blk_count[blk], 0)

        if dev.docs_dec is not None:
            # decoded residency: row gathers replace the in-scan unpack
            from rucene_tpu.ops.decode import INVALID_DOC

            sb = jnp.clip(blk, 0, dev.docs_dec.shape[0] - 1)
            valid = jnp.arange(128, dtype=jnp.int32)[None, :] < cnt[:, None]
            docs = jnp.where(valid, dev.docs_dec[sb], INVALID_DOC)
            freqs = jnp.where(valid, dev.freqs_dec[sb].astype(jnp.int32), 0)
        else:
            docs, valid = decode_doc_blocks(
                dev.data, off, dbits, base, cnt, has_ef=has_ef
            )
            freqs = decode_freq_blocks(dev.data, off, dbits, fbits, valid)
        pos_off = dev.blk_pos_base[blk][:, None] + (
            jnp.cumsum(freqs, axis=1) - freqs
        )

        occ = pos_off[:, :, None] + fidx[None, None, :]  # [C,128,FMAX]
        pvalid = valid[:, :, None] & (fidx[None, None, :] < freqs[:, :, None])
        bitpos = occ * w
        widx = pos_word_start.astype(jnp.int32) + (bitpos >> 5)
        shift = (bitpos & 31).astype(jnp.uint32)
        w0 = dev.positions[jnp.clip(widx, 0, limit)]
        w1 = dev.positions[jnp.clip(widx + 1, 0, limit)]
        lo = w0 >> shift
        hi = jnp.where(shift == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - shift))
        deltas = ((lo | hi) & vmask).astype(jnp.int32)
        deltas = jnp.where(pvalid, deltas, 0)
        pwin = jnp.cumsum(deltas, axis=-1)  # absolute positions per doc run

        # overflow: more occurrences than FMAX, or a position off the plane
        over_lane = valid & (
            (freqs > FMAX)
            | (jnp.max(jnp.where(pvalid, pwin, 0), axis=-1) >= pmax)
        )
        safe_docs = jnp.where(valid, docs, md)  # md row is the drop bucket
        overflow = overflow.at[safe_docs].max(over_lane, mode="drop")

        on = pvalid & (pwin < pmax)
        word_idx = jnp.where(
            on,
            docs[:, :, None].astype(jnp.int32) * words + (pwin >> 5),
            md * words,  # in-buffer drop bucket (bitval 0 there anyway)
        )
        bitval = jnp.where(
            on, jnp.uint32(1) << (pwin & 31).astype(jnp.uint32), jnp.uint32(0)
        )
        plane_flat = plane_flat.at[word_idx].add(bitval, mode="drop")
        return (plane_flat, overflow), None

    init = (
        jnp.zeros((md * words + words,), jnp.uint32),
        jnp.zeros((md + 1,), jnp.bool_),
    )
    xs = (wi_block.reshape(n_chunks, c), wi_valid.reshape(n_chunks, c))
    (plane_flat, overflow), _ = jax.lax.scan(chunk_step, init, xs)
    return plane_flat[: md * words].reshape(md, words), overflow[:md]


# NOTE: a fused multi-plane builder (N terms -> one program) was built,
# CPU-parity-tested, and REVERTED: its flat accumulator's per-plane
# reshape slices materialize with the TPU tiled layout {1,0:T(8,128)} —
# a [N, 2]/[N, 4] u32 intermediate lane-pads 64x/32x, OOMing the compile
# at 8.8M docs (36-72 GB allocations; exp/logs/bench_8m_k100_r5b.log,
# _r5c.log). exp/planes_multi_proto.py keeps the implementation record.
# With serving-time admission (phrase_path._plane_resident_terms) the
# steady state builds no planes, so fusing builds had no measurable win.


def _shift_right(plane: jax.Array, j: int) -> jax.Array:
    """Logical right shift of each doc's 128-bit mask by j (< 32) bits."""
    if j == 0:
        return plane
    nxt = jnp.concatenate(
        [plane[:, 1:], jnp.zeros((plane.shape[0], 1), plane.dtype)], axis=1
    )
    return (plane >> jnp.uint32(j)) | (nxt << jnp.uint32(32 - j))


@partial(jax.jit, static_argnames=("k", "n_terms"))
def phrase_plane_search_many(
    planes: tuple,  # flat tuple, row-major: R rows x n_terms x u32[md, WORDS]
    overflows: tuple,  # R x n_terms x bool[md]
    live: jax.Array,  # bool[md]
    denoms: tuple,  # R x f32[md] per-row denominator planes (device-cached)
    weights: jax.Array,  # f32[R]
    k: int,
    n_terms: int,
) -> tuple:
    """Batched phrase_plane_search: R same-arity rows in ONE dispatch.

    Per-row dispatches cost ~35 ms each over the axon tunnel (62 phrase
    rows = 2.2 s/batch, 90% of mixed-batch time at 1M docs); the planes
    are already device-resident, so one dispatch taking them as a flat
    pytree does the same work in one launch. Rows with ov_count > 0 are
    re-verified whole by the caller's scalar path, so no ov_docs table is
    produced. Returns per-row stacked (scores f32[R,k], docs i32[R,k],
    hits i32[R], ov_count i32[R])."""
    md = planes[0].shape[0]
    r_rows = len(planes) // n_terms

    pf_rows, match_rows, ovh_rows = [], [], []
    for r in range(r_rows):
        p = planes[r * n_terms : (r + 1) * n_terms]
        o = overflows[r * n_terms : (r + 1) * n_terms]
        acc = p[0]
        for j in range(1, n_terms):
            acc = acc & _shift_right(p[j], j)
        pf = jnp.sum(jax.lax.population_count(acc), axis=1).astype(jnp.float32)
        ov_any = o[0]
        present_all = jnp.any(p[0] != 0, axis=1) | o[0]
        for j in range(1, n_terms):
            ov_any = ov_any | o[j]
            present_all = present_all & (jnp.any(p[j] != 0, axis=1) | o[j])
        needs_host = present_all & ov_any & live
        pf_rows.append(pf)
        match_rows.append((pf > 0) & live & jnp.logical_not(needs_host))
        ovh_rows.append(needs_host)

    pf_all = jnp.stack(pf_rows)  # [R, md]
    match_all = jnp.stack(match_rows)
    needs_all = jnp.stack(ovh_rows)
    denom_all = jnp.stack(denoms)  # [R, md]
    score = weights[:, None] * pf_all / (pf_all + denom_all)
    scores_dense = jnp.where(match_all, score, -jnp.inf)
    from rucene_tpu.ops.topk import topk_score_doc

    top_scores, top_docs = topk_score_doc(scores_dense, k)
    hits = jnp.sum(match_all, axis=1).astype(jnp.int32)
    ov_count = jnp.sum(needs_all, axis=1).astype(jnp.int32)
    return top_scores, top_docs, hits, ov_count


def _span_unordered_pf(planes_row: tuple, n_terms: int, slop: int):
    """Exact unordered span-near frequency from position planes.

    Host contract (spans.py SpanNearQuery unordered enumeration): a
    candidate interval [s0, e0] is achievable iff every clause has an
    occurrence inside, some clause occurs AT s0, some AT e0-1, and the
    start/end witnesses are distinct clauses; sloppy freq sums
    1/(1 + width - n) over all achievable intervals. With one term per
    position this is pure bit algebra per window width w in [n, n+slop]:
      valid_w[p] = AND_t windowOR_w(P_t)[p]      (all terms inside)
                 & U[p] & U[p + w - 1]            (witness at both ends)
                 & NOT OR_t (P_t[p] & P_t[p+w-1]) (distinct witnesses)
    Duplicate clause terms break the distinctness reduction — the caller
    must route those rows to the host."""
    u = planes_row[0]
    for t in range(1, n_terms):
        u = u | planes_row[t]
    smears = list(planes_row)
    pf = None
    for w in range(2, n_terms + slop + 1):
        sh = w - 1
        smears = [s | _shift_right(p, sh) for s, p in zip(smears, planes_row)]
        if w < n_terms:
            continue
        allin = smears[0]
        for t in range(1, n_terms):
            allin = allin & smears[t]
        pair_bad = planes_row[0] & _shift_right(planes_row[0], sh)
        for t in range(1, n_terms):
            pair_bad = pair_bad | (planes_row[t] & _shift_right(planes_row[t], sh))
        valid = allin & u & _shift_right(u, sh) & ~pair_bad
        cnt = jnp.sum(jax.lax.population_count(valid), axis=1).astype(jnp.float32)
        wgt = jnp.float32(1.0) / jnp.float32(1 + w - n_terms)
        pf = cnt * wgt if pf is None else pf + cnt * wgt
    if pf is None:  # degenerate (n_terms < 2 is caller-excluded)
        pf = jnp.zeros(planes_row[0].shape[0], jnp.float32)
    return pf


@partial(jax.jit, static_argnames=("k", "n_terms", "slop"))
def span_unordered_plane_search_many(
    planes: tuple,  # flat row-major: R x n_terms x u32[md, WORDS]
    overflows: tuple,  # R x n_terms x bool[md]
    live: jax.Array,
    denoms: tuple,  # R x f32[md]
    weights: jax.Array,  # f32[R]
    k: int,
    n_terms: int,
    slop: int,
) -> tuple:
    """Batched unordered span-near rows (same contract as
    phrase_plane_search_many: rows with ov_count > 0 rerun on the host)."""
    r_rows = len(planes) // n_terms
    pf_rows, match_rows, ovh_rows = [], [], []
    for r in range(r_rows):
        p = planes[r * n_terms : (r + 1) * n_terms]
        o = overflows[r * n_terms : (r + 1) * n_terms]
        pf = _span_unordered_pf(p, n_terms, slop)
        ov_any = o[0]
        present_all = jnp.any(p[0] != 0, axis=1) | o[0]
        for j in range(1, n_terms):
            ov_any = ov_any | o[j]
            present_all = present_all & (jnp.any(p[j] != 0, axis=1) | o[j])
        needs_host = present_all & ov_any & live
        pf_rows.append(pf)
        match_rows.append((pf > 0) & live & jnp.logical_not(needs_host))
        ovh_rows.append(needs_host)
    pf_all = jnp.stack(pf_rows)
    match_all = jnp.stack(match_rows)
    needs_all = jnp.stack(ovh_rows)
    denom_all = jnp.stack(denoms)
    score = weights[:, None] * pf_all / (pf_all + denom_all)
    scores_dense = jnp.where(match_all, score, -jnp.inf)
    from rucene_tpu.ops.topk import topk_score_doc

    top_scores, top_docs = topk_score_doc(scores_dense, k)
    hits = jnp.sum(match_all, axis=1).astype(jnp.int32)
    ov_count = jnp.sum(needs_all, axis=1).astype(jnp.int32)
    return top_scores, top_docs, hits, ov_count


@partial(jax.jit, static_argnames=("k", "n_terms", "ov_cap"))
def phrase_plane_search(
    planes: tuple,  # n_terms x u32[md, WORDS]
    overflows: tuple,  # n_terms x bool[md]
    live: jax.Array,  # bool[md]
    denom_row: jax.Array,  # f32[md] precomputed cache[norm_byte[doc]]
    weight: jax.Array,  # f32[] boost * sum(idf) * (k1+1)
    k: int,
    n_terms: int,
    ov_cap: int = 1024,
) -> tuple:
    """Exact-phrase scoring from cached planes: shifted AND + popcount.

    Returns (scores f32[k], docs i32[k], hits i32, ov_docs i32[ov_cap],
    ov_count i32): ov_docs lists candidate docs needing host verification
    (some term overflowed FMAX/PMAX there, ascending, -pad 2^31-1);
    ov_count > ov_cap means the caller must re-verify the whole row."""
    md = planes[0].shape[0]
    acc = planes[0]
    for j in range(1, n_terms):
        acc = acc & _shift_right(planes[j], j)
    pf = jnp.sum(
        jax.lax.population_count(acc), axis=1
    ).astype(jnp.float32)  # [md]

    ov_any = overflows[0]
    present_all = jnp.any(planes[0] != 0, axis=1) | overflows[0]
    for j in range(1, n_terms):
        ov_any = ov_any | overflows[j]
        present_all = present_all & (
            jnp.any(planes[j] != 0, axis=1) | overflows[j]
        )
    needs_host = present_all & ov_any & live

    match = (pf > 0) & live & jnp.logical_not(needs_host)
    # denom_row is the per-doc BM25 denominator term (cache[norm byte]),
    # precomputed once per (leaf, field) — scoring is pure elementwise
    # (the per-doc cache[norm] gather was ~8 ms/row at 1M docs)
    score = weight * pf / (pf + denom_row)
    scores_dense = jnp.where(match, score, -jnp.inf)
    from rucene_tpu.ops.topk import topk_score_doc

    top_scores, top_docs = topk_score_doc(scores_dense[None, :], k)
    hits = jnp.sum(match).astype(jnp.int32)

    # compact the host-verify docs (ascending) into a fixed table — only
    # when some doc actually overflowed (the common case skips the sort)
    ov_count = jnp.sum(needs_host).astype(jnp.int32)
    cap = min(ov_cap, md)

    def compact(_):
        doc_ids = jnp.arange(md, dtype=jnp.int32)
        ov_keys = jnp.where(needs_host, doc_ids, jnp.int32(2**31 - 1))
        return -jax.lax.top_k(-ov_keys, cap)[0]

    ov_docs = jax.lax.cond(
        ov_count > 0,
        compact,
        lambda _: jnp.full((cap,), jnp.int32(2**31 - 1)),
        None,
    )
    return top_scores[0], top_docs[0], hits, ov_docs, ov_count
