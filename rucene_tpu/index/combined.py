"""Single-dispatch multi-segment search: a CombinedView concatenates every
leaf's packed postings into ONE virtual device segment so a whole NRT
index is searched with one executor dispatch instead of one per leaf.

Where the reference searches leaves sequentially per query
(index_searcher.rs:236 per-LeafReaderContext scorer loop), the batched
executor is shape-polymorphic in the block table, so N segments are just
more rows in the same tables:
- block ids:   leaf block tables concatenated (block_start += leaf offset)
- doc space:   leaves laid out back-to-back at 1024-padded bases; decoded
               doc = blk_base + deltas lands directly in the global space
- norms:       [global_field, total_docs] — a leaf lacking a field keeps
               zero rows (never matched, never scored)
- live:        concatenated, padding docs dead

Each (query, clause) fans out to one work-item range PER LEAF; a doc lives
in exactly one leaf, so duplicated clause-count encodings stay correct.

This trades host concat time + HBM for tunnel round-trips and per-shape
recompiles — the win case is many small NRT segments. Opt in with
IndexSearcher(reader, combine_segments=True).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from rucene_tpu.codec.device import DeviceSegment
from rucene_tpu.util import next_pow2, round_up


_VIEW_UID = [0]  # monotonic id for DEVICE_PLANE_CACHE keys: id() of a
# freed tensor can be recycled and serve a stale plane; a uid never repeats.


@dataclass
class CombinedView:
    device: DeviceSegment
    doc_bases: np.ndarray  # i64[L] padded doc base per leaf
    blk_bases: np.ndarray  # i64[L] block-table offset per leaf
    field_gid: dict[str, int]  # field name -> global norms row
    n_leaves: int
    blk_max_freq: np.ndarray  # i32[NB] host copy for WAND block-max bounds
    n_blocks: int
    uid: int = 0  # survives dataclasses.replace live-plane swaps
    pos_word_bases: np.ndarray | None = None  # i64[L] positions word offset per leaf
    # host doc-range copies for conjunction pruning (padded-global doc space)
    blk_first_host: np.ndarray | None = None  # i64[NB]
    blk_last_host: np.ndarray | None = None  # i64[NB]
    blk_dbits_host: np.ndarray | None = None  # i32[NB] doc-plane widths (EF detection)

    def map_docs(self, padded_docs: np.ndarray, leaves) -> np.ndarray:
        """Padded-global doc ids -> real reader-global doc ids (monotone,
        so result ordering is preserved)."""
        li = np.searchsorted(self.doc_bases, padded_docs, side="right") - 1
        li = np.clip(li, 0, self.n_leaves - 1)
        local = padded_docs - self.doc_bases[li]
        real_bases = np.asarray([leaf.doc_base for leaf in leaves], dtype=np.int64)
        return real_bases[li] + local


# single-entry structural cache: an NRT refresh that only changed live
# masks (deletes) reuses every concatenated tensor and swaps the one live
# plane instead of rebuilding the whole view (VERDICT weak #9 — combined
# rebuild dominated NRT refresh on large indexes)
_VIEW_CACHE: dict = {}


def cached_combined_view(leaves) -> CombinedView:
    """build_combined_view with reuse across NRT refreshes: same packed
    segments -> same view; same segments + new live masks -> live-plane-only
    swap (one device upload); anything else -> full rebuild."""
    import dataclasses

    import jax.numpy as jnp

    struct_key = tuple(id(lf.packed) for lf in leaves)
    live_key = tuple(id(lf.live) for lf in leaves)
    entry = _VIEW_CACHE.get(struct_key)
    if entry is not None:
        _refs, old_live_key, view = entry
        if old_live_key == live_key:
            return view
        live = np.zeros(view.device.live.shape[0], bool)
        for li, leaf in enumerate(leaves):
            b = int(view.doc_bases[li])
            md = leaf.packed.max_doc
            if leaf.live is None:
                live[b : b + md] = True
            else:
                live[b : b + md] = leaf.live[:md]
        new_view = dataclasses.replace(
            view, device=view.device._replace(live=jnp.asarray(live))
        )
        _VIEW_CACHE[struct_key] = (_refs, live_key, new_view)
        return new_view
    # structural change (an NRT refresh added/merged segments): rebuild
    # with BUCKETED sizes and the PRIOR view's field numbering, so the
    # new view lands in the same executor shape buckets and every
    # compiled program is reused — the rebuild itself is sub-second host
    # concat + upload; the recompiles were the 5.9-QPS pathology
    prev_gid = None
    if _VIEW_CACHE:
        prev = next(iter(_VIEW_CACHE.values()))[2]
        prev_gid = dict(prev.field_gid)
        for leaf in leaves:
            for name in leaf.packed.fields:
                if name not in prev_gid:
                    prev_gid[name] = len(prev_gid)
    import os
    import time as _time

    t0 = _time.time()
    view = build_combined_view(leaves, field_gid=prev_gid, bucket_sizes=True)
    if os.environ.get("RUCENE_VIEW_DEBUG") == "1":
        import sys

        print(
            f"# combined rebuild: {len(leaves)} leaves, "
            f"md={view.device.max_doc_padded} nb={view.n_blocks} "
            f"in {_time.time()-t0:.2f}s",
            file=sys.stderr, flush=True,
        )
    _VIEW_CACHE.clear()  # one live entry bounds memory
    _VIEW_CACHE[struct_key] = ([lf.packed for lf in leaves], live_key, view)
    return view


def combined_blk_fid(leaves, field_gid: dict[str, int]) -> np.ndarray:
    """i32[NB_total] global norms/cache row per concatenated block (leaf
    field ids remapped through field_gid) — the decoded-residency cval
    table's index (codec/device.add_decoded_planes)."""
    from rucene_tpu.codec.device import blk_fid_host

    parts = []
    for leaf in leaves:
        p = leaf.packed
        nf = max((pf.field_id for pf in p.fields.values()), default=-1) + 2
        remap = np.zeros(nf, np.int32)
        for name, pf in p.fields.items():
            remap[pf.field_id] = field_gid[name]
        parts.append(remap[blk_fid_host(p)])
    if not parts:
        return np.zeros(0, np.int32)
    return np.concatenate(parts)


def build_combined_view(
    leaves,
    field_gid: dict[str, int] | None = None,
    as_numpy: bool = False,
    with_positions: bool = False,
    bucket_sizes: bool = False,
) -> CombinedView:
    """Concatenate the leaves' packed segments into one DeviceSegment.

    field_gid pins the global norms-row numbering (so several views — e.g.
    one per mesh shard — share field ids); as_numpy keeps the arrays
    host-side for stacking; with_positions also concatenates the packed
    position streams (needed when phrases run against the view).

    bucket_sizes=True additionally pow2-pads the DOC space (the block and
    word axes are pow2 already), so NRT refreshes that append segments
    keep every executor shape until a bucket doubles — without it each
    refresh changed md_total and paid minutes of axon recompiles
    (exp/logs/bench_nrt_r5.log, 5.9 QPS)."""
    if field_gid is None:
        field_names = sorted({name for leaf in leaves for name in leaf.packed.fields})
        field_gid = {name: i for i, name in enumerate(field_names)}
    n_fields = max(len(field_gid), 1)

    doc_bases = np.zeros(len(leaves), np.int64)
    blk_bases = np.zeros(len(leaves), np.int64)
    pos_word_bases = np.zeros(len(leaves), np.int64)
    data_parts, off_p, dbits_p, fbits_p, base_p, cnt_p, bmf_p = [], [], [], [], [], [], []
    first_p, last_p = [], []
    pos_parts, posb_p = [], []
    word_base = 0
    doc_base = 0
    nb_total = 0
    pos_base = 0
    for li, leaf in enumerate(leaves):
        p = leaf.packed
        doc_bases[li] = doc_base
        blk_bases[li] = nb_total
        pos_word_bases[li] = pos_base
        data_parts.append(p.data)
        off_p.append(p.blk_off.astype(np.int64) + word_base)
        dbits_p.append(p.blk_doc_bits)
        fbits_p.append(p.blk_freq_bits)
        base_p.append(p.blk_base.astype(np.int64) + doc_base)
        cnt_p.append(p.blk_count)
        bmf_p.append(p.blk_max_freq)
        first_p.append(p.blk_first_doc.astype(np.int64) + doc_base)
        last_p.append(p.blk_last_doc.astype(np.int64) + doc_base)
        if with_positions:
            pos_parts.append(p.positions.astype(np.uint32))
            posb_p.append(p.blk_pos_base)
            pos_base += len(p.positions)
        word_base += len(p.data)
        doc_base += round_up(max(p.max_doc, 1), 1024)
        nb_total += p.num_blocks

    md_total = int(doc_base)
    if bucket_sizes:
        md_total = next_pow2(max(md_total, 1), 1024)
    nbp = next_pow2(max(nb_total, 1), 1)
    wp = next_pow2(max(word_base + 2048, 2), 2048)

    data = np.zeros(wp, np.uint32)
    data[:word_base] = np.concatenate(data_parts) if data_parts else []

    def cat_pad(parts, n, fill, dtype):
        out = np.full(n, fill, dtype=dtype)
        if parts:
            v = np.concatenate(parts)
            out[: len(v)] = v
        return out

    norms = np.zeros((n_fields, md_total), np.uint8)
    live = np.zeros(md_total, bool)
    for li, leaf in enumerate(leaves):
        p = leaf.packed
        b = int(doc_bases[li])
        for name in p.fields:
            if name in p.norms:
                norms[field_gid[name], b : b + p.max_doc] = p.norms[name]
        if leaf.live is None:
            live[b : b + p.max_doc] = True
        else:
            live[b : b + p.max_doc] = leaf.live[: p.max_doc]

    if with_positions:
        npp = next_pow2(max(pos_base, 1), 1)
        positions = cat_pad(pos_parts, npp, 0, np.uint32)
        blk_pos_base = cat_pad(posb_p, nbp, 0, np.int32)
    else:
        positions = np.zeros(1, np.uint32)  # phrase path stays per-leaf
        blk_pos_base = np.zeros(nbp, np.int32)

    conv = (lambda x: x) if as_numpy else jnp.asarray
    dev = DeviceSegment(
        data=conv(data),
        blk_off=conv(cat_pad(off_p, nbp, 0, np.int64).astype(np.int32)),
        blk_doc_bits=conv(cat_pad(dbits_p, nbp, 1, np.int32)),
        blk_freq_bits=conv(cat_pad(fbits_p, nbp, 1, np.int32)),
        blk_base=conv(cat_pad(base_p, nbp, -1, np.int64).astype(np.int32)),
        blk_count=conv(cat_pad(cnt_p, nbp, 0, np.int32)),
        blk_max_freq=conv(cat_pad(bmf_p, nbp, 0, np.int32)),
        norms=conv(norms),
        live=conv(live),
        positions=conv(positions),
        blk_pos_base=conv(blk_pos_base),
    )
    bmf_host = cat_pad(bmf_p, nbp, 0, np.int32)
    if not as_numpy and nb_total:
        # decoded residency for the combined view: blocks keep their
        # global blk_base/doc space, so the same one-time decode applies;
        # per-leaf field ids remap to the view's global norms rows
        from rucene_tpu.codec.device import (
            add_decoded_planes,
            blk_fid_host,
            decoded_policy,
        )

        on, fdt = decoded_policy(nb_total, int(bmf_host.max()))
        if on:
            dev = add_decoded_planes(
                dev, nb_total, combined_blk_fid(leaves, field_gid),
                freq_dtype=fdt,
            )
    _VIEW_UID[0] += 1
    return CombinedView(
        uid=_VIEW_UID[0],
        device=dev,
        doc_bases=doc_bases,
        blk_bases=blk_bases,
        field_gid=field_gid,
        n_leaves=len(leaves),
        blk_max_freq=bmf_host,
        n_blocks=nb_total,
        pos_word_bases=pos_word_bases if with_positions else None,
        blk_first_host=cat_pad(first_p, nbp, 0, np.int64),
        blk_last_host=cat_pad(last_p, nbp, -1, np.int64),
        blk_dbits_host=cat_pad(dbits_p, nbp, 1, np.int32),
    )


def build_combined_tables(view: CombinedView, leaves, rqs, b_pad: int, t_pad: int):
    """Per-clause block ranges across ALL leaves: [B, T*L] slot tables
    (clause j, leaf l -> column j*L + l), block ids in global coordinates."""
    length = view.n_leaves
    block_start = np.zeros((b_pad, t_pad * length), np.int32)
    block_count = np.zeros((b_pad, t_pad * length), np.int32)
    field_id = np.zeros((b_pad, t_pad * length), np.int32)
    for i, rq in enumerate(rqs):
        for j, (_occ, c) in enumerate(rq.all_slots()):
            gfid = view.field_gid.get(c.term.field, 0)
            for li, leaf in enumerate(leaves):
                rec = leaf.term_record(c.term.field, c.term.text)
                if rec is not None:
                    col = j * length + li
                    block_start[i, col] = int(view.blk_bases[li]) + rec.block_start
                    block_count[i, col] = rec.block_count
                    field_id[i, col] = gfid
    return block_start, block_count, field_id
