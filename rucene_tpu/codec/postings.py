"""Segment packing: SegmentData -> flat bit-packed block tensors.

The on-device postings layout (decoded by rucene_tpu.ops.decode):

- one flat uint32 ``data`` buffer holds every 128-doc block of every term:
  per block, 4*doc_bits words of delta-packed doc ids followed by
  4*freq_bits words of packed freqs (width chosen per block = adaptive FOR,
  the TPU-shaped analog of the reference's per-block PF/EF/BITSET choice at
  rucene src/core/codec/postings/posting_reader.rs:336-341);
- segment-global block metadata tensors (word offset, widths, base doc id,
  valid count, max freq for future block-max pruning);
- per-field term tables mapping term ordinal -> block range + stats.

Packing is vectorized numpy over the whole segment: one scatter packs every
block at once (128*bits is always a whole number of uint32 words, so blocks
never overlap words).

Positions are stored unpacked (int32 absolute positions in doc order per
term) for now; they only sit on the phrase-verification path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from rucene_tpu.index.field_infos import FieldInfos
from rucene_tpu.index.memory import FieldStats, SegmentData
from rucene_tpu.util.packing import (
    BLOCK_SIZE,
    EF_TAG,
    EF_UNARY_WORDS,
    doc_plane_words_np,
)


def _bits_for(values: np.ndarray) -> np.ndarray:
    """Per-element minimal bit width (>=1) for uint values (vectorized).
    float64 log2 is exact for v < 2^53; inputs here are < 2^31."""
    v = np.maximum(np.asarray(values), 1).astype(np.float64)
    return np.floor(np.log2(v)).astype(np.int32) + np.int32(1)


@dataclass
class PackedField:
    name: str
    field_id: int  # dense id among indexed fields of this segment
    terms: list[str]  # sorted
    term_ord: dict[str, int]
    doc_freq: np.ndarray  # i64[T]
    total_tf: np.ndarray  # i64[T]
    block_start: np.ndarray  # i32[T] into the segment-global block tables
    block_count: np.ndarray  # i32[T]
    pos_start: np.ndarray  # i64[T] global occurrence index of the term's first position
    pos_width: np.ndarray | None = None  # i32[T] bits per packed position delta
    pos_word_start: np.ndarray | None = None  # i64[T] word offset of the term's stream


@dataclass
class PackedSegment:
    max_doc: int
    field_infos: FieldInfos
    fields: dict[str, PackedField]
    stats: dict[str, FieldStats]
    # global block tables, one entry per 128-doc block:
    blk_off: np.ndarray  # i32[NB] word offset of the doc half
    blk_doc_bits: np.ndarray  # i32[NB]
    blk_freq_bits: np.ndarray  # i32[NB]
    blk_base: np.ndarray  # i32[NB] doc id preceding the block (-1 at list head)
    blk_count: np.ndarray  # i32[NB]
    blk_max_freq: np.ndarray  # i32[NB]
    # exact doc-range metadata (host-only): powers conjunction block-range
    # pruning (the skip-list leapfrog analog, skip_reader.rs:118)
    blk_first_doc: np.ndarray  # i32[NB] first doc id in the block
    blk_last_doc: np.ndarray  # i32[NB] last doc id in the block
    blk_pos_base: np.ndarray  # i32[NB] WITHIN-TERM occurrence index of block's first occurrence
    data: np.ndarray  # u32[W]
    # positions: within-doc deltas (first value = absolute position) packed at
    # a fixed per-term width into word-aligned per-term streams
    positions: np.ndarray  # u32[Pw] packed words
    norms: dict[str, np.ndarray]  # field -> u8[max_doc]
    stored: list[dict[str, object]]
    numeric_dv: dict[str, tuple[np.ndarray, np.ndarray]]
    points: dict[str, tuple[np.ndarray, np.ndarray]]  # field -> (sorted vals, docs)
    term_vectors: list | None = None  # per-doc {field: {term: [(pos,start,end)]}}
    binary_dv: dict | None = None
    sorted_dv: dict | None = None
    sorted_numeric_dv: dict | None = None
    sorted_set_dv: dict | None = None
    # postings offsets/payloads: occurrence-aligned with the positions
    # stream (index = PackedField.pos_start[t] + within-term occurrence);
    # -1 / None for occurrences of fields without them (reference
    # posting_writer.rs offsets + payload planes)
    off_starts: np.ndarray | None = None  # i32[n_occ]
    off_ends: np.ndarray | None = None  # i32[n_occ]
    pay: np.ndarray | None = None  # object[n_occ] of bytes | None

    @property
    def num_blocks(self) -> int:
        return len(self.blk_off)

    def index_bytes(self) -> int:
        """Index size across ALL planes (postings, positions + their
        metadata, term dict, norms, stored fields, every DV family, points,
        term vectors, offsets/payloads) so equal-index-bytes comparisons
        (BASELINE.json) are checkable. Stored/TV sizes are measured on the
        serialized (LZ4/deflate) form where available."""
        import sys

        n = self.data.nbytes + self.positions.nbytes
        n += sum(
            a.nbytes
            for a in (
                self.blk_off,
                self.blk_doc_bits,
                self.blk_freq_bits,
                self.blk_base,
                self.blk_count,
                self.blk_max_freq,
                self.blk_first_doc,
                self.blk_last_doc,
                self.blk_pos_base,
            )
        )
        for f in self.fields.values():
            n += sum(len(t) for t in f.terms)
            n += (
                f.doc_freq.nbytes
                + f.total_tf.nbytes
                + f.block_start.nbytes
                + f.block_count.nbytes
                + f.pos_start.nbytes
            )
            if f.pos_width is not None:
                n += f.pos_width.nbytes
            if f.pos_word_start is not None:
                n += f.pos_word_start.nbytes
        n += sum(v.nbytes for v in self.norms.values())
        # stored fields: compressed chunk bytes when the rows are already
        # serialized; else a JSON-size estimate of the raw rows
        if self.stored:
            import json

            try:
                n += sum(
                    len(json.dumps(row, default=str)) for row in self.stored
                )
            except (TypeError, ValueError):
                n += sum(sys.getsizeof(row) for row in self.stored)
        for fam in (self.numeric_dv, self.sorted_numeric_dv):
            for v in (fam or {}).values():
                n += sum(a.nbytes for a in v if hasattr(a, "nbytes"))
        for v in (self.binary_dv or {}).values():
            vals = v[0] if isinstance(v, tuple) else v
            n += sum(len(x) for x in vals if x is not None) if not hasattr(vals, "nbytes") else vals.nbytes
            if isinstance(v, tuple):
                n += sum(a.nbytes for a in v[1:] if hasattr(a, "nbytes"))
        for fam in (self.sorted_dv, self.sorted_set_dv):
            for v in (fam or {}).values():
                if isinstance(v, tuple):
                    for part in v:
                        if hasattr(part, "nbytes"):
                            n += part.nbytes
                        elif isinstance(part, (list, tuple)):
                            n += sum(
                                len(x) if isinstance(x, (bytes, str)) else 8
                                for x in part
                            )
        for vals, docs in (self.points or {}).values():
            n += getattr(vals, "nbytes", 0) + getattr(docs, "nbytes", 0)
        if self.term_vectors:
            n += sum(sys.getsizeof(tv) for tv in self.term_vectors if tv)
        for a in (self.off_starts, self.off_ends):
            if a is not None:
                n += a.nbytes
        if self.pay is not None:
            n += sum(len(x) for x in self.pay if x is not None)
        return n


def pack_segment(seg: SegmentData) -> PackedSegment:
    """Pack all postings of a segment into the flat block format."""
    import os as _os, time as _time
    _dbg = _os.environ.get("RUCENE_PACK_DEBUG") == "1"
    _t = [_time.time()]
    def _mark(name):
        if _dbg:
            now = _time.time()
            print(f"  pack[{name}]: {now - _t[0]:.2f}s", flush=True)
            _t[0] = now
    field_names = [name for name in sorted(seg.terms, key=lambda n: seg.field_infos.by_name[n].number)]

    # --- flatten all postings across fields/terms in global term order ---
    docs_parts: list[np.ndarray] = []
    freqs_parts: list[np.ndarray] = []
    pos_parts: list[np.ndarray] = []
    df_list: list[int] = []  # per global term
    fields: dict[str, PackedField] = {}
    term_field_order: list[tuple[str, list[str]]] = []

    any_off = bool(seg.offsets)
    any_pay = bool(seg.payloads)
    start_parts: list[np.ndarray] = []
    end_parts: list[np.ndarray] = []
    pay_parts: list[list] = []

    for fid, name in enumerate(field_names):
        tmap = seg.terms[name]
        terms_sorted = sorted(tmap)
        term_field_order.append((name, terms_sorted))
        foff = (seg.offsets or {}).get(name)
        fpay = (seg.payloads or {}).get(name)
        for t in terms_sorted:
            d, f, p = tmap[t]
            docs_parts.append(d)
            freqs_parts.append(f)
            pos_parts.append(p)
            df_list.append(len(d))
            if any_off:
                e = foff.get(t) if foff else None
                if e is not None and len(e[0]) == len(p):
                    start_parts.append(np.asarray(e[0], np.int32))
                    end_parts.append(np.asarray(e[1], np.int32))
                else:
                    start_parts.append(np.full(len(p), -1, np.int32))
                    end_parts.append(np.full(len(p), -1, np.int32))
            if any_pay:
                e = fpay.get(t) if fpay else None
                pay_parts.append(
                    list(e) if e is not None and len(e) == len(p) else [None] * len(p)
                )

    _mark("flatten")
    if df_list:
        # per-posting arrays are int32: doc ids, freqs and positions are
        # < 2^31 and the fresh-page cost of this pipeline dominates cold
        # indexing (CLAUDE.md memory gotcha) — halving bytes halves it
        docs = np.concatenate(docs_parts)
        docs = docs.astype(np.int32) if docs.dtype != np.int32 else docs
        freqs = np.concatenate(freqs_parts)
        freqs = freqs.astype(np.int32) if freqs.dtype != np.int32 else freqs
        positions = (
            np.concatenate(pos_parts) if pos_parts else np.zeros(0, np.int32)
        )
        if positions.dtype != np.int32:
            positions = positions.astype(np.int32)
        df = np.asarray(df_list, dtype=np.int64)
    else:
        docs = np.zeros(0, np.int64)
        freqs = np.zeros(0, np.int64)
        positions = np.zeros(0, np.int64)
        df = np.zeros(0, np.int64)

    n_post = len(docs)
    if n_post >= 2**31 or (len(freqs) and int(freqs.sum(dtype=np.int64)) >= 2**31):
        raise ValueError("segment exceeds 2^31 postings/occurrences")
    term_start = np.concatenate([[0], np.cumsum(df)])  # [T+1]
    tf_per_term = np.add.reduceat(freqs, term_start[:-1].astype(np.int64)) if n_post else np.zeros(0, np.int64)
    tf_per_term = np.where(df > 0, tf_per_term, 0) if len(df) else tf_per_term
    pos_start_per_term = np.concatenate([[0], np.cumsum(tf_per_term)])[:-1] if len(df) else np.zeros(0, np.int64)

    # --- per-posting indexing: which term, which block, which lane ---
    if n_post:
        _mark("concat+stats")
        term_of_post = np.repeat(np.arange(len(df), dtype=np.int32), df)
        idx_in_term = (
            np.arange(n_post, dtype=np.int32)
            - term_start[term_of_post].astype(np.int32)
        )
        blk_in_term = idx_in_term // BLOCK_SIZE
        lane = idx_in_term % BLOCK_SIZE
        blocks_per_term = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
        term_blk_start = np.concatenate([[0], np.cumsum(blocks_per_term)])
        gblk = term_blk_start[term_of_post].astype(np.int32) + blk_in_term
        nb_total = int(term_blk_start[-1])

        # deltas: doc[i] - doc[i-1] within a term; first of term = doc + 1
        _mark("post-index")
        prev = np.empty(n_post, dtype=np.int32)
        prev[1:] = docs[:-1]
        prev[0] = -1
        at_term_start = idx_in_term == 0
        prev[at_term_start] = -1
        deltas = docs - prev
        if np.any(deltas <= 0):
            raise ValueError("doc ids must be strictly increasing within a term")

        # block value matrices [NB, 128], padded with zeros
        # int64 throughout the pack: numpy's uint64 inner loops hit a
        # ~40x-slower non-SIMD path for broadcast shifts/ors; every packed
        # value is < 2^32 so signed arithmetic is exact and >> == logical
        _mark("deltas")
        dvals = np.zeros((nb_total, BLOCK_SIZE), dtype=np.int32)
        fvals = np.zeros((nb_total, BLOCK_SIZE), dtype=np.int32)
        dvals[gblk, lane] = deltas
        fvals[gblk, lane] = freqs

        _mark("block-matrices")
        blk_doc_bits = _bits_for(dvals.max(axis=1))
        blk_freq_bits = _bits_for(fvals.max(axis=1))
        blk_max_freq = fvals.max(axis=1).astype(np.int32)

        # block base = doc preceding the block (-1 at list head)
        first_lane = lane == 0
        blk_base = np.empty(nb_total, dtype=np.int64)
        blk_base[gblk[first_lane]] = prev[first_lane]
        # block count = valid docs in block
        blk_count = np.zeros(nb_total, dtype=np.int64)
        np.add.at(blk_count, gblk, 1)
        # exact per-block doc range: fancy assignment keeps the LAST write
        # per duplicate index (C-order), so blk_last lands on each block's
        # final posting; firsts use the first-lane mask
        blk_first_doc = np.zeros(nb_total, dtype=np.int64)
        blk_first_doc[gblk[first_lane]] = docs[first_lane]
        blk_last_doc = np.zeros(nb_total, dtype=np.int64)
        blk_last_doc[gblk] = docs

        # within-term occurrence offset of each block's first posting
        cumfreq_excl = np.concatenate(
            [[0], np.cumsum(freqs, dtype=np.int32)]
        )[:-1]
        blk_pos_base = np.zeros(nb_total, dtype=np.int64)
        blk_pos_base[gblk[first_lane]] = (
            cumfreq_excl[first_lane] - pos_start_per_term[term_of_post[first_lane]]
        )

        # norm byte per posting, inlined into the block so scoring never
        # random-gathers the [F, max_doc] norms plane (the gather was ~15%
        # of device time at the 50K/256q shape — docs/ROADMAP.md budget)
        nvals = np.zeros((nb_total, BLOCK_SIZE), dtype=np.int32)
        gt = 0
        for name, terms_sorted in term_field_order:
            t0, t1 = gt, gt + len(terms_sorted)
            gt = t1
            narr = seg.norms.get(name)
            if narr is None or t1 == t0:
                continue
            s0, e0 = int(term_start[t0]), int(term_start[t1])
            if e0 > s0:
                nvals[gblk[s0:e0], lane[s0:e0]] = narr[docs[s0:e0]]

        # --- adaptive doc-plane encoding (reference PF/EF/BITSET choice,
        # posting_reader.rs:336-341): full blocks whose Elias-Fano size
        # 4*l + EF_UNARY_WORDS beats FOR's 4*doc_bits words switch to EF.
        # l is picked so the block's doc span U = last-base shifts below
        # 256, keeping the unary plane at a fixed 384 bits; l == 0 is the
        # dense/bitmap (BITSET) regime.
        _mark("block-meta")
        blk_span = (blk_last_doc - blk_base).astype(np.int64)  # U >= count
        ef_l = np.maximum(_bits_for(np.maximum(blk_span, 1)) - 8, 0).astype(np.int64)
        use_ef = (blk_count == BLOCK_SIZE) & (
            4 * ef_l + EF_UNARY_WORDS < 4 * blk_doc_bits.astype(np.int64)
        )
        import os

        if os.environ.get("RUCENE_NO_EF") == "1":  # FOR-only (A/B + debug)
            use_ef[:] = False
        blk_doc_bits = np.where(use_ef, EF_TAG + ef_l, blk_doc_bits).astype(np.int32)

        # word layout: [doc plane | freq words | ceil(count/4) norm words]
        # per block. Tail blocks store only the bytes they have; decode
        # always reads 128 lanes but masks the invalid ones, so lanes past
        # the stored bytes harmlessly read the next block's words.
        norm_words = (blk_count * 8 + 31) // 32
        dplane_words = doc_plane_words_np(blk_doc_bits).astype(np.int64)
        words_per_blk = dplane_words + 4 * blk_freq_bits.astype(np.int64) + norm_words
        blk_off = np.concatenate([[0], np.cumsum(words_per_blk)])
        total_words = int(blk_off[-1])
        blk_off = blk_off[:-1]

        _mark("layout")
        out = np.zeros(total_words + 1, dtype=np.int64)  # +1 pad word
        for_sel = np.flatnonzero(~use_ef)
        _scatter_pack(out, dvals[for_sel], blk_doc_bits[for_sel], blk_off[for_sel])
        ef_sel = np.flatnonzero(use_ef)
        if len(ef_sel):
            # cumulative offsets v = doc - base per lane of each EF block
            ef_v = np.cumsum(dvals[ef_sel], axis=1)
            lsel = ef_l[ef_sel]
            low = ef_v & ((np.int64(1) << lsel[:, None]) - 1)
            _scatter_pack(out, low, lsel.astype(np.int32), blk_off[ef_sel])
            # unary plane: set bit lane + (v >> l) at word blk_off + 4*l
            lane64 = np.arange(BLOCK_SIZE, dtype=np.int64)[None, :]
            bitpos = lane64 + (ef_v >> lsel[:, None])  # [E,128] < 384
            uword = (blk_off[ef_sel] + 4 * lsel)[:, None] + (bitpos >> 5)
            np.bitwise_or.at(out, uword, np.int64(1) << (bitpos & 31))
        _mark("doc-plane")
        _scatter_pack(out, fvals, blk_freq_bits, blk_off + dplane_words)
        _mark("freq-plane")
        _scatter_pack(
            out,
            nvals,
            np.full(nb_total, 8, np.int32),
            blk_off + dplane_words + 4 * blk_freq_bits.astype(np.int64),
            n_words=norm_words,
        )
        _mark("norm-plane")
        data = out.astype(np.uint32)

        # --- positions: within-doc deltas at fixed per-term width ---
        n_occ = len(positions)
        pos_width = np.ones(len(df), np.int32)
        if n_occ:
            _mark("pos-setup0")
            occ_term = np.repeat(np.arange(len(df), dtype=np.int32), tf_per_term)
            run_first = np.zeros(n_occ, dtype=bool)
            run_first[cumfreq_excl] = True
            prev_pos = np.empty(n_occ, dtype=np.int32)
            prev_pos[1:] = positions[:-1]
            prev_pos[0] = 0
            pdelta = np.where(run_first, positions, positions - prev_pos)
            if np.any(pdelta < 0):
                raise ValueError("positions must be non-decreasing within a doc")
            _mark("pos-deltas")
            np.maximum.at(pos_width, occ_term, _bits_for(pdelta))
            _mark("pos-maxat")
            words_per_term = (tf_per_term * pos_width + 31) // 32
            pos_word_start_all = np.concatenate([[0], np.cumsum(words_per_term)])
            pos_out = np.zeros(int(pos_word_start_all[-1]) + 1, dtype=np.int64)
            _mark("pos-layout")
            within_occ = (
                np.arange(n_occ, dtype=np.int32)
                - pos_start_per_term[occ_term].astype(np.int32)
            )
            for wbits in np.unique(pos_width[np.unique(occ_term)]):
                selo = np.flatnonzero(pos_width[occ_term] == wbits)
                bitpos = within_occ[selo] * int(wbits)
                widx = pos_word_start_all[occ_term[selo]] + (bitpos >> 5)
                shift = (bitpos & 31).astype(np.int64)
                v = pdelta[selo].astype(np.int64)
                np.bitwise_or.at(pos_out, widx, (v << shift) & 0xFFFFFFFF)
                # shift==0 -> v >> 32 == 0 since v < 2^32
                np.bitwise_or.at(pos_out, widx + 1, v >> (32 - shift))
            pos_data = pos_out.astype(np.uint32)
            _mark("positions")
        else:
            pos_word_start_all = np.zeros(len(df) + 1, np.int64)
            pos_data = np.zeros(1, np.uint32)
    else:
        nb_total = 0
        blk_doc_bits = np.zeros(0, np.int32)
        blk_freq_bits = np.zeros(0, np.int32)
        blk_max_freq = np.zeros(0, np.int32)
        blk_base = np.zeros(0, np.int64)
        blk_count = np.zeros(0, np.int64)
        blk_first_doc = np.zeros(0, np.int64)
        blk_last_doc = np.zeros(0, np.int64)
        blk_pos_base = np.zeros(0, np.int64)
        blk_off = np.zeros(0, np.int64)
        term_blk_start = np.zeros(1, np.int64)
        blocks_per_term = np.zeros(0, np.int64)
        data = np.zeros(1, dtype=np.uint32)
        pos_width = np.ones(0, np.int32)
        pos_word_start_all = np.zeros(1, np.int64)
        pos_data = np.zeros(1, np.uint32)

    _mark("pre-tables")
    # --- per-field term tables ---
    gterm = 0
    for fid, (name, terms_sorted) in enumerate(term_field_order):
        t0, t1 = gterm, gterm + len(terms_sorted)
        fields[name] = PackedField(
            name=name,
            field_id=fid,
            terms=terms_sorted,
            term_ord={t: i for i, t in enumerate(terms_sorted)},
            doc_freq=df[t0:t1].copy(),
            total_tf=tf_per_term[t0:t1].copy() if len(df) else np.zeros(0, np.int64),
            block_start=term_blk_start[t0:t1].astype(np.int32),
            block_count=blocks_per_term[t0:t1].astype(np.int32) if nb_total else np.zeros(t1 - t0, np.int32),
            pos_start=pos_start_per_term[t0:t1].copy() if len(df) else np.zeros(0, np.int64),
            pos_width=pos_width[t0:t1].copy(),
            pos_word_start=pos_word_start_all[t0:t1].copy(),
        )
        gterm = t1

    return PackedSegment(
        max_doc=seg.max_doc,
        field_infos=seg.field_infos,
        fields=fields,
        stats=seg.stats,
        blk_off=blk_off.astype(np.int32),
        blk_doc_bits=blk_doc_bits.astype(np.int32),
        blk_freq_bits=blk_freq_bits.astype(np.int32),
        blk_base=blk_base.astype(np.int32),
        blk_count=blk_count.astype(np.int32),
        blk_max_freq=blk_max_freq,
        blk_first_doc=blk_first_doc.astype(np.int32),
        blk_last_doc=blk_last_doc.astype(np.int32),
        blk_pos_base=blk_pos_base.astype(np.int32),
        data=data,
        positions=pos_data,
        norms=dict(seg.norms),
        stored=seg.stored,
        numeric_dv=seg.numeric_dv,
        points=dict(getattr(seg, "points", {}) or {}),
        term_vectors=getattr(seg, "term_vectors", None),
        binary_dv=getattr(seg, "binary_dv", None),
        sorted_dv=getattr(seg, "sorted_dv", None),
        sorted_numeric_dv=getattr(seg, "sorted_numeric_dv", None),
        sorted_set_dv=getattr(seg, "sorted_set_dv", None),
        off_starts=(np.concatenate(start_parts).astype(np.int32) if any_off and start_parts else (np.zeros(0, np.int32) if any_off else None)),
        off_ends=(np.concatenate(end_parts).astype(np.int32) if any_off and end_parts else (np.zeros(0, np.int32) if any_off else None)),
        pay=(np.array([p for part in pay_parts for p in part], dtype=object) if any_pay else None),
    )


def _scatter_pack(
    out: np.ndarray,
    vals: np.ndarray,
    bits: np.ndarray,
    word_off: np.ndarray,
    n_words: np.ndarray | None = None,
) -> None:
    """Pack vals[NB,128] at per-row widths into ``out`` (int64 carrying
    32-bit words; values nonnegative < 2^32 — int64 because numpy's uint64
    shift/or inner loops are ~40x slower).

    Blocks are grouped by bit width; within a group the lane->word mapping
    is fixed, so each of the 4*bits output words is an OR over a small fixed
    set of shifted lanes — vectorized across the group (the unbuffered
    np.bitwise_or.at scatter this replaces was ~10x slower). Blocks own
    disjoint word ranges, so the final store is a plain fancy assignment —
    when a row owns FEWER than 4*bits words (variable-size planes, e.g. the
    trimmed norm plane), pass n_words so the store never spills into the
    next block's range.
    """
    nb = vals.shape[0]
    if nb == 0:
        return
    lane = np.arange(BLOCK_SIZE, dtype=np.int64)
    for b in np.unique(bits):
        b = int(b)
        sel = np.flatnonzero(bits == b)
        v = np.ascontiguousarray(vals[sel], dtype=np.int64)  # [G,128]
        nwords = 4 * b
        packed = np.zeros((len(sel), nwords), dtype=np.int64)
        bitpos = lane * b
        widx = bitpos >> 5
        shift = bitpos & 31
        for w in range(nwords):
            lo_lanes = np.flatnonzero(widx == w)
            for i in lo_lanes:
                packed[:, w] |= (v[:, i] << int(shift[i])) & 0xFFFFFFFF
            hi_lanes = np.flatnonzero((widx + 1 == w) & (shift > 0))
            for i in hi_lanes:
                packed[:, w] |= v[:, i] >> (32 - int(shift[i]))
        if n_words is None:
            dest = word_off[sel, None] + np.arange(nwords)[None, :]
            out[dest] = packed
        else:
            nw_sel = n_words[sel]
            for nw in np.unique(nw_sel):
                nw = int(nw)
                rows = np.flatnonzero(nw_sel == nw)
                dest = word_off[sel[rows], None] + np.arange(nw)[None, :]
                out[dest] = packed[rows][:, :nw]
