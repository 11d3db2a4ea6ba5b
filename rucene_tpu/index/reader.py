"""Read-side: SegmentSnapshot (LeafReader analog) and IndexReader (composite).

reference: rucene src/core/index/reader/segment_reader.rs:522 (SegmentReader),
directory_reader.rs:62 (StandardDirectoryReader), leaf_reader.rs:62.

A snapshot is immutable: NRT refresh and deletes produce NEW snapshots that
share device postings tensors and swap only the live mask (the functional
analog of per-generation .liv files).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from rucene_tpu.codec.device import DeviceSegment, build_device_segment, with_live
from rucene_tpu.codec.postings import PackedSegment
from rucene_tpu.search.similarity import CollectionStats
from rucene_tpu.util.packing import (
    EF_TAG,
    EF_UNARY_WORDS,
    decode_ef_doc_plane,
    unpack_block,
)


def _decode_positions(
    pos_data: np.ndarray, word_start: int, width: int, total: int, freqs: np.ndarray
) -> np.ndarray:
    """Unpack a term's fixed-width position deltas and restore absolute
    positions per doc run (delta[0] of a run is already absolute)."""
    if total == 0:
        return np.zeros(0, np.int64)
    nwords = (total * width + 31) // 32 + 1
    words = pos_data[word_start : word_start + nwords].astype(np.uint64)
    deltas = unpack_block(words, width, n=total).astype(np.int64)
    c = np.cumsum(deltas)
    run_start = np.concatenate([[0], np.cumsum(freqs)])[:-1].astype(np.int64)
    base = c[run_start] - deltas[run_start]  # cumsum before each run
    return c - np.repeat(base, freqs)


@dataclass(frozen=True)
class TermRecord:
    ord: int
    doc_freq: int
    total_tf: int
    block_start: int
    block_count: int
    pos_start: int  # global occurrence index of the term's first position
    pos_width: int = 32  # packed position-delta bit width
    pos_word_start: int = 0  # word offset of the term's position stream


class SegmentSnapshot:
    """One immutable segment view: host metadata + device tensors."""

    def __init__(
        self,
        name: str,
        packed: PackedSegment,
        device: DeviceSegment | None = None,
        live: np.ndarray | None = None,
    ):
        self.name = name
        self.packed = packed
        self.live = live  # None => all live
        self._device = device  # uploaded to HBM lazily on first search
        self.doc_base = 0  # assigned by IndexReader
        # numeric/binary DV updates overlaying the segment's base columns
        # (reference doc_values_update.rs — update by term without reindex)
        self.dv_updates: dict[str, dict[int, int]] = {}
        self.bdv_updates: dict[str, dict[int, bytes]] = {}
        # hot-term tf-plane slots {term block_start -> plane row}; filled
        # when the device segment is built (codec/device.add_tf_planes)
        self.plane_slots: dict[int, int] = {}

    @property
    def device(self) -> DeviceSegment:
        """Device tensors, built on first access so host-only consumers
        (CheckIndex, merges, commits) never touch the accelerator."""
        if self._device is None:
            import os

            # SMALL segments (NRT flush/young merges) share ONE set of
            # floored shapes: without floors, every fresh segment's block/
            # word/doc counts straddle different pow2 buckets and the
            # first batch that touches it pays 1-5 min of axon compiles
            # per new executor shape (exp/logs/bench_nrt_r5f/g.log —
            # 26-134 s batches). ~tens of MB of padding per small segment
            # buys shape-identical serving; RUCENE_SEG_FLOORS=0 disables.
            floors = {}
            if (
                self.packed.max_doc <= (1 << 15)
                and os.environ.get("RUCENE_SEG_FLOORS", "1") != "0"
            ):
                floors = dict(
                    min_blocks=1 << 15, min_words=1 << 19,
                    min_max_doc=1 << 15, min_positions=1 << 18,
                )
            dev = build_device_segment(self.packed, self.live, **floors)
            from rucene_tpu.codec.device import (
                add_decoded_planes,
                add_tf_planes,
                blk_fid_host,
                decoded_policy,
            )

            mf = int(self.packed.blk_max_freq.max()) if self.packed.num_blocks else 0
            on, fdt = decoded_policy(self.packed.num_blocks, mf)
            # floored (small/NRT) segments serve from the PACKED form by
            # default: decoded residency would upload 15-50 MB per fresh
            # segment over the ~7 MB/s tunnel (58 s first-batch stall,
            # exp/logs/bench_nrt_r5h.log) for data the packed executor
            # reads in-place at ~3 MB. An explicit RUCENE_DECODED=1 still
            # wins (tests pin the decoded machinery on tiny corpora) —
            # the decoded planes then pad to the floored block bucket.
            forced = os.environ.get("RUCENE_DECODED") == "1"
            if on and self.packed.num_blocks and (not floors or forced):
                n_dec = self.packed.num_blocks
                bf = blk_fid_host(self.packed)
                if floors:
                    n_dec = max(n_dec, floors["min_blocks"])
                    if len(bf) < n_dec:
                        bf = np.pad(bf, (0, n_dec - len(bf)))
                dev = add_decoded_planes(dev, n_dec, bf, freq_dtype=fdt)
                dev, self.plane_slots = add_tf_planes(dev, self.packed)
            self._device = dev
        return self._device

    @property
    def max_doc(self) -> int:
        return self.packed.max_doc

    @property
    def del_count(self) -> int:
        return 0 if self.live is None else int(self.max_doc - self.live.sum())

    @property
    def num_docs(self) -> int:
        return self.max_doc - self.del_count

    def with_deletes(self, live: np.ndarray) -> "SegmentSnapshot":
        """New snapshot sharing postings tensors with an updated live mask."""
        snap = SegmentSnapshot.__new__(SegmentSnapshot)
        snap.name = self.name
        snap.packed = self.packed
        snap.live = live.copy()
        # share postings tensors if already uploaded; stay lazy otherwise
        snap._device = with_live(self._device, live) if self._device is not None else None
        snap.doc_base = 0
        snap.dv_updates = {f: dict(m) for f, m in self.dv_updates.items()}
        snap.bdv_updates = {f: dict(m) for f, m in self.bdv_updates.items()}
        snap.plane_slots = self.plane_slots  # postings-derived: share
        return snap

    def with_dv_updates(self, field: str, by_doc: dict[int, int]) -> "SegmentSnapshot":
        """New snapshot with numeric doc-values overridden for some docs."""
        snap = self._clone_for_updates()
        snap.dv_updates.setdefault(field, {}).update(by_doc)
        return snap

    def with_binary_dv_updates(
        self, field: str, by_doc: dict[int, bytes]
    ) -> "SegmentSnapshot":
        """New snapshot with binary doc-values overridden for some docs
        (reference doc_values_update.rs BinaryDocValuesUpdate)."""
        snap = self._clone_for_updates()
        snap.bdv_updates.setdefault(field, {}).update(by_doc)
        return snap

    def _clone_for_updates(self) -> "SegmentSnapshot":
        snap = SegmentSnapshot.__new__(SegmentSnapshot)
        snap.name = self.name
        snap.packed = self.packed
        snap.live = None if self.live is None else self.live
        snap._device = self._device
        snap.doc_base = 0
        snap.dv_updates = {f: dict(m) for f, m in self.dv_updates.items()}
        snap.bdv_updates = {f: dict(m) for f, m in self.bdv_updates.items()}
        snap.plane_slots = self.plane_slots
        return snap

    # --- term dictionary ---
    def term_record(self, field: str, text: str) -> TermRecord | None:
        pf = self.packed.fields.get(field)
        if pf is None:
            return None
        ord_ = pf.term_ord.get(text)
        if ord_ is None:
            return None
        return TermRecord(
            ord=ord_,
            doc_freq=int(pf.doc_freq[ord_]),
            total_tf=int(pf.total_tf[ord_]),
            block_start=int(pf.block_start[ord_]),
            block_count=int(pf.block_count[ord_]),
            pos_start=int(pf.pos_start[ord_]),
            pos_width=int(pf.pos_width[ord_]) if pf.pos_width is not None else 32,
            pos_word_start=int(pf.pos_word_start[ord_]) if pf.pos_word_start is not None else 0,
        )

    def terms_iterator(self, field: str) -> "TermsIterator | None":
        """Ordered term enumeration with seek (reference TermIterator:
        blocktree SegmentTermIterator, blocktree_reader.rs:907 — seek_exact
        :1364 / seek_ceil / next over the sorted term space)."""
        pf = self.packed.fields.get(field)
        if pf is None:
            return None
        return TermsIterator(self, field, pf)

    def prefix_terms(self, field: str, prefix: str) -> list[str]:
        """All terms starting with `prefix`, in order (the blocktree FST's
        prefix-seek job on the sorted term list — a bisect range)."""
        import bisect

        pf = self.packed.fields.get(field)
        if pf is None:
            return []
        lo = bisect.bisect_left(pf.terms, prefix)
        hi = lo
        while hi < len(pf.terms) and pf.terms[hi].startswith(prefix):
            hi += 1
        return pf.terms[lo:hi]

    def prefix_docs(self, field: str, prefix: str) -> np.ndarray:
        """Union of doc ids over all terms with `prefix` (PrefixQuery's
        constant-score doc set; cached as a device filter plane)."""
        parts = [
            p[0]
            for t in self.prefix_terms(field, prefix)
            if (p := self.read_postings(field, t)) is not None
        ]
        if not parts:
            return np.zeros(0, np.int64)
        return np.unique(np.concatenate(parts)).astype(np.int64)

    def field_stats(self, field: str) -> CollectionStats | None:
        st = self.packed.stats.get(field)
        if st is None:
            return None
        return CollectionStats(
            field=field,
            max_doc=self.max_doc,
            doc_count=st.doc_count,
            sum_total_term_freq=st.sum_total_term_freq,
        )

    # --- host-side postings decode (merge / phrase verification path) ---
    def read_postings(
        self,
        field: str,
        text: str,
        with_positions: bool = False,
        with_offsets: bool = False,
        with_payloads: bool = False,
    ):
        """Host postings iterator (reference PostingIterator grades,
        posting_reader.rs): (docs, freqs[, positions]) — plus occurrence-
        aligned (starts, ends) and payload list when requested (fields
        indexed with IndexOptions ..._AND_OFFSETS / pre-analyzed tokens).
        Slice occurrence k of doc i at positions[cumfreq[i] + k]."""
        if (with_positions or with_offsets or with_payloads) and getattr(
            self.packed, "is_split_view", False
        ):
            # split sub-views share whole position streams via blk_pos_base
            # (device pipelines fine) but a leading partial block breaks the
            # pos_start occurrence alignment this host accessor assumes
            raise ValueError(
                "occurrence-aligned postings are unavailable on a doc-range "
                "split view (codec/split.py); use the original segment"
            )
        rec = self.term_record(field, text)
        if rec is None:
            return None
        p = self.packed
        docs = np.empty(rec.doc_freq, dtype=np.int64)
        freqs = np.empty(rec.doc_freq, dtype=np.int64)
        out = 0
        for bi in range(rec.block_start, rec.block_start + rec.block_count):
            cnt = int(p.blk_count[bi])
            off = int(p.blk_off[bi])
            dbits = int(p.blk_doc_bits[bi])
            fbits = int(p.blk_freq_bits[bi])
            if dbits >= EF_TAG:
                dwlen = 4 * (dbits - EF_TAG) + EF_UNARY_WORDS
                v = decode_ef_doc_plane(p.data[off : off + dwlen], dbits - EF_TAG)
                docs[out : out + cnt] = int(p.blk_base[bi]) + v[:cnt]
            else:
                dwlen = 4 * dbits
                dwords = p.data[off : off + dwlen].astype(np.uint64)
                deltas = unpack_block(dwords, dbits)[:cnt].astype(np.int64)
                docs[out : out + cnt] = int(p.blk_base[bi]) + np.cumsum(deltas)
            fwords = p.data[off + dwlen : off + dwlen + 4 * fbits].astype(np.uint64)
            freqs[out : out + cnt] = unpack_block(fwords, fbits)[:cnt]
            out += cnt
        positions = None
        if with_positions or with_offsets or with_payloads:
            total = int(freqs.sum())
            positions = _decode_positions(
                p.positions, rec.pos_word_start, rec.pos_width, total, freqs
            )
        if not (with_offsets or with_payloads):
            return docs, freqs, positions
        # occurrence-parallel planes: the term's slice starts at its global
        # occurrence index (PackedField.pos_start)
        total = int(freqs.sum())
        a = int(rec.pos_start)
        offsets = None
        if with_offsets and p.off_starts is not None:
            offsets = (p.off_starts[a : a + total], p.off_ends[a : a + total])
        payloads = None
        if with_payloads and p.pay is not None:
            payloads = list(p.pay[a : a + total])
        return docs, freqs, positions, offsets, payloads

    def document(self, local_doc: int) -> dict[str, object]:
        return self.packed.stored[local_doc]

    def exists_mask(self, field: str) -> np.ndarray:
        """bool[max_doc]: docs that HAVE the field via norms, any DV
        family, points, or postings (reference exists_query.rs:30)."""
        md = self.max_doc
        m = np.zeros(md, dtype=bool)
        norms = self.packed.norms.get(field)
        if norms is not None:
            m |= norms[:md] > 0
        dv = self.numeric_doc_values(field)
        if dv is not None:
            m |= dv[1][:md]
        bdv = self.binary_doc_values(field)
        if bdv is not None:
            m |= np.array([v is not None for v in bdv[:md]], bool)
        sdv = self.sorted_doc_values(field)
        if sdv is not None:
            m |= sdv[1][:md] >= 0
        sndv = self.sorted_numeric_doc_values(field)
        if sndv is not None:
            m |= np.diff(sndv[1][: md + 1]) > 0
        ssdv = self.sorted_set_doc_values(field)
        if ssdv is not None:
            m |= np.diff(ssdv[2][: md + 1]) > 0
        pt = self.packed.points.get(field)
        if pt is not None:
            m[pt[1]] = True
        pf = self.packed.fields.get(field)
        if pf is not None and field not in self.packed.norms:
            # untokenized/omit-norms indexed fields: walk postings
            for t in pf.terms:
                m[self.read_postings(field, t)[0]] = True
        return m

    def point_range_docs(self, field: str, lower: int | None, upper: int | None) -> np.ndarray:
        """Docs whose 1-D point value lies in [lower, upper] (inclusive,
        None = open end). The sorted point column makes this two binary
        searches + a slice — the 1-D specialization of the reference's BKD
        intersect (bkd_reader.rs:68)."""
        pt = self.packed.points.get(field)
        if pt is None:
            return np.zeros(0, dtype=np.int64)
        vals, docs = pt
        if vals.ndim == 2:  # multi-dim: BKD leaf-box intersect (bkd_reader.rs:68)
            from rucene_tpu.util.bkd import bkd_range_docs, tree_from_leaf_ordered

            cache = getattr(self, "_bkd_cache", None)
            if cache is None:
                cache = {}
                self._bkd_cache = cache
            tree = cache.get(field)
            if tree is None:
                tree = tree_from_leaf_ordered(vals, docs)
                cache[field] = tree
            return bkd_range_docs(tree, lower, upper)
        lo = 0 if lower is None else int(np.searchsorted(vals, lower, side="left"))
        hi = len(vals) if upper is None else int(np.searchsorted(vals, upper, side="right"))
        return np.unique(docs[lo:hi]).astype(np.int64)

    def numeric_doc_values(self, field: str) -> tuple[np.ndarray, np.ndarray] | None:
        """(values i64[max_doc], present bool[max_doc]) or None, with any
        in-place numeric updates applied (doc_values_update.rs analog)."""
        base = self.packed.numeric_dv.get(field)
        over = self.dv_updates.get(field)
        if not over:
            return base
        if base is None:
            vals = np.zeros(self.max_doc, np.int64)
            present = np.zeros(self.max_doc, bool)
        else:
            vals, present = base[0].copy(), base[1].copy()
        docs = np.fromiter(over.keys(), dtype=np.int64, count=len(over))
        vv = np.fromiter(over.values(), dtype=np.int64, count=len(over))
        vals[docs] = vv
        present[docs] = True
        return vals, present

    def binary_doc_values(self, field: str) -> list | None:
        """Per-doc bytes or None (reference Lucene54 binary DV), with any
        in-place binary updates applied (doc_values_update.rs analog)."""
        base = (self.packed.binary_dv or {}).get(field)
        over = self.bdv_updates.get(field)
        if not over:
            return base
        out = list(base) if base is not None else [None] * self.max_doc
        for d, v in over.items():
            out[d] = v
        return out

    def sorted_doc_values(self, field: str):
        """(values sorted list[str], ords i32[max_doc] with -1 missing)."""
        return (self.packed.sorted_dv or {}).get(field)

    def sorted_numeric_doc_values(self, field: str):
        """(flat sorted values i64, offsets i64[max_doc+1])."""
        return (self.packed.sorted_numeric_dv or {}).get(field)

    def sorted_set_doc_values(self, field: str):
        """(values list[str], flat ords i32, offsets i64[max_doc+1])."""
        return (self.packed.sorted_set_dv or {}).get(field)

    def term_vector(self, local_doc: int, field: str) -> dict[str, list] | None:
        """Per-doc mini inverted index: {term: [(pos, start, end), ...]}
        (reference term_vectors_reader.rs; feeds the highlighter)."""
        tvs = self.packed.term_vectors
        if tvs is None or local_doc >= len(tvs):
            return None
        return tvs[local_doc].get(field)


class TermsIterator:
    """Ordered enumeration over one field's term dictionary (reference
    TermIterator protocol: next / seek_exact / seek_ceil / term / ord /
    doc_freq / total_term_freq / postings — blocktree_reader.rs:907)."""

    END = "END"
    FOUND = "FOUND"
    NOT_FOUND = "NOT_FOUND"

    def __init__(self, snap: "SegmentSnapshot", field: str, pf):
        self._snap = snap
        self._field = field
        self._pf = pf
        self._ord = -1  # positioned before the first term

    def next(self) -> str | None:
        if self._ord + 1 >= len(self._pf.terms):
            self._ord = len(self._pf.terms)
            return None
        self._ord += 1
        return self._pf.terms[self._ord]

    def seek_exact(self, text: str) -> bool:
        o = self._pf.term_ord.get(text)
        if o is None:
            return False
        self._ord = o
        return True

    def seek_ceil(self, text: str) -> str:
        """Position at the smallest term >= text: FOUND / NOT_FOUND (at the
        successor) / END."""
        import bisect

        o = bisect.bisect_left(self._pf.terms, text)
        self._ord = o
        if o >= len(self._pf.terms):
            return self.END
        return self.FOUND if self._pf.terms[o] == text else self.NOT_FOUND

    def seek_ord(self, ord_: int) -> None:
        if not 0 <= ord_ < len(self._pf.terms):
            raise IndexError(f"term ord {ord_} out of range")
        self._ord = ord_

    def term(self) -> str | None:
        if 0 <= self._ord < len(self._pf.terms):
            return self._pf.terms[self._ord]
        return None

    def ord(self) -> int:
        return self._ord

    def doc_freq(self) -> int:
        return int(self._pf.doc_freq[self._ord])

    def total_term_freq(self) -> int:
        return int(self._pf.total_tf[self._ord])

    def postings(self, with_positions: bool = False):
        t = self.term()
        if t is None:
            raise ValueError("iterator is unpositioned")
        return self._snap.read_postings(
            self._field, t, with_positions=with_positions
        )


class IndexReader:
    """Point-in-time composite over segment snapshots."""

    def __init__(self, leaves: list[SegmentSnapshot]):
        self.leaves = leaves
        base = 0
        for leaf in leaves:
            leaf.doc_base = base
            base += leaf.max_doc
        self.max_doc = base
        # point-in-time reader: doc freqs are immutable (deletes don't
        # change df, matching Lucene), so memoize across batches — hot
        # query terms repeat and each lookup walks a front-coded term dict
        self._df_cache: dict[tuple[str, str], int] = {}

    @property
    def num_docs(self) -> int:
        return sum(leaf.num_docs for leaf in self.leaves)

    def collection_stats(self, field: str) -> CollectionStats:
        doc_count = 0
        sum_ttf = 0
        for leaf in self.leaves:
            st = leaf.field_stats(field)
            if st is not None:
                doc_count += st.doc_count
                sum_ttf += st.sum_total_term_freq
        return CollectionStats(
            field=field,
            max_doc=self.max_doc,
            doc_count=doc_count if doc_count else -1,
            sum_total_term_freq=sum_ttf,
        )

    def doc_freq(self, field: str, text: str) -> int:
        got = self._df_cache.get((field, text))
        if got is None:
            got = sum(
                rec.doc_freq
                for leaf in self.leaves
                if (rec := leaf.term_record(field, text)) is not None
            )
            if len(self._df_cache) > 1 << 20:
                self._df_cache.clear()
            self._df_cache[(field, text)] = got
        return got

    def document(self, doc: int) -> dict[str, object]:
        for leaf in reversed(self.leaves):
            if doc >= leaf.doc_base:
                return leaf.document(doc - leaf.doc_base)
        raise IndexError(f"doc {doc} out of range")


def load_segment_snapshot(directory, info) -> SegmentSnapshot:
    """Load one committed segment (+ live gen + DV-update gen) as a
    snapshot. Shared by directory readers and multi-host partial loading."""
    from rucene_tpu.codec import files as segfiles

    packed = segfiles.read_segment(directory, info.name)
    live = (
        segfiles.read_live(directory, info.name, info.del_gen)
        if info.del_gen >= 0
        else None
    )
    snap = SegmentSnapshot(info.name, packed, live=live)
    if info.dv_gen >= 0:
        num_u, bin_u = segfiles.read_dv_updates(directory, info.name, info.dv_gen)
        for f, m in num_u.items():
            snap = snap.with_dv_updates(f, m)
        for f, m in bin_u.items():
            snap = snap.with_binary_dv_updates(f, m)
    return snap


def open_directory_reader(directory) -> IndexReader:
    """Open the latest commit (reference directory_reader.rs:62)."""
    from rucene_tpu.codec import files as segfiles

    infos = segfiles.read_segments_file(directory)
    return IndexReader(
        [load_segment_snapshot(directory, info) for info in infos.segments]
    )
