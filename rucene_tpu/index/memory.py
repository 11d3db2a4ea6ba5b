"""In-RAM single-segment indexer: the DWPT analog.

The reference inverts documents through TermsHash/BytesRefHash into block
pools (rucene src/core/codec/postings/terms_hash_per_field.rs:610,
util/bytes_ref_hash.rs:36). Here inversion accumulates per-term postings in
Python dicts and numpy buffers; `finish()` freezes them into sorted,
column-oriented SegmentData ready for packing onto the device. A C++
inversion fast path can drop in behind the same SegmentData contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np

from rucene_tpu.analysis import Analyzer, LowercaseWhitespaceAnalyzer, Token
from rucene_tpu.doc.document import Document
from rucene_tpu.doc.field import DocValuesType
from rucene_tpu.index.field_infos import FieldInfos
from rucene_tpu.util.small_float import float_to_byte315


@dataclass
class _TermPosting:
    """Growing posting list for one term (docids strictly increasing)."""

    docs: list[int] = dc_field(default_factory=list)
    freqs: list[int] = dc_field(default_factory=list)
    # positions flattened in doc order; freqs give per-doc extents
    positions: list[int] = dc_field(default_factory=list)
    # optional occurrence-parallel streams (IndexOptions ..._AND_OFFSETS /
    # payloads, reference posting_writer.rs offsets+payload planes)
    starts: list[int] = dc_field(default_factory=list)
    ends: list[int] = dc_field(default_factory=list)
    payloads: list = dc_field(default_factory=list)

    def add_occurrence(
        self,
        doc: int,
        position: int,
        start: int = -1,
        end: int = -1,
        payload: bytes | None = None,
    ) -> None:
        if self.docs and self.docs[-1] == doc:
            self.freqs[-1] += 1
        else:
            self.docs.append(doc)
            self.freqs.append(1)
        self.positions.append(position)
        if start >= 0 or self.starts:
            # keep occurrence-aligned once any occurrence carries offsets
            while len(self.starts) < len(self.positions) - 1:
                self.starts.append(-1)
                self.ends.append(-1)
            self.starts.append(start)
            self.ends.append(end)
        if payload is not None or self.payloads:
            while len(self.payloads) < len(self.positions) - 1:
                self.payloads.append(None)
            self.payloads.append(payload)


def _merge_postings(
    a: tuple[np.ndarray, np.ndarray, np.ndarray],
    b: tuple[np.ndarray, np.ndarray, np.ndarray],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge two doc-sorted posting lists for the same term (disjoint doc
    sets — a doc's field goes through exactly one inversion path)."""
    docs = np.concatenate([a[0], b[0]])
    freqs = np.concatenate([a[1], b[1]])
    order = np.argsort(docs, kind="stable")
    # positions: reorder per-doc runs to the merged doc order
    run_starts = np.concatenate(
        [
            np.concatenate([[0], np.cumsum(a[1])])[:-1],
            len(a[2]) + np.concatenate([[0], np.cumsum(b[1])])[:-1],
        ]
    )
    all_pos = np.concatenate([a[2], b[2]])
    pos_parts = [all_pos[run_starts[i] : run_starts[i] + freqs[i]] for i in order]
    return (
        docs[order].astype(np.int32),
        freqs[order].astype(np.int32),
        np.concatenate(pos_parts).astype(np.int32) if pos_parts else np.zeros(0, np.int32),
    )


@dataclass
class FieldStats:
    doc_count: int = 0  # docs containing this field
    sum_total_term_freq: int = 0
    sum_doc_freq: int = 0


@dataclass
class SegmentData:
    """A frozen in-RAM segment: everything a flush/pack step needs."""

    max_doc: int
    field_infos: FieldInfos
    # per field name -> {term -> (docs i32[], freqs i32[], positions i32[])}
    terms: dict[str, dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]]]
    norms: dict[str, np.ndarray]  # field -> uint8[max_doc]
    stats: dict[str, FieldStats]
    stored: list[dict[str, object]]  # per-doc stored fields
    numeric_dv: dict[str, tuple[np.ndarray, np.ndarray]]  # field -> (i64 vals, bool present)
    points: dict[str, tuple[np.ndarray, np.ndarray]]  # field -> (sorted i64 vals, i32 docs)
    term_vectors: list[dict[str, dict[str, list[tuple[int, int, int]]]]] | None = None
    # extra doc-values families (reference Lucene54 DV: binary / sorted /
    # sorted-numeric / sorted-set, doc_values/lucene54/*):
    binary_dv: dict[str, list[bytes | None]] | None = None
    sorted_dv: dict[str, tuple[list[str], np.ndarray]] | None = None  # (values, ord i32[max_doc], -1 missing)
    sorted_numeric_dv: dict[str, tuple[np.ndarray, np.ndarray]] | None = None  # (flat sorted vals, offsets i64[md+1])
    sorted_set_dv: dict[str, tuple[list[str], np.ndarray, np.ndarray]] | None = None  # (values, flat ords, offsets)
    # postings offsets/payloads (IndexOptions ..._AND_OFFSETS): per field ->
    # {term -> occurrence-parallel arrays aligned with `positions`}
    offsets: dict[str, dict[str, tuple[np.ndarray, np.ndarray]]] | None = None
    payloads: dict[str, dict[str, list]] | None = None


class SegmentBuffer:
    """Accumulates documents for one segment (single-threaded).

    Inversion has two paths sharing one output contract:
    - native (C++ via ctypes, native/rucene_native.cpp): ASCII text fields
      under the whitespace analyzers, no term vectors — the hot loop;
    - Python dicts for everything else (non-ASCII, custom analyzers,
      term-vector fields, untokenized fields).
    A field may mix paths across docs; finish() merges per term by doc id.
    """

    def __init__(
        self,
        analyzer: Analyzer | None = None,
        field_infos: FieldInfos | None = None,
        use_native: bool | None = None,
    ):
        from rucene_tpu import native as native_mod
        from rucene_tpu.analysis import WhitespaceAnalyzer

        self.analyzer: Analyzer = analyzer or LowercaseWhitespaceAnalyzer()
        self.field_infos = field_infos or FieldInfos()
        self._lowercase = isinstance(self.analyzer, LowercaseWhitespaceAnalyzer)
        native_ok = native_mod.available and isinstance(
            self.analyzer, (LowercaseWhitespaceAnalyzer, WhitespaceAnalyzer)
        )
        self._use_native = native_ok if use_native is None else (use_native and native_ok)
        self._native_mod = native_mod
        self._native: dict[str, object] = {}  # field -> NativeInverter
        self._terms: dict[str, dict[str, _TermPosting]] = {}
        self._offset_fields: set[str] = set()
        self._payload_fields: set[str] = set()
        self._norm_bytes: dict[str, dict[int, int]] = {}
        self._stats: dict[str, FieldStats] = {}
        self._stored: list[dict[str, object]] = []
        self._numeric_dv: dict[str, dict[int, int]] = {}
        self._binary_dv: dict[str, dict[int, bytes]] = {}
        self._sorted_dv: dict[str, dict[int, str]] = {}
        self._sorted_num_dv: dict[str, dict[int, list[int]]] = {}
        self._sorted_set_dv: dict[str, dict[int, set[str]]] = {}
        self._points: dict[str, list[tuple[int, int]]] = {}
        # per doc: {field: {term: [(pos, start, end), ...]}}
        self._term_vectors: list[dict[str, dict[str, list[tuple[int, int, int]]]]] = []
        self.num_docs = 0

    def add_document(self, doc: Document) -> int:
        doc_id = self.num_docs
        stored: dict[str, object] = {}
        doc_tv: dict[str, dict[str, list[tuple[int, int, int]]]] = {}
        # field -> (length, boost) for norm computation of this doc
        invert_state: dict[str, tuple[int, float]] = {}
        char_base: dict[str, int] = {}  # per-field offset base (multi-value)

        for f in doc:
            info = self.field_infos.get_or_add(f.name)
            ft = f.field_type
            if ft.indexed:
                if ft.index_options > info.index_options:
                    info.index_options = ft.index_options
                info.omit_norms = info.omit_norms or ft.omit_norms
                pre_tokens = f.value if isinstance(f.value, list) else None
                value = "" if pre_tokens is not None else str(f.value)
                via_native = (
                    pre_tokens is None
                    and self._use_native
                    and ft.tokenized
                    and not ft.store_term_vectors
                    and not ft.index_options.has_offsets
                    and value.isascii()
                )
                if via_native:
                    inv = self._native.get(f.name)
                    if inv is None:
                        inv = self._native[f.name] = self._native_mod.NativeInverter()
                    base_pos = invert_state.get(f.name, (0, f.boost))[0]
                    n_tok = inv.add_doc(doc_id, value.encode(), self._lowercase, base_pos)
                    if n_tok:
                        invert_state[f.name] = (base_pos + n_tok, f.boost)
                    tokens = []
                elif pre_tokens is not None:
                    tokens = pre_tokens
                elif ft.tokenized:
                    tokens = self.analyzer.tokenize(f.name, value)
                else:
                    tokens = [Token(value, 0, 0, len(value))]
                if tokens:
                    field_terms = self._terms.setdefault(f.name, {})
                    base_pos = invert_state.get(f.name, (0, f.boost))[0]
                    tv = None
                    if ft.store_term_vectors:
                        info.store_term_vectors = True
                        tv = doc_tv.setdefault(f.name, {})
                    want_off = ft.index_options.has_offsets
                    if want_off:
                        self._offset_fields.add(f.name)
                    # multi-valued fields: offsets accumulate across values
                    # with a 1-char gap, as if the values were space-joined
                    # (Lucene's offset gap, DefaultIndexingChain)
                    base_off = char_base.get(f.name, 0)
                    for tok in tokens:
                        posting = field_terms.get(tok.term)
                        if posting is None:
                            posting = field_terms[tok.term] = _TermPosting()
                        pay = getattr(tok, "payload", None)
                        if pay is not None:
                            self._payload_fields.add(f.name)
                        posting.add_occurrence(
                            doc_id,
                            base_pos + tok.position,
                            base_off + tok.start_offset if want_off else -1,
                            base_off + tok.end_offset if want_off else -1,
                            pay,
                        )
                        if tv is not None:
                            tv.setdefault(tok.term, []).append(
                                (
                                    base_pos + tok.position,
                                    base_off + tok.start_offset,
                                    base_off + tok.end_offset,
                                )
                            )
                    prev_len = invert_state.get(f.name, (0, f.boost))[0]
                    invert_state[f.name] = (prev_len + len(tokens), f.boost)
                    val_len = len(value) if value else (
                        max((t.end_offset for t in tokens), default=0)
                    )
                    char_base[f.name] = base_off + val_len + 1
            if ft.stored:
                if isinstance(f.value, list):  # pre-analyzed token stream
                    sv = " ".join(t.term for t in f.value)
                else:
                    sv = f.value
                # multi-valued stored fields accumulate (Document.getValues);
                # single values stay scalar (Document.get)
                if f.name in stored:
                    prev = stored[f.name]
                    if isinstance(prev, list):
                        prev.append(sv)
                    else:
                        stored[f.name] = [prev, sv]
                else:
                    stored[f.name] = sv
            if ft.doc_values_type == DocValuesType.NUMERIC:
                info.doc_values_type = DocValuesType.NUMERIC
                self._numeric_dv.setdefault(f.name, {})[doc_id] = int(f.value)
            elif ft.doc_values_type == DocValuesType.BINARY:
                info.doc_values_type = DocValuesType.BINARY
                v = f.value if isinstance(f.value, bytes) else str(f.value).encode()
                self._binary_dv.setdefault(f.name, {})[doc_id] = v
            elif ft.doc_values_type == DocValuesType.SORTED:
                info.doc_values_type = DocValuesType.SORTED
                self._sorted_dv.setdefault(f.name, {})[doc_id] = str(f.value)
            elif ft.doc_values_type == DocValuesType.SORTED_NUMERIC:
                info.doc_values_type = DocValuesType.SORTED_NUMERIC
                self._sorted_num_dv.setdefault(f.name, {}).setdefault(doc_id, []).append(
                    int(f.value)
                )
            elif ft.doc_values_type == DocValuesType.SORTED_SET:
                info.doc_values_type = DocValuesType.SORTED_SET
                self._sorted_set_dv.setdefault(f.name, {}).setdefault(doc_id, set()).add(
                    str(f.value)
                )
            if ft.point_dimension_count:
                info.point_dimension_count = ft.point_dimension_count
                info.point_num_bytes = ft.point_num_bytes
                from rucene_tpu.doc.field import float_to_sortable_int

                raw = f.value if isinstance(f.value, tuple) else (f.value,)
                enc = tuple(
                    float_to_sortable_int(v) if isinstance(v, float) else int(v)
                    for v in raw
                )
                self._points.setdefault(f.name, []).append((enc, doc_id))

        # norms: byte315(boost / sqrt(field_length)) — BM25Similarity::compute_norm
        # (reference bm25_similarity.rs:86-93)
        for name, (length, boost) in invert_state.items():
            info = self.field_infos.get(name)
            st = self._stats.setdefault(name, FieldStats())
            st.doc_count += 1
            st.sum_total_term_freq += length
            if not info.omit_norms and length > 0:
                norm = int(float_to_byte315(np.float32(boost) / np.sqrt(np.float32(length))))
                self._norm_bytes.setdefault(name, {})[doc_id] = norm

        self._stored.append(stored)
        self._term_vectors.append(doc_tv)
        self.num_docs += 1
        return doc_id

    def add_documents_bulk(self, docs) -> None:
        """Bulk ingestion: eligible text fields route through ONE native
        call per (field, chunk) — the GIL is released for the whole C++
        inversion pass, which is what makes thread-parallel ingestion
        (index/doc_writer.py) actually scale. Multi-valued text fields are
        joined with a space (identical tokens/positions under the
        whitespace tokenizer). Everything else follows the per-doc path."""
        if not self._use_native:
            for d in docs:
                self.add_document(d)
            return
        from rucene_tpu.doc.field import DocValuesType

        start_id = self.num_docs
        # collected per field: (doc_id, text)
        bulk: dict[str, list[tuple[int, str]]] = {}
        for n, doc in enumerate(docs):
            doc_id = start_id + n
            stored: dict[str, object] = {}
            texts_of: dict[str, list[str]] = {}
            slow_fields = []
            for f in doc:
                ft = f.field_type
                if (
                    ft.indexed
                    and ft.tokenized
                    and not ft.store_term_vectors
                    and not ft.index_options.has_offsets
                    and isinstance(f.value, str)
                    and f.value.isascii()
                ):
                    info = self.field_infos.get_or_add(f.name)
                    if ft.index_options > info.index_options:
                        info.index_options = ft.index_options
                    info.omit_norms = info.omit_norms or ft.omit_norms
                    texts_of.setdefault(f.name, []).append(f.value)
                    if ft.stored:
                        if f.name in stored:
                            prev = stored[f.name]
                            if isinstance(prev, list):
                                prev.append(f.value)
                            else:
                                stored[f.name] = [prev, f.value]
                        else:
                            stored[f.name] = f.value
                    if ft.doc_values_type == DocValuesType.NUMERIC:
                        info.doc_values_type = DocValuesType.NUMERIC
                        self._numeric_dv.setdefault(f.name, {})[doc_id] = int(f.value)
                else:
                    slow_fields.append(f)
            for name, vals in texts_of.items():
                bulk.setdefault(name, []).append((doc_id, " ".join(vals)))
            if slow_fields or not texts_of:
                from rucene_tpu.doc.document import Document as _Doc

                # run the per-doc path for the remaining fields only
                sub = _Doc(slow_fields)
                saved = self.num_docs
                self.num_docs = doc_id
                self.add_document(sub)
                self.num_docs = saved
                # add_document appended stored/tv rows for doc_id; merge ours
                self._stored[doc_id].update(stored)
            else:
                self._stored.append(stored)
                self._term_vectors.append({})
            self.num_docs = doc_id + 1

        for name, entries in bulk.items():
            inv = self._native.get(name)
            if inv is None:
                inv = self._native[name] = self._native_mod.NativeInverter()
            doc_ids = np.fromiter((e[0] for e in entries), np.int32, len(entries))
            blobs = [e[1].encode() for e in entries]
            offsets = np.zeros(len(blobs) + 1, np.int64)
            if blobs:
                offsets[1:] = np.cumsum([len(b_) for b_ in blobs])
            counts = inv.add_docs(doc_ids, b"".join(blobs), offsets, self._lowercase)
            # vectorized norms + stats
            info = self.field_infos.get(name)
            st = self._stats.setdefault(name, FieldStats())
            nz = counts > 0
            st.doc_count += int(nz.sum())
            st.sum_total_term_freq += int(counts.sum())
            if not info.omit_norms:
                norms = float_to_byte315(
                    np.float32(1.0) / np.sqrt(counts[nz].astype(np.float32))
                )
                field_norms = self._norm_bytes.setdefault(name, {})
                for d, v in zip(doc_ids[nz], norms):
                    field_norms[int(d)] = int(v)

    def finish(self) -> SegmentData:
        max_doc = self.num_docs
        terms_out: dict[str, dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]]] = {}
        for field, tmap in self._terms.items():
            fout: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
            for term in sorted(tmap):
                p = tmap[term]
                fout[term] = (
                    np.asarray(p.docs, dtype=np.int32),
                    np.asarray(p.freqs, dtype=np.int32),
                    np.asarray(p.positions, dtype=np.int32),
                )
            terms_out[field] = fout

        # postings offsets/payloads: emitted only when every occurrence of
        # the field stayed aligned (mixed-FieldType docs degrade safely)
        offsets_out: dict[str, dict[str, tuple[np.ndarray, np.ndarray]]] = {}
        for field in self._offset_fields:
            tmap = self._terms.get(field, {})
            fo = {}
            ok = True
            for term, p in tmap.items():
                if len(p.starts) != len(p.positions):
                    ok = False
                    break
                fo[term] = (
                    np.asarray(p.starts, dtype=np.int32),
                    np.asarray(p.ends, dtype=np.int32),
                )
            if ok and fo:
                offsets_out[field] = fo
        payloads_out: dict[str, dict[str, list]] = {}
        for field in self._payload_fields:
            tmap = self._terms.get(field, {})
            fp = {}
            ok = True
            for term, p in tmap.items():
                pay = p.payloads or [None] * len(p.positions)
                if len(pay) != len(p.positions):
                    ok = False
                    break
                fp[term] = pay
            if ok and fp:
                payloads_out[field] = fp

        # fold in the native inversion exports (zero-copy slices per term)
        for field, inv in self._native.items():
            terms, post_start, docs, freqs, pos_start, positions = inv.export()
            fout = terms_out.setdefault(field, {})
            for i, term in enumerate(terms):
                s, e = int(post_start[i]), int(post_start[i + 1])
                ps, pe = int(pos_start[i]), int(pos_start[i + 1])
                entry = (docs[s:e], freqs[s:e], positions[ps:pe])
                prev = fout.get(term)
                fout[term] = entry if prev is None else _merge_postings(prev, entry)
            if len(fout) != len(terms):  # python-path terms mixed in: re-sort
                terms_out[field] = {t: fout[t] for t in sorted(fout)}
            inv.close()
        self._native.clear()

        for field, fmap in terms_out.items():
            st = self._stats.setdefault(field, FieldStats())
            st.sum_doc_freq += sum(len(d) for d, _, _ in fmap.values())

        norms_out: dict[str, np.ndarray] = {}
        for field, by_doc in self._norm_bytes.items():
            arr = np.zeros(max_doc, dtype=np.uint8)
            for d, v in by_doc.items():
                arr[d] = v
            norms_out[field] = arr

        dv_out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for field, by_doc in self._numeric_dv.items():
            vals = np.zeros(max_doc, dtype=np.int64)
            present = np.zeros(max_doc, dtype=bool)
            for d, v in by_doc.items():
                vals[d] = v
                present[d] = True
            dv_out[field] = (vals, present)

        points_out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for field, pairs in self._points.items():
            vals = np.asarray([p[0] for p in pairs], dtype=np.int64)  # [N, D]
            docs = np.asarray([p[1] for p in pairs], dtype=np.int64)
            if vals.shape[1] == 1:
                order = np.lexsort((docs, vals[:, 0]))
                points_out[field] = (vals[order][:, 0], docs[order].astype(np.int32))
            else:
                # multi-dim: BKD leaf order (util/bkd.py; reference
                # bkd_writer.rs:313 median splits)
                from rucene_tpu.util.bkd import build_bkd

                t = build_bkd(vals, docs.astype(np.int32))
                points_out[field] = (t.vals, t.docs)

        binary_out = {}
        for field, by_doc in self._binary_dv.items():
            binary_out[field] = [by_doc.get(d) for d in range(max_doc)]
        sorted_out = {}
        for field, by_doc in self._sorted_dv.items():
            values = sorted(set(by_doc.values()))
            vmap = {v: i for i, v in enumerate(values)}
            ords = np.full(max_doc, -1, np.int32)
            for d, v in by_doc.items():
                ords[d] = vmap[v]
            sorted_out[field] = (values, ords)
        snum_out = {}
        for field, by_doc in self._sorted_num_dv.items():
            offsets = np.zeros(max_doc + 1, np.int64)
            flat: list[int] = []
            for d in range(max_doc):
                vals = sorted(by_doc.get(d, []))
                flat.extend(vals)
                offsets[d + 1] = len(flat)
            snum_out[field] = (np.asarray(flat, np.int64), offsets)
        sset_out = {}
        for field, by_doc in self._sorted_set_dv.items():
            values = sorted({v for s in by_doc.values() for v in s})
            vmap = {v: i for i, v in enumerate(values)}
            offsets = np.zeros(max_doc + 1, np.int64)
            flat_ords: list[int] = []
            for d in range(max_doc):
                ords = sorted(vmap[v] for v in by_doc.get(d, ()))
                flat_ords.extend(ords)
                offsets[d + 1] = len(flat_ords)
            sset_out[field] = (values, np.asarray(flat_ords, np.int32), offsets)

        return SegmentData(
            max_doc=max_doc,
            field_infos=self.field_infos,
            terms=terms_out,
            norms=norms_out,
            stats=dict(self._stats),
            stored=self._stored,
            numeric_dv=dv_out,
            points=points_out,
            term_vectors=self._term_vectors if any(self._term_vectors) else None,
            binary_dv=binary_out or None,
            sorted_dv=sorted_out or None,
            sorted_numeric_dv=snum_out or None,
            sorted_set_dv=sset_out or None,
            offsets=offsets_out or None,
            payloads=payloads_out or None,
        )
