"""LeafIndexLookup: scripting-style access to index statistics per doc.

reference: rucene src/core/index/reader/index_lookup.rs:25 (TermPosition,
LeafIndexLookup) — the Zhihu extension mirroring Elasticsearch's `_index`
script variable: per-term df/ttf and per-doc tf/positions/offsets.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from rucene_tpu.index.reader import SegmentSnapshot


@dataclass
class TermPosition:
    position: int
    start_offset: int = -1
    end_offset: int = -1


class IndexField:
    def __init__(self, leaf: SegmentSnapshot, field: str):
        self._leaf = leaf
        self.field = field

    def __getitem__(self, term: str) -> "IndexFieldTerm":
        return IndexFieldTerm(self._leaf, self.field, term)


class IndexFieldTerm:
    def __init__(self, leaf: SegmentSnapshot, field: str, term: str):
        self._leaf = leaf
        self.field = field
        self.term = term
        rec = leaf.term_record(field, term)
        self.df = rec.doc_freq if rec else 0  # document frequency
        self.ttf = rec.total_tf if rec else 0  # total term frequency
        self._postings = None

    def _load(self):
        if self._postings is None:
            p = self._leaf.read_postings(self.field, self.term, with_positions=True)
            if p is None:
                self._postings = (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64))
            else:
                self._postings = p
        return self._postings

    def tf(self, doc: int) -> int:
        docs, freqs, _ = self._load()
        i = np.searchsorted(docs, doc)
        return int(freqs[i]) if i < len(docs) and docs[i] == doc else 0

    def positions(self, doc: int) -> list[TermPosition]:
        docs, freqs, pos = self._load()
        i = np.searchsorted(docs, doc)
        if i >= len(docs) or docs[i] != doc:
            return []
        start = int(freqs[:i].sum())
        out = [TermPosition(int(p)) for p in pos[start : start + int(freqs[i])]]
        tv = self._leaf.term_vector(doc, self.field)
        if tv and self.term in tv:
            by_pos = {p: (s, e) for p, s, e in tv[self.term]}
            for tp in out:
                if tp.position in by_pos:
                    tp.start_offset, tp.end_offset = by_pos[tp.position]
        return out


class LeafIndexLookup:
    """`lookup[field][term].tf(doc)` etc. over one segment."""

    def __init__(self, leaf: SegmentSnapshot):
        self._leaf = leaf

    def __getitem__(self, field: str) -> IndexField:
        return IndexField(self._leaf, field)

    def field_statistics(self, field: str):
        return self._leaf.field_stats(field)
