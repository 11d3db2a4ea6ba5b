"""BM25 host-side math — bit-exact with the reference
(rucene src/core/search/similarity/bm25_similarity.rs).

The device only sees two precomputed artifacts:
- per-term weight = boost * idf * (k1+1), folded in f32 in the reference's
  operation order (bm25_similarity.rs:363-366, :185-215);
- per-field cache rows cache[b] = k1*((1-b)+b*NORM_TABLE[b]/avgdl)
  (bm25_similarity.rs:152-170), with an all-k1 row for norm-less fields.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from rucene_tpu.util.small_float import norm_table

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75

_NORM_TABLE = norm_table()  # f32[256]


@dataclass(frozen=True)
class CollectionStats:
    """Per-field corpus statistics (reference statistics.rs:18-49). Includes
    deleted docs until they are merged away, as in Lucene."""

    field: str
    max_doc: int
    doc_count: int  # docs containing the field
    sum_total_term_freq: int


class BM25Similarity:
    def __init__(self, k1: float = DEFAULT_K1, b: float = DEFAULT_B):
        self.k1 = np.float32(k1)
        self.b = np.float32(b)

    def avg_field_length(self, stats: CollectionStats) -> np.float32:
        if stats.sum_total_term_freq <= 0:
            return np.float32(1.0)
        doc_count = stats.doc_count if stats.doc_count != -1 else stats.max_doc
        return np.float32(float(stats.sum_total_term_freq) / float(doc_count))

    def idf(self, doc_freq: int, doc_count: int) -> np.float32:
        # f64 math then cast, as the reference does (bm25_similarity.rs:99-115)
        return np.float32(math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))

    def term_weight(self, doc_freq: int, stats: CollectionStats, boost: float) -> np.float32:
        """boost * idf * (k1+1), f32 at every step in reference order."""
        doc_count = stats.doc_count if stats.doc_count != -1 else stats.max_doc
        idf = self.idf(doc_freq, doc_count)
        weight = np.float32(idf * np.float32(boost))
        return np.float32(weight * np.float32(self.k1 + np.float32(1.0)))

    def cache_row(self, stats: CollectionStats | None) -> np.ndarray:
        """f32[256] norm-byte -> k1*((1-b) + b*len/avgdl); all-k1 if the field
        has no norms (reference BM25SimScorer::compute_score None branch)."""
        if stats is None:
            return np.full(256, self.k1, dtype=np.float32)
        avgdl = self.avg_field_length(stats)
        one = np.float32(1.0)
        return (self.k1 * ((one - self.b) + self.b * (_NORM_TABLE / avgdl))).astype(np.float32)
