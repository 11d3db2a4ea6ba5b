"""Second-pass rescoring of first-pass hits.

reference: rucene src/core/search/scorer/rescorer.rs:32-130 (Rescorer /
QueryRescorer): re-rank the top first-pass hits by combining their original
score with a (usually more expensive) rescore query's score.
"""

from __future__ import annotations

import numpy as np

from rucene_tpu.search import host_engine
from rucene_tpu.search.searcher import IndexSearcher, ScoreDoc, TopDocs


class QueryRescorer:
    """combined = first_pass + rescore_weight * second_query_score (for
    docs the second query matches), reference QueryRescorer semantics."""

    def __init__(self, rescore_query, rescore_weight: float = 1.0):
        self.query = rescore_query
        self.weight = np.float32(rescore_weight)

    def rescore(self, searcher: IndexSearcher, first: TopDocs, top_n: int) -> TopDocs:
        if not first.score_docs:
            return first
        doc_freqs, stats = searcher._gather_stats_query(self.query)
        # per-leaf dense evaluation of the rescore query
        leaf_eval = {}
        for leaf in searcher.reader.leaves:
            leaf_eval[leaf.doc_base] = (
                leaf,
                host_engine.evaluate_query(
                    leaf, self.query, searcher.similarity, stats, doc_freqs
                ),
            )
        bases = sorted(leaf_eval)
        out = []
        for sd in first.score_docs[:top_n]:
            base = max(b for b in bases if b <= sd.doc)
            leaf, (match, acc) = leaf_eval[base]
            local = sd.doc - base
            sc = np.float32(sd.score)
            if match[local]:
                sc = np.float32(sc + self.weight * np.float32(acc[local]))
            out.append(ScoreDoc(sd.doc, float(sc)))
        out.sort(key=lambda s: (-s.score, s.doc))
        return TopDocs(first.total_hits, out + list(first.score_docs[top_n:]))
