"""Independent brute-force BM25 oracle: computes scores straight from raw
texts with no shared code with the engine (except SmallFloat, which defines
the format). Mirrors reference semantics: bm25_similarity.rs + boolean
matching of boolean_query.rs."""

from __future__ import annotations

import math

import numpy as np

from rucene_tpu.util.small_float import byte315_to_float, float_to_byte315

K1 = np.float32(1.2)
B = np.float32(0.75)

_NORM_TABLE = None


def _table():
    global _NORM_TABLE
    if _NORM_TABLE is None:
        f = byte315_to_float(np.arange(256, dtype=np.uint32))
        with np.errstate(divide="ignore"):
            t = (np.float32(1.0) / (f * f)).astype(np.float32)
        t[0] = np.float32(1.0) / t[255]
        _NORM_TABLE = t
    return _NORM_TABLE


class OracleIndex:
    def __init__(self, texts: list[str]):
        self.tokens = [t.lower().split() for t in texts]
        self.n = len(texts)
        self.doc_count = sum(1 for t in self.tokens if True)  # all docs have body
        self.sum_ttf = sum(len(t) for t in self.tokens)
        self.norm_bytes = [
            int(float_to_byte315(np.float32(1.0) / np.sqrt(np.float32(len(t))))) if t else 0
            for t in self.tokens
        ]

    def df(self, term: str) -> int:
        return sum(1 for toks in self.tokens if term in toks)

    def tf(self, doc: int, term: str) -> int:
        return self.tokens[doc].count(term)

    def avgdl(self) -> np.float32:
        return np.float32(float(self.sum_ttf) / float(self.doc_count))

    def weight2(self, term: str, boost: float = 1.0) -> np.float32:
        idf = np.float32(math.log(1.0 + (self.doc_count - self.df(term) + 0.5) / (self.df(term) + 0.5)))
        w = np.float32(idf * np.float32(boost))
        return np.float32(w * np.float32(K1 + np.float32(1.0)))

    def cache_val(self, doc: int) -> np.float32:
        avgdl = self.avgdl()
        t = _table()
        return np.float32(K1 * ((np.float32(1.0) - B) + B * (t[self.norm_bytes[doc]] / avgdl)))

    def term_score(self, doc: int, term: str, boost: float = 1.0) -> np.float32:
        tf = np.float32(self.tf(doc, term))
        if tf == 0:
            return np.float32(0.0)
        return np.float32(self.weight2(term, boost) * tf / (tf + self.cache_val(doc)))

    def search_term(self, term: str, k: int):
        """Top-k (doc, score) for a single TermQuery, score desc / doc asc."""
        hits = [(d, float(self.term_score(d, term))) for d in range(self.n) if self.tf(d, term)]
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k], len(hits)

    def search_bool(self, must: list[str], should: list[str], must_not: list[str], k: int,
                    min_should: int = 0, filters: list[str] | None = None):
        filters = filters or []
        hits = []
        eff_min = min_should if (must or filters) else max(1, min_should)
        for d in range(self.n):
            if any(self.tf(d, t) == 0 for t in must):
                continue
            if any(self.tf(d, t) == 0 for t in filters):
                continue
            if any(self.tf(d, t) > 0 for t in must_not):
                continue
            n_should = sum(1 for t in should if self.tf(d, t) > 0)
            if n_should < eff_min:
                continue
            score = np.float32(0.0)
            for t in must + should:
                score = np.float32(score + self.term_score(d, t))
            hits.append((d, float(score)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k], len(hits)
