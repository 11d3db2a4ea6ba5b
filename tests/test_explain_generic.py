"""Explain coverage for query types the structured tree doesn't model
(dismax combine, spans, excluded phrases): the generic recursive node
must report match status and the EXACT score search returns (reference
Weight::explain contract — the value is what must be right)."""

from __future__ import annotations

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.doc.term import Term
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.spans import SpanNearQuery, SpanTermQuery


def _searcher():
    buf = SegmentBuffer()
    for t in ["quick brown fox", "fox alone", "quick brown dog"]:
        d = rt.Document()
        d.add(rt.TextField("body", t))
        buf.add_document(d)
    return rt.IndexSearcher(
        IndexReader([SegmentSnapshot("s0", pack_segment(buf.finish()))])
    )


def test_explain_dismax_matches_search_score():
    s = _searcher()
    dm = rt.DisjunctionMaxQuery(
        [rt.TermQuery(Term("body", "fox")), rt.TermQuery(Term("body", "dog"))],
        tie_breaker=0.3,
    )
    by_doc = {sd.doc: sd.score for sd in s.search(dm, k=3).score_docs}
    for doc, score in by_doc.items():
        e = s.explain(dm, doc)
        assert e.match and abs(e.value - score) < 1e-6


def test_explain_unordered_span():
    s = _searcher()
    sp = SpanNearQuery(
        [SpanTermQuery(Term("body", "quick")), SpanTermQuery(Term("body", "fox"))],
        slop=1,
        in_order=False,
    )
    got = {sd.doc: sd.score for sd in s.search(sp, k=3).score_docs}
    assert 0 in got
    e = s.explain(sp, 0)
    assert e.match and abs(e.value - got[0]) < 1e-6
    assert not s.explain(sp, 1).match


def test_explain_must_not_phrase():
    s = _searcher()
    q = rt.BooleanQuery()
    q.add(rt.TermQuery(Term("body", "fox")), rt.Occur.MUST)
    q.add(rt.PhraseQuery("body", ["quick", "brown"]), rt.Occur.MUST_NOT)
    assert s.explain(q, 1).match
    assert not s.explain(q, 0).match
