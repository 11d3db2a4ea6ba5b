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


def test_explain_dismax_tree_structure():
    """The dismax node must carry per-child weight trees (reference
    disjunction_max_query.rs:43-74), not a single generic node."""
    s = _searcher()
    dm = rt.DisjunctionMaxQuery(
        [rt.TermQuery(Term("body", "quick")), rt.TermQuery(Term("body", "fox"))],
        tie_breaker=0.5,
    )
    e = s.explain(dm, 0)  # doc 0 matches both disjuncts
    assert e.match and "max plus" in e.description
    assert len(e.details) == 2
    for child in e.details:
        assert child.match and "weight(body:" in child.description
        kinds = [d.description for d in child.details]
        assert any("idf" in k for k in kinds)
        assert any("tfNorm" in k for k in kinds)


def test_explain_span_tree_structure():
    s = _searcher()
    sp = SpanNearQuery(
        [SpanTermQuery(Term("body", "quick")), SpanTermQuery(Term("body", "fox"))],
        slop=1,
        in_order=False,
    )
    e = s.explain(sp, 0)
    assert e.match and "weight(body:SpanNearQuery" in e.description
    assert any("idf" in d.description for d in e.details)
    assert any("tfNorm" in d.description for d in e.details)


def test_explain_excluded_phrase_tree():
    """MUST_NOT-phrase booleans get per-clause children with the exact
    evaluator's total (previously one generic node)."""
    s = _searcher()
    q = rt.BooleanQuery()
    q.add(rt.TermQuery(Term("body", "fox")), rt.Occur.MUST)
    q.add(rt.PhraseQuery("body", ["quick", "brown"]), rt.Occur.MUST_NOT)
    e = s.explain(q, 1)
    assert e.match and e.description == "sum of:"
    assert len(e.details) == 1 and "weight(body:fox" in e.details[0].description
    got = {sd.doc: sd.score for sd in s.search(q, k=3).score_docs}
    assert abs(e.value - got[1]) < 1e-6


def test_explain_constscore_and_boosting():
    s = _searcher()
    cq = rt.ConstantScoreQuery(rt.TermQuery(Term("body", "fox")), boost=2.5)
    e = s.explain(cq, 0)
    assert e.match and e.value == 2.5 and "ConstantScore" in e.description
    assert not s.explain(cq, 2).match
    bq = rt.BoostingQuery(
        rt.TermQuery(Term("body", "fox")),
        rt.TermQuery(Term("body", "alone")),
        negative_boost=0.1,
    )
    e1 = s.explain(bq, 1)  # negative matches doc 1 -> demoted, child trees
    assert e1.match and len(e1.details) == 2
    got = {sd.doc: sd.score for sd in s.search(bq, k=3).score_docs}
    assert abs(e1.value - got[1]) < 1e-6
    e0 = s.explain(bq, 0)  # not demoted -> plain positive tree
    assert e0.match and abs(e0.value - got[0]) < 1e-6
