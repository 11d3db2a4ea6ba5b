"""Phrase occur semantics in booleans (Lucene boolean_query.rs:196-272):
a SHOULD phrase is OPTIONAL (it counts toward min_should_match), a MUST/
FILTER phrase is required, FILTER contributes no score. Earlier rounds
flattened every phrase child to required — these tests pin the fix with a
brute-force oracle."""

from __future__ import annotations

import numpy as np

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot


TEXTS = [
    "quick brown fox",          # phrase + fox
    "fox runs alone",           # fox only
    "quick brown dog",          # phrase only
    "lazy dog sleeps",          # neither
    "brown quick fox",          # fox, words present but NOT the phrase
    "quick brown fox quick brown fox",  # phrase twice + fox
]


def _searcher():
    buf = SegmentBuffer()
    for t in TEXTS:
        d = rt.Document()
        d.add(rt.TextField("body", t))
        buf.add_document(d)
    return rt.IndexSearcher(
        IndexReader([SegmentSnapshot("s0", pack_segment(buf.finish()))])
    )


def _phrase_docs():
    return {i for i, t in enumerate(TEXTS) if "quick brown" in t}


def _term_docs(word):
    return {i for i, t in enumerate(TEXTS) if word in t.split()}


def test_should_phrase_is_optional():
    """SHOULD phrase OR SHOULD term: docs matching either must hit."""
    s = _searcher()
    q = rt.BooleanQuery()
    q.add(rt.PhraseQuery("body", ["quick", "brown"]), rt.Occur.SHOULD)
    q.add(rt.TermQuery(rt.Term("body", "fox")), rt.Occur.SHOULD)
    td = s.search(q, k=10)
    want = _phrase_docs() | _term_docs("fox")
    assert {sd.doc for sd in td.score_docs} == want
    assert td.total_hits == len(want)


def test_must_phrase_still_required():
    s = _searcher()
    q = rt.BooleanQuery()
    q.add(rt.PhraseQuery("body", ["quick", "brown"]), rt.Occur.MUST)
    q.add(rt.TermQuery(rt.Term("body", "fox")), rt.Occur.SHOULD)
    td = s.search(q, k=10)
    assert {sd.doc for sd in td.score_docs} == _phrase_docs()


def test_filter_phrase_required_unscored():
    """FILTER phrase: required, contributes no score — matching docs score
    exactly like the term-only query over the filtered doc set."""
    s = _searcher()
    qf = rt.BooleanQuery()
    qf.add(rt.PhraseQuery("body", ["quick", "brown"]), rt.Occur.FILTER)
    qf.add(rt.TermQuery(rt.Term("body", "fox")), rt.Occur.MUST)
    td = s.search(qf, k=10)
    want_docs = _phrase_docs() & _term_docs("fox")
    assert {sd.doc for sd in td.score_docs} == want_docs
    term_scores = {
        sd.doc: sd.score
        for sd in s.search(rt.TermQuery(rt.Term("body", "fox")), k=10).score_docs
    }
    for sd in td.score_docs:
        assert abs(sd.score - term_scores[sd.doc]) < 1e-6


def test_lone_should_phrase_equals_must():
    s = _searcher()
    q = rt.BooleanQuery()
    q.add(rt.PhraseQuery("body", ["quick", "brown"]), rt.Occur.SHOULD)
    a = s.search(q, k=10)
    b = s.search(rt.PhraseQuery("body", ["quick", "brown"]), k=10)
    assert [(sd.doc, sd.score) for sd in a.score_docs] == [
        (sd.doc, sd.score) for sd in b.score_docs
    ]


def test_nested_mixed_child_keeps_term_clauses():
    """A SHOULD child that is itself (MUST phrase + MUST term) must not
    lose its term clause in flattening: doc2 has the phrase but not fox,
    so the child matches only docs with BOTH."""
    s = _searcher()
    child = rt.BooleanQuery()
    child.add(rt.PhraseQuery("body", ["quick", "brown"]), rt.Occur.MUST)
    child.add(rt.TermQuery(rt.Term("body", "fox")), rt.Occur.MUST)
    outer = rt.BooleanQuery()
    outer.add(child, rt.Occur.SHOULD)
    outer.add(rt.TermQuery(rt.Term("body", "lazy")), rt.Occur.SHOULD)
    td = s.search(outer, k=10)
    want = (_phrase_docs() & _term_docs("fox")) | _term_docs("lazy")
    assert {sd.doc for sd in td.score_docs} == want


def test_must_not_phrase_excludes():
    """MUST_NOT phrase (previously NotImplementedError): docs containing
    the exact phrase are excluded, word co-occurrence alone is not."""
    s = _searcher()
    q = rt.BooleanQuery()
    q.add(rt.TermQuery(rt.Term("body", "fox")), rt.Occur.MUST)
    q.add(rt.PhraseQuery("body", ["quick", "brown"]), rt.Occur.MUST_NOT)
    td = s.search(q, k=10)
    want = _term_docs("fox") - _phrase_docs()
    assert {sd.doc for sd in td.score_docs} == want
    assert 4 in want  # "brown quick fox": words present, phrase absent


def test_min_should_match_counts_phrases():
    """mm=2 over (SHOULD phrase, SHOULD fox, SHOULD lazy): only docs with
    at least two of the three."""
    s = _searcher()
    q = rt.BooleanQuery(min_should_match=2)
    q.add(rt.PhraseQuery("body", ["quick", "brown"]), rt.Occur.SHOULD)
    q.add(rt.TermQuery(rt.Term("body", "fox")), rt.Occur.SHOULD)
    q.add(rt.TermQuery(rt.Term("body", "lazy")), rt.Occur.SHOULD)
    td = s.search(q, k=10)
    sets = [_phrase_docs(), _term_docs("fox"), _term_docs("lazy")]
    want = {
        d
        for d in range(len(TEXTS))
        if sum(1 for st in sets if d in st) >= 2
    }
    assert {sd.doc for sd in td.score_docs} == want
