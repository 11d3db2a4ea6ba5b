"""Gapped phrase positions (reference phrase_query.rs:51 explicit
positions vector): "quick ? fox" matches quick at p and fox at p+2, with
None hole slots internally; gapped phrases are exact-only (slop==0)."""

from __future__ import annotations

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot

TEXTS = [
    "quick brown fox jumps",
    "quick fox",
    "quick red fox",
    "fox quick brown",
    "quick brown brown fox",
]


def _searcher():
    buf = SegmentBuffer()
    for t in TEXTS:
        d = rt.Document()
        d.add(rt.TextField("body", t, stored=True))
        buf.add_document(d)
    return rt.IndexSearcher(
        IndexReader([SegmentSnapshot("s0", pack_segment(buf.finish()))])
    )


def test_gapped_positions_match():
    s = _searcher()
    td = s.search(rt.PhraseQuery("body", ["quick", "fox"], positions=[0, 2]), k=10)
    assert {sd.doc for sd in td.score_docs} == {0, 2}
    # positions normalize to their first entry
    td2 = s.search(rt.PhraseQuery("body", ["quick", "fox"], positions=[5, 7]), k=10)
    assert {sd.doc for sd in td2.score_docs} == {0, 2}


def test_hole_terms_equal_positions_form():
    s = _searcher()
    a = s.search(rt.PhraseQuery("body", ["quick", "fox"], positions=[0, 2]), k=10)
    b = s.search(rt.PhraseQuery("body", ["quick", None, "fox"]), k=10)
    assert [(sd.doc, sd.score) for sd in a.score_docs] == [
        (sd.doc, sd.score) for sd in b.score_docs
    ]


def test_gapped_in_boolean():
    s = _searcher()
    q = rt.BooleanQuery()
    q.add(rt.PhraseQuery("body", ["quick", None, "fox"]), rt.Occur.MUST)
    q.add(rt.TermQuery(rt.Term("body", "brown")), rt.Occur.MUST)
    td = s.search(q, k=10)
    assert {sd.doc for sd in td.score_docs} == {0}


def test_gapped_validation():
    with pytest.raises(ValueError):
        rt.PhraseQuery("body", ["a", None, "b"], slop=2)
    with pytest.raises(ValueError):
        rt.PhraseQuery("body", ["a", "b"], positions=[2, 0])
    with pytest.raises(ValueError):
        rt.PhraseQuery("body", ["a", "b"], positions=[1, 1])
    with pytest.raises(ValueError):
        rt.PhraseQuery("body", ["a"], positions=[0, 1])


def test_gapped_highlighting_falls_back_to_terms():
    from rucene_tpu.highlight.fvh import FieldQuery

    s = _searcher()
    q = rt.PhraseQuery("body", ["quick", None, "fox"])
    fq = FieldQuery.build(q)
    # the gapped phrase degrades to its real member terms
    assert "quick" in fq.terms.get("body", {}) and "fox" in fq.terms.get("body", {})
    assert not fq.phrases
    # (fragment extraction needs term vectors; the degrade rule above is
    # the behavior under test — FieldQuery.build must not crash on holes)
