"""Both executor top-k strategies (dense and candidate-sort) must agree:
the strategy switches on static shapes (b*md vs work lanes), so force each
side of the threshold and cross-check, including heavy score ties."""

import numpy as np

from rucene_tpu import BooleanQuery, IndexSearcher, Term, TermQuery
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from tests.conftest import make_docs, random_corpus
from tests.hitcheck import assert_hits_equal
from tests.oracle import OracleIndex


def _searcher(texts):
    buf = SegmentBuffer()
    for d in make_docs(texts):
        buf.add_document(d)
    return IndexSearcher(IndexReader([SegmentSnapshot("s", pack_segment(buf.finish()))]))


def test_candidate_path_matches_oracle():
    # 3000 docs -> md_pad=3072; single-term queries have tiny work lists, so
    # b*md > 12*L forces the candidate-sort branch
    rng = np.random.default_rng(77)
    texts = random_corpus(rng, 3000)
    s = _searcher(texts)
    o = OracleIndex(texts)
    for term in ["fox", "tensor", "merge", "quick", "segment"]:
        td = s.search(TermQuery(Term("body", term)), k=25)
        want, total = o.search_term(term, 25)
        assert td.total_hits == total, term
        assert_hits_equal([(sd.doc, sd.score) for sd in td.score_docs], want)


def test_candidate_path_boolean_and_ties():
    rng = np.random.default_rng(78)
    # heavy ties: identical docs -> identical scores -> doc-id tie-break
    texts = ["tie tie word"] * 500 + random_corpus(rng, 2600)
    s = _searcher(texts)
    o = OracleIndex(texts)
    td = s.search(TermQuery(Term("body", "tie")), k=20)
    want, total = o.search_term("tie", 20)
    assert td.total_hits == total == 500
    # exact tie-break: first 20 doc ids in ascending order
    assert [sd.doc for sd in td.score_docs] == list(range(20))

    q = BooleanQuery()
    q.must(TermQuery(Term("body", "fox")))
    q.should(TermQuery(Term("body", "dog")))
    td2 = s.search(q, k=30)
    want2, total2 = o.search_bool(["fox"], ["dog"], [], 30)
    assert td2.total_hits == total2
    assert_hits_equal([(sd.doc, sd.score) for sd in td2.score_docs], want2)


def test_more_matches_than_k():
    rng = np.random.default_rng(79)
    texts = random_corpus(rng, 2500)
    s = _searcher(texts)
    td = s.search(TermQuery(Term("body", "the")), k=5)
    assert len(td.score_docs) == 5
    assert td.total_hits > 5
    scores = [sd.score for sd in td.score_docs]
    assert scores == sorted(scores, reverse=True)
