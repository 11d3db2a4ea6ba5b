"""Scalar C++ baseline engine parity: the bench denominator must compute
the same search as the host numpy oracle (same docs, scores, ordering,
totals) across term/bool/min_should/phrase/delete shapes.

The engine mirrors the reference's scalar loops (bulk_scorer.rs:89-154,
skip_reader.rs:118, conjunction_scorer.rs, top_docs.rs:68-77,
phrase_scorer.rs:122); parity against host_engine proves it is a fair
denominator, not a strawman.
"""

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu import native as rtn
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search import host_engine
from rucene_tpu.search.scalar_engine import ScalarSearcher
from tests.hitcheck import assert_hits_equal

pytestmark = pytest.mark.skipif(
    not rtn.available or not hasattr(rtn._lib, "rtpu_scalar_search"),
    reason="native scalar engine unavailable",
)


def _build(n_docs=3000, vocab=200, seed=3, deletes=False):
    rng = np.random.default_rng(seed)
    buf = SegmentBuffer()
    docs = []
    for i in range(n_docs):
        n = int(rng.integers(3, 30))
        words = [f"w{int(x)}" for x in rng.zipf(1.3, size=n) % vocab]
        d = rt.Document()
        d.add(rt.TextField("body", " ".join(words)))
        docs.append(d)
    buf.add_documents_bulk(docs)
    snap = SegmentSnapshot("s0", pack_segment(buf.finish()))
    if deletes:
        live = np.ones(snap.max_doc, bool)
        live[rng.random(snap.max_doc) < 0.2] = False
        snap = snap.with_deletes(live)
    return IndexReader([snap])


def _queries(vocab=200, seed=11, n=48):
    rng = np.random.default_rng(seed)
    qs = []
    for i in range(n):
        t = lambda: rt.Term("body", f"w{int(rng.integers(1, vocab))}")
        kind = i % 6
        if kind == 0:
            qs.append(rt.TermQuery(t()))
        elif kind == 1:
            q = rt.BooleanQuery()
            q.should(rt.TermQuery(t()))
            q.should(rt.TermQuery(t()))
            q.should(rt.TermQuery(t()))
            qs.append(q)
        elif kind == 2:
            q = rt.BooleanQuery()
            q.must(rt.TermQuery(t()))
            q.must(rt.TermQuery(t()))
            qs.append(q)
        elif kind == 3:
            q = rt.BooleanQuery()
            q.must(rt.TermQuery(t()))
            q.should(rt.TermQuery(t()))
            q.must_not(rt.TermQuery(t()))
            qs.append(q)
        elif kind == 4:
            q = rt.BooleanQuery(min_should_match=2)
            q.should(rt.TermQuery(t()))
            q.should(rt.TermQuery(t()))
            q.should(rt.TermQuery(t()))
            qs.append(q)
        else:
            qs.append(rt.PhraseQuery("body", [t().text, t().text]))
    return qs


def _parity(reader, queries, k=20):
    searcher = rt.IndexSearcher(reader)
    rqs = [q.rewrite() for q in queries]
    doc_freqs, stats = searcher._gather_stats(rqs)
    leaf = reader.leaves[0]
    sc = ScalarSearcher(leaf, searcher.similarity, stats, doc_freqs)
    got = sc.search_batch(rqs, k=k)
    for rq, g in zip(rqs, got):
        want = host_engine.execute_on_segment(
            leaf, rq, searcher.similarity, stats, doc_freqs, k
        )
        assert g.total_hits == want.total_hits, (rq, g.total_hits, want.total_hits)
        assert_hits_equal(
            list(zip(g.docs.tolist(), g.scores.tolist())),
            list(zip(want.docs.tolist(), want.scores.tolist())),
        )


def test_parity_mixed_queries():
    _parity(_build(), _queries())


def test_parity_with_deletes():
    _parity(_build(deletes=True), _queries(seed=12))


def test_parity_large_vocab_skewed():
    # bigger corpus + rarer terms exercise multi-block lists, EF blocks
    # (dense high-freq terms) and skip-heavy conjunctions
    _parity(_build(n_docs=20000, vocab=50, seed=5), _queries(vocab=50, seed=13), k=50)


def test_match_all():
    reader = _build(n_docs=500)
    searcher = rt.IndexSearcher(reader)
    q = rt.MatchAllDocsQuery()
    rqs = [q.rewrite()]
    doc_freqs, stats = searcher._gather_stats(rqs)
    leaf = reader.leaves[0]
    sc = ScalarSearcher(leaf, searcher.similarity, stats, doc_freqs)
    got = sc.search_batch(rqs, k=10)[0]
    assert got.total_hits == 500
    assert got.docs.tolist() == list(range(10))


def test_missing_required_term_yields_empty():
    reader = _build(n_docs=300)
    searcher = rt.IndexSearcher(reader)
    q = rt.BooleanQuery()
    q.must(rt.TermQuery(rt.Term("body", "w1")))
    q.must(rt.TermQuery(rt.Term("body", "zz_not_a_term")))
    q2 = rt.TermQuery(rt.Term("body", "w1"))
    rqs = [q.rewrite(), q2.rewrite()]
    doc_freqs, stats = searcher._gather_stats(rqs)
    leaf = reader.leaves[0]
    sc = ScalarSearcher(leaf, searcher.similarity, stats, doc_freqs)
    got = sc.search_batch(rqs, k=10)
    assert got[0].total_hits == 0 and len(got[0].docs) == 0
    assert got[1].total_hits > 0  # neighbor query unaffected by blanking
