"""End-to-end search tests: device engine vs independent BM25 oracle, device
vs host-engine parity, booleans, deletes, phrases, multi-segment."""

import numpy as np
import pytest

from rucene_tpu import (
    BooleanQuery,
    IndexSearcher,
    MatchAllDocsQuery,
    PhraseQuery,
    Term,
    TermQuery,
)
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from tests.conftest import WORDS, make_docs, random_corpus
from tests.hitcheck import assert_hits_equal
from tests.oracle import OracleIndex


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(123)
    return random_corpus(rng, 300)


@pytest.fixture(scope="module")
def searcher(corpus):
    buf = SegmentBuffer()
    for d in make_docs(corpus):
        buf.add_document(d)
    snap = SegmentSnapshot("s0", pack_segment(buf.finish()))
    return IndexSearcher(IndexReader([snap]))


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(corpus)


def test_term_query_exact_parity(searcher, oracle):
    for term in ["the", "fox", "tensor", "merge", "query"]:
        td = searcher.search(TermQuery(Term("body", term)), k=10)
        want, total = oracle.search_term(term, 10)
        assert td.total_hits == total, term
        got = [(sd.doc, sd.score) for sd in td.score_docs]
        assert_hits_equal(got, want)


def test_term_query_missing_term(searcher):
    td = searcher.search(TermQuery(Term("body", "zzzznotaword")), k=5)
    assert td.total_hits == 0 and td.score_docs == []


def test_boolean_must_should(searcher, oracle):
    q = BooleanQuery()
    q.must(TermQuery(Term("body", "fox")))
    q.should(TermQuery(Term("body", "dog")))
    td = searcher.search(q, k=20)
    want, total = oracle.search_bool(["fox"], ["dog"], [], 20)
    assert td.total_hits == total
    assert_hits_equal([(sd.doc, sd.score) for sd in td.score_docs], want)


def test_boolean_or(searcher, oracle):
    q = BooleanQuery()
    q.should(TermQuery(Term("body", "tensor")))
    q.should(TermQuery(Term("body", "device")))
    td = searcher.search(q, k=30)
    want, total = oracle.search_bool([], ["tensor", "device"], [], 30)
    assert td.total_hits == total
    assert_hits_equal([(sd.doc, sd.score) for sd in td.score_docs], want)


def test_boolean_must_not_and_filter(searcher, oracle):
    q = BooleanQuery()
    q.must(TermQuery(Term("body", "quick")))
    q.must_not(TermQuery(Term("body", "lazy")))
    td = searcher.search(q, k=50)
    want, total = oracle.search_bool(["quick"], [], ["lazy"], 50)
    assert td.total_hits == total
    assert_hits_equal([(sd.doc, sd.score) for sd in td.score_docs], want)

    q2 = BooleanQuery()
    q2.filter(TermQuery(Term("body", "quick")))
    q2.should(TermQuery(Term("body", "brown")))
    td2 = searcher.search(q2, k=50)
    # filter does not score; should is optional (min_should=0 with required)
    want2, total2 = oracle.search_bool([], ["brown"], [], 50, min_should=0, filters=["quick"])
    # oracle scores should-only sum; min_should=0 means filter-matching docs
    # with no should-match get score 0
    assert td2.total_hits == total2


def test_min_should_match(searcher, oracle):
    q = BooleanQuery(min_should_match=2)
    for t in ["fox", "dog", "lazy"]:
        q.should(TermQuery(Term("body", t)))
    td = searcher.search(q, k=50)
    want, total = oracle.search_bool([], ["fox", "dog", "lazy"], [], 50, min_should=2)
    assert td.total_hits == total
    assert_hits_equal([(sd.doc, sd.score) for sd in td.score_docs], want)


def test_match_all(searcher, corpus):
    td = searcher.search(MatchAllDocsQuery(), k=5)
    assert td.total_hits == len(corpus)
    assert [sd.doc for sd in td.score_docs] == [0, 1, 2, 3, 4]
    assert all(sd.score == 1.0 for sd in td.score_docs)


def test_batch_matches_single(searcher):
    queries = [TermQuery(Term("body", w)) for w in ["the", "fox", "engine", "block", "pack"]]
    batch = searcher.search_batch(queries, k=10)
    for q, td_b in zip(queries, batch):
        td_s = searcher.search(q, k=10)
        assert td_b.total_hits == td_s.total_hits
        assert [(sd.doc, sd.score) for sd in td_b.score_docs] == [
            (sd.doc, sd.score) for sd in td_s.score_docs
        ]


def test_device_matches_host_engine(searcher, corpus):
    """Random boolean queries: jitted executor == numpy host engine, exactly."""
    from rucene_tpu.search import host_engine

    rng = np.random.default_rng(5)
    leaf = searcher.reader.leaves[0]
    for trial in range(25):
        n_must = int(rng.integers(0, 3))
        n_should = int(rng.integers(0, 4))
        n_not = int(rng.integers(0, 2))
        if n_must + n_should == 0:
            n_should = 1
        words = rng.choice(WORDS, size=n_must + n_should + n_not, replace=False)
        q = BooleanQuery()
        i = 0
        for _ in range(n_must):
            q.must(TermQuery(Term("body", words[i]))); i += 1
        for _ in range(n_should):
            q.should(TermQuery(Term("body", words[i]))); i += 1
        for _ in range(n_not):
            q.must_not(TermQuery(Term("body", words[i]))); i += 1

        rq = q.rewrite()
        doc_freqs, stats = searcher._gather_stats([rq])
        host = host_engine.execute_on_segment(
            leaf, rq, searcher.similarity, stats, doc_freqs, 20
        )
        td = searcher.search(q, k=20)
        assert td.total_hits == host.total_hits, trial
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in td.score_docs],
            list(zip(host.docs.tolist(), host.scores.tolist())),
        )


def test_phrase_query(corpus, searcher, oracle):
    # find any adjacent word pair present in the corpus
    toks = corpus[0].lower().split()
    pair = (toks[0], toks[1])
    q = PhraseQuery("body", [pair[0], pair[1]])
    td = searcher.search(q, k=50)
    # brute force: docs where pair occurs consecutively
    want_docs = []
    for d, text in enumerate(corpus):
        t = text.lower().split()
        pf = sum(1 for i in range(len(t) - 1) if t[i] == pair[0] and t[i + 1] == pair[1])
        if pf:
            want_docs.append(d)
    assert td.total_hits == len(want_docs)
    assert sorted(sd.doc for sd in td.score_docs) == want_docs[: 50] if len(want_docs) <= 50 else True
    assert all(sd.score > 0 for sd in td.score_docs)


def test_multi_segment_equals_single(corpus):
    """Splitting the corpus across segments must not change global results
    (stats are index-global, like the reference's searcher-level stats)."""
    buf = SegmentBuffer()
    for d in make_docs(corpus):
        buf.add_document(d)
    single = IndexSearcher(IndexReader([SegmentSnapshot("s0", pack_segment(buf.finish()))]))

    parts = [corpus[:100], corpus[100:180], corpus[180:]]
    snaps = []
    for i, part in enumerate(parts):
        b = SegmentBuffer()
        for d in make_docs(part):
            b.add_document(d)
        snaps.append(SegmentSnapshot(f"p{i}", pack_segment(b.finish())))
    multi = IndexSearcher(IndexReader(snaps))

    for w in ["the", "fox", "tensor", "segment"]:
        t1 = single.search(TermQuery(Term("body", w)), k=15)
        t2 = multi.search(TermQuery(Term("body", w)), k=15)
        assert t1.total_hits == t2.total_hits
        assert [(sd.doc, sd.score) for sd in t1.score_docs] == [
            (sd.doc, sd.score) for sd in t2.score_docs
        ]


def test_deletes(corpus):
    buf = SegmentBuffer()
    for d in make_docs(corpus):
        buf.add_document(d)
    snap = SegmentSnapshot("s0", pack_segment(buf.finish()))
    base = IndexSearcher(IndexReader([snap]))
    td0 = base.search(TermQuery(Term("body", "fox")), k=1000)
    assert td0.total_hits > 2
    # delete the two best docs
    live = np.ones(len(corpus), dtype=bool)
    live[td0.score_docs[0].doc] = False
    live[td0.score_docs[1].doc] = False
    snap2 = snap.with_deletes(live)
    s2 = IndexSearcher(IndexReader([snap2]))
    td1 = s2.search(TermQuery(Term("body", "fox")), k=1000)
    assert td1.total_hits == td0.total_hits - 2
    assert [sd.doc for sd in td1.score_docs] == [sd.doc for sd in td0.score_docs[2:]]
