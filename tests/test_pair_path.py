"""Pair-gallop boolean path (executor.execute_flat_pair): differential
parity vs the legacy dense/candidate path on AND2/OR2 rows, including
tie-breaks, deletes, missing terms, and duplicated terms."""

import os

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.searcher import IndexSearcher
from rucene_tpu.util.metrics import METRICS




@pytest.fixture(autouse=True)
def _force_decoded_residency():
    """These tests pin the DECODED-residency machinery; since r5, small
    (floored) segments serve from the packed form under auto policy, so
    force decoded mode explicitly."""
    os.environ["RUCENE_DECODED"] = "1"
    yield
    os.environ.pop("RUCENE_DECODED", None)

def _index(n_docs=3000, vocab=60, seed=3, n_segments=1):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    snaps = []
    per = n_docs // n_segments
    for s in range(n_segments):
        buf = SegmentBuffer()
        for _ in range(per):
            # heavy-tie regime: tiny docs, few distinct lengths
            n = int(rng.integers(3, 8))
            toks = rng.choice(vocab, size=n, p=_zipf(vocab))
            d = rt.Document()
            d.add(rt.TextField("body", " ".join(words[t] for t in toks)))
            buf.add_document(d)
        snaps.append(SegmentSnapshot(f"s{s}", pack_segment(buf.finish())))
    return IndexReader(snaps), words


def _zipf(v):
    p = 1.0 / np.arange(1, v + 1)
    return p / p.sum()


def _queries(words, rng, n=48):
    qs = []
    for i in range(n):
        t1 = words[int(rng.integers(0, len(words)))]
        t2 = words[int(rng.integers(0, len(words)))]
        q = rt.BooleanQuery()
        if i % 2 == 0:
            q.should(rt.TermQuery(rt.Term("body", t1)))
            q.should(rt.TermQuery(rt.Term("body", t2)))
        else:
            q.must(rt.TermQuery(rt.Term("body", t1)))
            q.must(rt.TermQuery(rt.Term("body", t2)))
        qs.append(q)
    # edge shapes: same term twice, missing terms
    for mk in ("should", "must"):
        q = rt.BooleanQuery()
        getattr(q, mk)(rt.TermQuery(rt.Term("body", "w1")))
        getattr(q, mk)(rt.TermQuery(rt.Term("body", "w1")))
        qs.append(q)
        q = rt.BooleanQuery()
        getattr(q, mk)(rt.TermQuery(rt.Term("body", "w1")))
        getattr(q, mk)(rt.TermQuery(rt.Term("body", "zz_missing")))
        qs.append(q)
        q = rt.BooleanQuery()
        getattr(q, mk)(rt.TermQuery(rt.Term("body", "zz_missing")))
        getattr(q, mk)(rt.TermQuery(rt.Term("body", "yy_missing")))
        qs.append(q)
    return qs


def _run_both(reader, qs, k):
    s = IndexSearcher(reader)
    METRICS.reset()
    got = s.search_batch(qs, k=k)
    assert METRICS.snapshot()["counters"].get("route.pair_rows", 0) >= len(qs), (
        "pair path did not engage"
    )
    os.environ["RUCENE_PAIR"] = "0"
    try:
        ref = IndexSearcher(reader).search_batch(qs, k=k)
    finally:
        os.environ.pop("RUCENE_PAIR", None)
    return got, ref


def _assert_equal(got, ref):
    for g, r in zip(got, ref):
        assert g.total_hits == r.total_hits
        gd = [(sd.doc, sd.score) for sd in g.score_docs]
        rd = [(sd.doc, sd.score) for sd in r.score_docs]
        assert [d for d, _ in gd] == [d for d, _ in rd]
        np.testing.assert_allclose(
            [s for _, s in gd], [s for _, s in rd], rtol=2e-6, atol=1e-6
        )


@pytest.mark.parametrize("k", [5, 100])
def test_pair_parity_single_segment(k):
    reader, words = _index()
    qs = _queries(words, np.random.default_rng(11))
    got, ref = _run_both(reader, qs, k)
    _assert_equal(got, ref)


def test_pair_parity_multi_segment():
    reader, words = _index(n_segments=3)
    qs = _queries(words, np.random.default_rng(12))
    got, ref = _run_both(reader, qs, 10)
    _assert_equal(got, ref)


def test_pair_parity_with_deletes():
    reader, words = _index()
    live = np.ones(reader.leaves[0].max_doc, bool)
    live[::3] = False
    snap = reader.leaves[0].with_deletes(live)
    reader2 = IndexReader([snap])
    qs = _queries(words, np.random.default_rng(13))
    got, ref = _run_both(reader2, qs, 10)
    _assert_equal(got, ref)


def test_pair_slot_overflow_fallback():
    """A sparse-but-block-rich owner whose block spans cover many probe
    blocks overflows MAXP_CAP and must rerun on the flat executor with
    identical results."""
    buf = SegmentBuffer()
    n = 64 * 1024
    a_docs = set(range(0, n, 20))          # wide spans, many blocks
    b_docs = set(range(30000, 32900))      # packed: many narrow blocks
    for i in range(n):
        toks = ["filler"]
        if i in a_docs:
            toks.append("ta")
        if i in b_docs:
            toks.append("tb")
        d = rt.Document()
        d.add(rt.TextField("body", " ".join(toks)))
        buf.add_document(d)
    reader = IndexReader([SegmentSnapshot("s0", pack_segment(buf.finish()))])
    qs = []
    for mk in ("must", "should"):
        q = rt.BooleanQuery()
        getattr(q, mk)(rt.TermQuery(rt.Term("body", "ta")))
        getattr(q, mk)(rt.TermQuery(rt.Term("body", "tb")))
        qs.append(q)
    s = IndexSearcher(reader)
    METRICS.reset()
    got = s.search_batch(qs, k=20)
    snap = METRICS.snapshot()["counters"]
    assert snap.get("search.pair_overflow_rows", 0) > 0, (
        "overflow fallback did not trigger — tighten the corpus shape"
    )
    os.environ["RUCENE_PAIR"] = "0"
    try:
        ref = IndexSearcher(reader).search_batch(qs, k=20)
    finally:
        os.environ.pop("RUCENE_PAIR", None)
    _assert_equal(got, ref)


def test_pair_mixed_batch_with_other_classes():
    """Pair rows split out of a mixed batch (terms + phrases + AND2/OR2)."""
    reader, words = _index()
    rng = np.random.default_rng(14)
    qs = _queries(words, rng, n=16)
    qs += [rt.TermQuery(rt.Term("body", words[i])) for i in range(4)]
    qs.append(rt.PhraseQuery("body", ["w1", "w2"]))
    s = IndexSearcher(reader)
    got = s.search_batch(qs, k=10)
    os.environ["RUCENE_PAIR"] = "0"
    try:
        ref = IndexSearcher(reader).search_batch(qs, k=10)
    finally:
        os.environ.pop("RUCENE_PAIR", None)
    _assert_equal(got, ref)
