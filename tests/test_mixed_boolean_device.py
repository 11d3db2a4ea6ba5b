"""Mixed boolean rows (term clauses + one exact phrase) on the device
(executor.execute_mixed_planes): parity with the host path the rows used
to fall back to, across occur combinations, deletes and multi-segment
readers. The engine's rewrite makes phrase clauses required
(host_engine.evaluate_rewritten:217); the reference interleaves
PhraseScorer in ConjunctionScorer (conjunction_scorer.rs)."""

from __future__ import annotations

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.util.metrics import METRICS
from tests.hitcheck import assert_hits_equal


def _reader(n=500, n_segments=1, seed=21):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(40)]
    probs = 1.0 / np.arange(1, 41) ** 1.1
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(5, 25)), p=probs))
        for _ in range(n)
    ]
    bounds = np.linspace(0, n, n_segments + 1).astype(int)
    snaps = []
    for si in range(n_segments):
        buf = SegmentBuffer()
        for t in texts[bounds[si] : bounds[si + 1]]:
            d = rt.Document()
            d.add(rt.TextField("body", t))
            buf.add_document(d)
        snaps.append(SegmentSnapshot(f"s{si}", pack_segment(buf.finish())))
    return IndexReader(snaps), texts


def _mixed_queries(texts):
    """Booleans combining one corpus bigram phrase with term clauses."""
    bigrams = []
    for t in texts:
        w = t.split()
        for j in range(len(w) - 1):
            bigrams.append((w[j], w[j + 1]))
            if len(bigrams) >= 6:
                break
        if len(bigrams) >= 6:
            break
    qs = []
    for i, (a, b) in enumerate(bigrams):
        q = rt.BooleanQuery()
        q.add(rt.PhraseQuery("body", [a, b]), rt.Occur.MUST)
        if i % 3 == 0:
            q.add(rt.TermQuery(rt.Term("body", "w0")), rt.Occur.MUST)
        elif i % 3 == 1:
            q.add(rt.TermQuery(rt.Term("body", "w1")), rt.Occur.SHOULD)
            q.add(rt.TermQuery(rt.Term("body", "w2")), rt.Occur.SHOULD)
        else:
            q.add(rt.TermQuery(rt.Term("body", "w0")), rt.Occur.SHOULD)
            q.add(rt.TermQuery(rt.Term("body", "w3")), rt.Occur.MUST_NOT)
        qs.append(q)
    return qs


def _host_results(searcher, queries, k):
    return [searcher._search_host(q, k) for q in queries]


@pytest.mark.parametrize("n_segments", [1, 3])
def test_mixed_parity(n_segments, monkeypatch):
    reader, texts = _reader(n_segments=n_segments)
    s = rt.IndexSearcher(reader)
    qs = _mixed_queries(texts)
    before = METRICS.snapshot()["counters"].get("route.mixed", 0)
    got = s.search_batch(qs, k=15)
    after = METRICS.snapshot()["counters"].get("route.mixed", 0)
    assert after - before == len(qs), "mixed rows did not route to device"
    want = _host_results(s, qs, 15)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_mixed_parity_with_deletes():
    reader, texts = _reader()
    leaves = []
    for lf in reader.leaves:
        live = np.ones(lf.max_doc, bool)
        live[::5] = False
        leaves.append(lf.with_deletes(live))
    reader = IndexReader(leaves)
    s = rt.IndexSearcher(reader)
    qs = _mixed_queries(texts)
    got = s.search_batch(qs, k=15)
    want = _host_results(s, qs, 15)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_mixed_eligibility_boundaries():
    reader, texts = _reader()
    s = rt.IndexSearcher(reader)
    # sloppy phrase in a boolean: host path
    q = rt.BooleanQuery()
    q.add(rt.PhraseQuery("body", ["w0", "w1"], slop=2), rt.Occur.MUST)
    q.add(rt.TermQuery(rt.Term("body", "w2")), rt.Occur.MUST)
    assert not s._mixed_device_eligible(q.rewrite())
    # pure phrase (no term clauses): the dedicated phrase path
    assert not s._mixed_device_eligible(rt.PhraseQuery("body", ["w0", "w1"]).rewrite())
    # phrase + term: eligible
    q2 = rt.BooleanQuery()
    q2.add(rt.PhraseQuery("body", ["w0", "w1"]), rt.Occur.MUST)
    q2.add(rt.TermQuery(rt.Term("body", "w2")), rt.Occur.SHOULD)
    assert s._mixed_device_eligible(q2.rewrite())


def test_mixed_with_range_filter():
    """Phrase + term + numeric range in one boolean rides the device
    (range planes fold into the dense accumulators)."""
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(30)]
    buf = SegmentBuffer()
    texts = []
    for i in range(400):
        t = " ".join(rng.choice(words, size=12))
        texts.append(t)
        d = rt.Document()
        d.add(rt.TextField("body", t))
        d.add(rt.IntPoint("price", i % 50))
        buf.add_document(d)
    reader = IndexReader([SegmentSnapshot("s0", pack_segment(buf.finish()))])
    s = rt.IndexSearcher(reader)
    w = texts[0].split()
    q = rt.BooleanQuery()
    q.add(rt.PhraseQuery("body", [w[0], w[1]]), rt.Occur.MUST)
    q.add(rt.TermQuery(rt.Term("body", "w0")), rt.Occur.SHOULD)
    q.add(rt.PointRangeQuery("price", 10, 40), rt.Occur.FILTER)
    rq = q.rewrite()
    assert s._mixed_device_eligible(rq)
    before = METRICS.snapshot()["counters"].get("route.mixed", 0)
    got = s.search(q, k=20)
    assert METRICS.snapshot()["counters"].get("route.mixed", 0) > before
    want = s._search_host(q, 20)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
    )


def test_mixed_phrase_term_absent():
    """A phrase term missing from the index: zero hits, no crash."""
    reader, texts = _reader()
    s = rt.IndexSearcher(reader)
    q = rt.BooleanQuery()
    q.add(rt.PhraseQuery("body", ["w0", "zzz_missing"]), rt.Occur.MUST)
    q.add(rt.TermQuery(rt.Term("body", "w1")), rt.Occur.SHOULD)
    td = s.search(q, k=10)
    assert td.total_hits == 0 and td.score_docs == []
