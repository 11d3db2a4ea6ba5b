"""Auto-engaged WAND pruning (VERDICT r2 item 6): prune=None lets the
searcher engage block-max pruning exactly for pure-disjunction batches at
large corpora with small k, and pruned results match unpruned exactly."""

from __future__ import annotations

import numpy as np

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.util.metrics import METRICS
from tests.hitcheck import assert_hits_equal


def _reader(n=800, vocab=50, seed=9):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    probs = 1.0 / np.arange(1, vocab + 1) ** 1.1
    probs /= probs.sum()
    buf = SegmentBuffer()
    for _ in range(n):
        d = rt.Document()
        d.add(
            rt.TextField(
                "body",
                " ".join(rng.choice(words, size=int(rng.integers(5, 25)), p=probs)),
            )
        )
        buf.add_document(d)
    return IndexReader([SegmentSnapshot("s0", pack_segment(buf.finish()))])


def _or_queries(n=8):
    qs = []
    for i in range(n):
        q = rt.BooleanQuery()
        q.should(rt.TermQuery(rt.Term("body", f"w{i % 20}")))
        q.should(rt.TermQuery(rt.Term("body", f"w{(i * 3 + 5) % 20}")))
        qs.append(q)
    return qs


def test_auto_rule(monkeypatch):
    reader = _reader()
    s = rt.IndexSearcher(reader)
    ors = [q.rewrite() for q in _or_queries()]
    conj = rt.BooleanQuery()
    conj.must(rt.TermQuery(rt.Term("body", "w0")))
    conj.must(rt.TermQuery(rt.Term("body", "w1")))
    single = rt.TermQuery(rt.Term("body", "w0")).rewrite()

    # corpus below the threshold: never engage
    monkeypatch.delenv("RUCENE_PRUNE", raising=False)
    assert not s._auto_prune_decision(ors, k=10)
    # lower the threshold: pure-OR batches engage, others do not
    monkeypatch.setenv("RUCENE_PRUNE_AUTO_MIN_DOCS", "100")
    assert s._auto_prune_decision(ors, k=10)
    assert not s._auto_prune_decision(ors, k=1000)  # k too large
    assert not s._auto_prune_decision(ors + [conj.rewrite()], k=10)
    assert not s._auto_prune_decision([single], k=10)  # 1 clause: single path
    # forced off / on
    monkeypatch.setenv("RUCENE_PRUNE", "0")
    assert not s._auto_prune_decision(ors, k=10)
    monkeypatch.setenv("RUCENE_PRUNE", "1")
    assert s._auto_prune_decision(ors, k=10)


def test_auto_prune_parity_and_engagement(monkeypatch):
    monkeypatch.setenv("RUCENE_PRUNE_AUTO_MIN_DOCS", "100")
    monkeypatch.delenv("RUCENE_PRUNE", raising=False)
    # the pair-gallop path outranks WAND for 2-clause OR rows (exact hits,
    # no second pass); disable it here — this test pins the prune RULE
    monkeypatch.setenv("RUCENE_PAIR", "0")
    reader = _reader()
    s = rt.IndexSearcher(reader)
    qs = _or_queries()
    before = METRICS.snapshot()["counters"].get("search.auto_prune_batches", 0)
    auto = s.search_batch(qs, k=10)  # prune=None -> auto engages
    after = METRICS.snapshot()["counters"].get("search.auto_prune_batches", 0)
    assert after > before, "auto rule did not engage on a pure-OR batch"
    off = s.search_batch(qs, k=10, prune=False)
    for a, b in zip(auto, off):
        # pruned total_hits is a lower bound (Lucene GTE semantics); the
        # top-k itself must be exact
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in a.score_docs],
            [(sd.doc, sd.score) for sd in b.score_docs],
        )
