"""Intersection-driven phrase route (ops/phrase_isect +
phrase_path._dispatch_phrase_isect): the path for common x common exact
phrases whose terms admission keeps OFF the position-plane cache. Parity
with the host oracle, exact totals, and the freq-overflow spill.

reference: ExactPhraseScorer's skip-list leapfrog over both postings
lists (src/core/search/scorer/phrase_scorer.rs:122) — work ~ df_min on
one core; here the co-occurrence set comes from one dense AND over the
resident u8 tf planes and only those docs are position-verified.
"""

import os

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.searcher import IndexSearcher
from rucene_tpu.util.metrics import METRICS
from tests.hitcheck import assert_hits_equal


@pytest.fixture(autouse=True)
def _force_isect_regime():
    # tf-plane every term (tiny corpus), and shrink the position-plane
    # budget so only ONE term is resident -> heavy rows get denied and
    # must take the intersection route
    os.environ["RUCENE_PLANES"] = "1"
    os.environ["RUCENE_PLANE_CACHE_MB"] = "0"
    yield
    os.environ.pop("RUCENE_PLANES", None)
    os.environ.pop("RUCENE_PLANE_CACHE_MB", None)


def _searcher(texts):
    buf = SegmentBuffer()
    for t in texts:
        d = rt.Document()
        d.add(rt.TextField("body", t))
        buf.add_document(d)
    s = IndexSearcher(
        IndexReader([SegmentSnapshot("pi", pack_segment(buf.finish()))])
    )
    s.PHRASE_SCALAR_MAX_DOCS = 0
    s.PHRASE_ROW_DF_BUDGET = 0  # force heavy classification
    s.PHRASE_PLANE_MIN_DOCS = 1
    s.PLANE_ADMIT_MIN_DOCS = 0  # admission active even on the tiny corpus
    return s


def _host(s, q, k):
    from rucene_tpu.search import host_engine

    doc_freqs, stats = s._gather_stats_query(q)
    per_leaf = []
    for leaf in s.reader.leaves:
        m, acc = host_engine.evaluate_query(leaf, q, s.similarity, stats, doc_freqs)
        hh = host_engine.hits_from_dense(leaf, m, acc, k)
        per_leaf.append((leaf.doc_base, hh.docs, hh.scores, hh.total_hits))
    return s._merge_leaf_hits(per_leaf, k)


def test_isect_route_parity_with_host():
    rng = np.random.default_rng(99)
    texts = []
    for _ in range(3000):
        n = int(rng.integers(4, 30))
        texts.append(" ".join(f"w{int(x) % 12}" for x in rng.zipf(1.3, size=n)))
    s = _searcher(texts)
    queries = [
        rt.PhraseQuery("body", ["w1", "w2"]),
        rt.PhraseQuery("body", ["w0", "w1"]),
        rt.PhraseQuery("body", ["w2", "w3", "w1"]),
        rt.PhraseQuery("body", ["w4", "w4"]),  # repeated term
    ]
    before = METRICS.snapshot()["counters"].get("search.phrase_isect", 0)
    got = s.search_batch(queries, k=15)
    after = METRICS.snapshot()["counters"].get("search.phrase_isect", 0)
    assert after - before >= 3, "heavy denied rows should ride the isect route"
    for q, g in zip(queries, got):
        want = _host(s, q, 15)
        assert g.total_hits == want.total_hits, q.terms
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in want.score_docs],
        )


def test_isect_freq_overflow_spills_exactly():
    """A doc where a term occurs > FMAX times overflows the position
    window; the row must spill to the scalar engine and stay exact."""
    rng = np.random.default_rng(7)
    texts = [
        " ".join(f"w{int(rng.integers(0, 5))}" for _ in range(12))
        for _ in range(600)
    ]
    texts.append(" ".join(["w1"] * 70) + " w1 w2")  # 71 occurrences of w1
    s = _searcher(texts)
    q = rt.PhraseQuery("body", ["w1", "w2"])
    got = s.search_batch([q], k=10)[0]
    want = _host(s, q, 10)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
    )


def test_isect_with_deletes():
    rng = np.random.default_rng(21)
    texts = [
        " ".join(f"w{int(rng.integers(0, 6))}" for _ in range(10))
        for _ in range(800)
    ]
    buf = SegmentBuffer()
    for t in texts:
        d = rt.Document()
        d.add(rt.TextField("body", t))
        buf.add_document(d)
    packed = pack_segment(buf.finish())
    live = np.ones(len(texts), bool)
    live[::3] = False
    snap = SegmentSnapshot("pd", packed).with_deletes(live)
    s = IndexSearcher(IndexReader([snap]))
    s.PHRASE_SCALAR_MAX_DOCS = 0
    s.PHRASE_ROW_DF_BUDGET = 0
    s.PHRASE_PLANE_MIN_DOCS = 1
    s.PLANE_ADMIT_MIN_DOCS = 0
    q = rt.PhraseQuery("body", ["w1", "w2"])
    got = s.search_batch([q], k=20)[0]
    want = _host(s, q, 20)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
    )
