"""Unordered span-near on the device (ops/phrase_plane.span_unordered
window bit algebra): exact parity with the host Spans protocol
(spans.py witness-enumeration semantics; reference span_near.rs
NearSpansUnordered)."""

from __future__ import annotations

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.doc.term import Term
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.spans import SpanNearQuery, SpanTermQuery
from rucene_tpu.util.metrics import METRICS
from tests.hitcheck import assert_hits_equal


def _reader(n=400, n_segments=1, seed=33):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(25)]
    probs = 1.0 / np.arange(1, 26) ** 1.1
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(5, 30)), p=probs))
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
    return IndexReader(snaps)


def _near(terms, slop):
    return SpanNearQuery(
        [SpanTermQuery(Term("body", t)) for t in terms], slop=slop, in_order=False
    )


def _host_truth(searcher, q, k):
    return searcher._search_host(q, k)


@pytest.mark.parametrize("n_segments", [1, 2])
@pytest.mark.parametrize(
    "terms,slop",
    [
        (["w0", "w1"], 0),
        (["w0", "w1"], 3),
        (["w1", "w4"], 8),
        (["w0", "w1", "w2"], 2),
        (["w0", "w2", "w5"], 6),
    ],
)
def test_span_unordered_parity(terms, slop, n_segments):
    reader = _reader(n_segments=n_segments)
    s = rt.IndexSearcher(reader)
    q = _near(terms, slop)
    assert s._span_unordered_eligible(q)
    before = METRICS.snapshot()["counters"].get("route.span_unordered", 0)
    got = s.search(q, k=25)
    assert METRICS.snapshot()["counters"].get("route.span_unordered", 0) > before
    want = _host_truth(s, q, 25)
    assert got.total_hits == want.total_hits, (terms, slop)
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
        rtol=2e-6,  # device freq sums per width group in f32; host sums f64
    )


def test_span_unordered_ineligible_shapes():
    reader = _reader()
    s = rt.IndexSearcher(reader)
    # duplicate terms: the distinctness reduction breaks -> host
    assert not s._span_unordered_eligible(_near(["w0", "w0"], 2))
    # ordered: rides the phrase pipeline via device_equivalent
    q = SpanNearQuery(
        [SpanTermQuery(Term("body", "w0")), SpanTermQuery(Term("body", "w1"))],
        slop=1,
        in_order=True,
    )
    assert not s._span_unordered_eligible(q)
    # nested child -> host
    inner = _near(["w0", "w1"], 1)
    nested = SpanNearQuery(
        [inner, SpanTermQuery(Term("body", "w2"))], slop=2, in_order=False
    )
    assert not s._span_unordered_eligible(nested)
    # duplicates still answer correctly through the host path
    got = s.search(_near(["w0", "w0"], 3), k=10)
    want = _host_truth(s, _near(["w0", "w0"], 3), 10)
    assert got.total_hits == want.total_hits


def test_span_unordered_with_deletes():
    reader = _reader()
    leaves = []
    for lf in reader.leaves:
        live = np.ones(lf.max_doc, bool)
        live[::4] = False
        leaves.append(lf.with_deletes(live))
    reader = IndexReader(leaves)
    s = rt.IndexSearcher(reader)
    q = _near(["w0", "w1"], 4)
    got = s.search(q, k=25)
    want = _host_truth(s, q, 25)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
        rtol=2e-6,
    )


def test_span_or_children_unordered_parity():
    """near(or(w0,w3), w1, unordered): the child plane is the OR of member
    planes; parity with the host Spans protocol."""
    from rucene_tpu.search.spans import SpanOrQuery

    reader = _reader()
    s = rt.IndexSearcher(reader)
    q = SpanNearQuery(
        [
            SpanOrQuery([SpanTermQuery(Term("body", "w0")), SpanTermQuery(Term("body", "w3"))]),
            SpanTermQuery(Term("body", "w1")),
        ],
        slop=4,
        in_order=False,
    )
    assert s._span_unordered_eligible(q)
    got = s.search(q, k=25)
    want = _host_truth(s, q, 25)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
        rtol=2e-6,
    )


def test_span_or_children_ordered_parity():
    """Ordered slop-0 near with an OR child == multi-term exact phrase:
    rides the AND-shift plane program."""
    from rucene_tpu.search.spans import SpanOrQuery

    reader = _reader()
    s = rt.IndexSearcher(reader)
    q = SpanNearQuery(
        [
            SpanOrQuery([SpanTermQuery(Term("body", "w0")), SpanTermQuery(Term("body", "w2"))]),
            SpanTermQuery(Term("body", "w1")),
        ],
        slop=0,
        in_order=True,
    )
    assert s._span_unordered_eligible(q)
    got = s.search(q, k=25)
    want = _host_truth(s, q, 25)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
        rtol=2e-6,
    )


def test_span_or_overlapping_terms_stay_host():
    from rucene_tpu.search.spans import SpanOrQuery

    reader = _reader()
    s = rt.IndexSearcher(reader)
    # w1 appears in both children: position->child is ambiguous -> host
    q = SpanNearQuery(
        [
            SpanOrQuery([SpanTermQuery(Term("body", "w0")), SpanTermQuery(Term("body", "w1"))]),
            SpanTermQuery(Term("body", "w1")),
        ],
        slop=2,
        in_order=False,
    )
    assert not s._span_unordered_eligible(q)
    got = s.search(q, k=10)  # still answers, via host
    want = _host_truth(s, q, 10)
    assert got.total_hits == want.total_hits


def test_span_boost_wrapper_rides_device():
    from rucene_tpu.search.spans import SpanBoostQuery

    reader = _reader()
    s = rt.IndexSearcher(reader)
    q = SpanBoostQuery(_near(["w0", "w1"], 3), boost=2.5)
    assert s._span_unordered_eligible(q)
    got = s.search(q, k=25)
    want = _host_truth(s, q, 25)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        [(sd.doc, sd.score) for sd in want.score_docs],
        rtol=2e-6,
    )
