"""Native span evaluator (span_native.py + rtpu_span_eval) parity with the
Python Spans protocol (spans.py spans_for_doc/host_eval — the oracle).

Scores must be BIT-IDENTICAL: the C++ side reproduces numpy's f64 pairwise
summation of the sloppy-freq terms and the f32 BM25 chain, so `==` holds.
Covers the shapes the device pipelines can't take (nested near-in-near,
duplicate terms, unordered, or-of-near), which previously ran per-doc
host Python (VERDICT r3 item 7; reference span_near.rs:1067)."""

from __future__ import annotations

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu import native
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.doc.term import Term
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.spans import (
    SpanBoostQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
)

pytestmark = pytest.mark.skipif(
    not native.available or not hasattr(native._lib, "rtpu_span_eval"),
    reason="native span evaluator unavailable",
)


def _reader(n=500, seed=11):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(18)]
    probs = 1.0 / np.arange(1, 19) ** 1.05
    probs /= probs.sum()
    buf = SegmentBuffer()
    for _ in range(n):
        d = rt.Document()
        d.add(
            rt.TextField(
                "body",
                " ".join(rng.choice(words, size=int(rng.integers(4, 40)), p=probs)),
            )
        )
        buf.add_document(d)
    return IndexReader([SegmentSnapshot("s0", pack_segment(buf.finish()))])


def _t(w):
    return SpanTermQuery(Term("body", w))


def _eval_both(q, reader, monkeypatch):
    """host_eval with the native path on vs forced-off Python oracle."""
    s = rt.IndexSearcher(reader)
    leaf = reader.leaves[0]
    sim = s.similarity
    stats = {"body": leaf.field_stats("body")}
    doc_freqs = {
        (t.field, t.text): reader.doc_freq(t.field, t.text)
        for t in q.extract_terms()
    }
    monkeypatch.setenv("RUCENE_SPAN_NATIVE", "0")
    m_py, a_py = q.host_eval(leaf, sim, stats, doc_freqs)
    monkeypatch.delenv("RUCENE_SPAN_NATIVE")
    m_nat, a_nat = q.host_eval(leaf, sim, stats, doc_freqs)
    return (m_py, a_py), (m_nat, a_nat)


TREES = [
    # nested near-in-near, ordered inside unordered
    SpanNearQuery(
        [SpanNearQuery([_t("w0"), _t("w1")], slop=2, in_order=True), _t("w2")],
        slop=5,
        in_order=False,
    ),
    # nested unordered inside ordered
    SpanNearQuery(
        [SpanNearQuery([_t("w1"), _t("w3")], slop=3, in_order=False), _t("w0")],
        slop=6,
        in_order=True,
    ),
    # duplicate terms (the shape the device reduction rejects)
    SpanNearQuery([_t("w0"), _t("w0")], slop=3, in_order=False),
    SpanNearQuery([_t("w1"), _t("w1"), _t("w2")], slop=5, in_order=True),
    # or with overlapping members + near
    SpanNearQuery(
        [SpanOrQuery([_t("w0"), _t("w1")]), _t("w1")], slop=2, in_order=False
    ),
    # or-of-near
    SpanOrQuery(
        [
            SpanNearQuery([_t("w0"), _t("w2")], slop=1, in_order=True),
            SpanNearQuery([_t("w3"), _t("w1")], slop=2, in_order=False),
        ]
    ),
    # boost wrappers at depth (geometry-transparent)
    SpanNearQuery(
        [SpanBoostQuery(_t("w0"), 3.0), SpanBoostQuery(_t("w4"), 0.5)],
        slop=4,
        in_order=False,
    ),
    # 3-clause unordered with a nested or
    SpanNearQuery(
        [SpanOrQuery([_t("w5"), _t("w6")]), _t("w0"), _t("w1")],
        slop=8,
        in_order=False,
    ),
    # slop 0 unordered (adjacent either order)
    SpanNearQuery([_t("w0"), _t("w1")], slop=0, in_order=False),
    # missing term in one clause -> empty everywhere
    SpanNearQuery([_t("w0"), _t("zzz_missing")], slop=4, in_order=False),
    # missing term inside an or -> other member still matches
    SpanNearQuery(
        [SpanOrQuery([_t("zzz_missing"), _t("w2")]), _t("w0")],
        slop=3,
        in_order=True,
    ),
]


@pytest.mark.parametrize("qi", range(len(TREES)))
def test_native_span_parity(qi, monkeypatch):
    reader = _reader()
    (m_py, a_py), (m_nat, a_nat) = _eval_both(TREES[qi], reader, monkeypatch)
    assert np.array_equal(m_py, m_nat), f"match mismatch tree {qi}"
    # bit-exact: identical f32 chain incl. numpy pairwise f64 freq sum
    assert np.array_equal(a_py, a_nat), (
        f"score mismatch tree {qi}: "
        f"{a_py[m_py & (a_py != a_nat)][:5]} vs {a_nat[m_py & (a_py != a_nat)][:5]}"
    )


def test_native_span_fuzz_random_trees(monkeypatch):
    rng = np.random.default_rng(99)
    reader = _reader(n=300, seed=5)
    words = [f"w{i}" for i in range(18)]

    def rand_tree(depth):
        kind = rng.integers(0, 3 if depth < 2 else 1)
        if kind == 0:
            q = _t(str(rng.choice(words)))
            return SpanBoostQuery(q, 2.0) if rng.random() < 0.2 else q
        n = int(rng.integers(2, 4))
        kids = [rand_tree(depth + 1) for _ in range(n)]
        if kind == 1:
            return SpanOrQuery(kids)
        return SpanNearQuery(
            kids, slop=int(rng.integers(0, 9)), in_order=bool(rng.random() < 0.5)
        )

    checked = 0
    for _ in range(25):
        q = rand_tree(0)
        if not isinstance(q, (SpanNearQuery, SpanOrQuery)):
            continue
        (m_py, a_py), (m_nat, a_nat) = _eval_both(q, reader, monkeypatch)
        assert np.array_equal(m_py, m_nat)
        assert np.array_equal(a_py, a_nat)
        checked += 1
    assert checked >= 15


def test_native_path_actually_taken(monkeypatch):
    """Guard against a silent permanent fallback: flatten must accept the
    nested shape and eval_spans must return a result."""
    from rucene_tpu.search import span_native

    reader = _reader(n=100, seed=3)
    leaf = reader.leaves[0]
    q = TREES[0]
    assert span_native._flatten(q, leaf) is not None
    s = rt.IndexSearcher(reader)
    sim = s.similarity
    stats = {"body": leaf.field_stats("body")}
    cache_row = sim.cache_row(stats["body"])
    cand = q.candidate_docs(leaf)
    res = span_native.eval_spans(
        q, leaf, cand, np.float32(1.0), cache_row, leaf.packed.norms.get("body")
    )
    assert res is not None


def test_unknown_subclass_falls_back():
    from rucene_tpu.search import span_native

    class WeirdSpan(SpanTermQuery):
        pass

    reader = _reader(n=50, seed=2)
    q = SpanNearQuery([WeirdSpan(Term("body", "w0")), _t("w1")], 2, False)
    assert span_native._flatten(q, reader.leaves[0]) is None
