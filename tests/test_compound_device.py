"""DisMax / ConstantScore / FilterQuery / BoostingQuery on the DEVICE path
(VERDICT r2 item 4: these served from per-leaf host numpy before). Parity
oracle: each query type's host_eval (kept for exactly this purpose).

Reference semantics: disjunction_max_query.rs:43-74 (max + tie*(sum-max)),
boosting_query.rs:29 (multiply, don't exclude), match_all_query.rs
ConstantScoreQuery / filter_query.rs (constant / zero score).
"""

import numpy as np
import pytest

import rucene_tpu as rt
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search import host_engine
from rucene_tpu.search.query import (
    BoostingQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FilterQuery,
    _NeedsHostEval,
)
from tests.hitcheck import assert_hits_equal

RTOL = 2e-6  # extras reorder f32 ops (e.g. (1-t)*max + t*sum vs max + t*(sum-max))


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(41)
    buf = SegmentBuffer()
    docs = []
    for i in range(4000):
        d = rt.Document()
        body = " ".join(f"w{int(x) % 120}" for x in rng.zipf(1.35, size=int(rng.integers(4, 24))))
        title = " ".join(f"w{int(x) % 120}" for x in rng.zipf(1.35, size=3))
        d.add(rt.TextField("body", body))
        d.add(rt.TextField("title", title))
        docs.append(d)
    buf.add_documents_bulk(docs)
    return IndexReader([SegmentSnapshot("s0", pack_segment(buf.finish()))])


def _host_want(reader, searcher, q, k):
    leaf = reader.leaves[0]
    terms = q.extract_terms() if hasattr(q, "extract_terms") else []
    doc_freqs = {(t.field, t.text): reader.doc_freq(t.field, t.text) for t in terms}
    stats = {t.field: searcher.collection_stats(t.field) for t in terms}
    m, s = q.host_eval(leaf, searcher.similarity, stats, doc_freqs)
    hh = host_engine.hits_from_dense(leaf, m, s, k)
    return hh


def _check(reader, q, k=25, rtol=RTOL):
    searcher = rt.IndexSearcher(reader)
    # the device path must actually engage: spy on the host route
    called = []
    orig = rt.IndexSearcher._search_host
    rt.IndexSearcher._search_host = lambda self, query, kk: called.append(1) or orig(
        self, query, kk
    )
    try:
        got = searcher.search(q, k=k)
    finally:
        rt.IndexSearcher._search_host = orig
    assert not called, f"{type(q).__name__} fell back to the host path"
    want = _host_want(reader, searcher, q, k)
    assert got.total_hits == want.total_hits
    assert_hits_equal(
        [(sd.doc, sd.score) for sd in got.score_docs],
        list(zip(want.docs.tolist(), want.scores.tolist())),
        rtol=rtol,
    )


def test_dismax_tie0(reader):
    _check(
        reader,
        DisjunctionMaxQuery(
            [rt.TermQuery(rt.Term("body", "w3")), rt.TermQuery(rt.Term("title", "w3"))]
        ),
    )


def test_dismax_tie_fraction(reader):
    _check(
        reader,
        DisjunctionMaxQuery(
            [
                rt.TermQuery(rt.Term("body", "w5")),
                rt.TermQuery(rt.Term("title", "w5")),
                rt.TermQuery(rt.Term("body", "w9")),
            ],
            tie_breaker=0.3,
        ),
    )


def test_dismax_boosted(reader):
    _check(
        reader,
        DisjunctionMaxQuery(
            [
                rt.TermQuery(rt.Term("body", "w2"), boost=2.0),
                rt.TermQuery(rt.Term("title", "w2")),
            ],
            tie_breaker=0.5,
            boost=1.5,
        ),
        rtol=4e-6,
    )


def test_constant_score_term(reader):
    _check(reader, ConstantScoreQuery(rt.TermQuery(rt.Term("body", "w7")), boost=2.5))


def test_constant_score_boolean(reader):
    bq = rt.BooleanQuery()
    bq.must(rt.TermQuery(rt.Term("body", "w4")))
    bq.must_not(rt.TermQuery(rt.Term("body", "w11")))
    _check(reader, ConstantScoreQuery(bq, boost=0.75))


def test_filter_query(reader):
    _check(reader, FilterQuery(rt.TermQuery(rt.Term("body", "w6"))))


def test_boosting_query(reader):
    _check(
        reader,
        BoostingQuery(
            positive=rt.TermQuery(rt.Term("body", "w8")),
            negative=rt.TermQuery(rt.Term("body", "w15")),
            negative_boost=0.2,
        ),
    )


def test_boosting_bool_positive(reader):
    pos = rt.BooleanQuery()
    pos.must(rt.TermQuery(rt.Term("body", "w10")))
    pos.should(rt.TermQuery(rt.Term("body", "w20")))
    neg = rt.BooleanQuery()
    neg.should(rt.TermQuery(rt.Term("body", "w30")))
    neg.should(rt.TermQuery(rt.Term("body", "w31")))
    _check(reader, BoostingQuery(pos, neg, negative_boost=0.5))


def test_mixed_batch_extras_and_plain(reader):
    """Extras rows and plain rows coexist in one batch."""
    searcher = rt.IndexSearcher(reader)
    queries = [
        rt.TermQuery(rt.Term("body", "w3")),
        DisjunctionMaxQuery(
            [rt.TermQuery(rt.Term("body", "w3")), rt.TermQuery(rt.Term("title", "w3"))],
            tie_breaker=0.1,
        ),
        ConstantScoreQuery(rt.TermQuery(rt.Term("body", "w5")), boost=3.0),
        BoostingQuery(
            rt.TermQuery(rt.Term("body", "w3")),
            rt.TermQuery(rt.Term("body", "w5")),
            0.25,
        ),
    ]
    got = searcher.search_batch(queries, k=15)
    for q, g in zip(queries, got):
        if hasattr(q, "host_eval"):
            want = _host_want(reader, searcher, q, 15)
            assert g.total_hits == want.total_hits
            assert_hits_equal(
                [(sd.doc, sd.score) for sd in g.score_docs],
                list(zip(want.docs.tolist(), want.scores.tolist())),
                rtol=RTOL,
            )


def test_nested_dismax_single_member_flattens(reader):
    bq = rt.BooleanQuery()
    bq.must(DisjunctionMaxQuery([rt.TermQuery(rt.Term("body", "w2"))]))
    bq.should(rt.TermQuery(rt.Term("body", "w9")))
    rq = bq.rewrite()  # must not raise
    assert rq.plain and len(rq.clauses) == 2


def test_nested_multi_dismax_stays_host(reader):
    bq = rt.BooleanQuery()
    bq.must(
        DisjunctionMaxQuery(
            [rt.TermQuery(rt.Term("body", "w2")), rt.TermQuery(rt.Term("title", "w2"))]
        )
    )
    with pytest.raises(_NeedsHostEval):
        bq.rewrite()
    # ...and still answers correctly via the generic host boolean path
    searcher = rt.IndexSearcher(reader)
    td = searcher.search(bq, k=5)
    leaf = reader.leaves[0]
    terms = [rt.Term("body", "w2"), rt.Term("title", "w2")]
    doc_freqs = {(t.field, t.text): reader.doc_freq(t.field, t.text) for t in terms}
    stats = {t.field: searcher.collection_stats(t.field) for t in terms}
    m, s = host_engine.evaluate_query(
        leaf, bq, searcher.similarity, stats, doc_freqs
    )
    assert td.total_hits == int((m & np.ones(leaf.max_doc, bool)).sum())


def test_routing_metrics_zero_host(reader):
    """The bench mix of plain + extras rows routes 0 rows to the host path,
    and the per-batch routing counters record it (VERDICT r2 item 10)."""
    from rucene_tpu.util.metrics import METRICS

    searcher = rt.IndexSearcher(reader)
    queries = [
        rt.TermQuery(rt.Term("body", "w3")),
        DisjunctionMaxQuery(
            [rt.TermQuery(rt.Term("body", "w4")), rt.TermQuery(rt.Term("title", "w4"))]
        ),
        ConstantScoreQuery(rt.TermQuery(rt.Term("body", "w5"))),
        rt.PhraseQuery("body", ["w1", "w2"]),
    ]
    before = METRICS.snapshot()["counters"]
    searcher.search_batch(queries, k=5)
    after = METRICS.snapshot()["counters"]

    def delta(key):
        return after.get(key, 0) - before.get(key, 0)

    assert delta("route.device") == 3
    assert delta("route.phrase") == 1
    assert delta("route.host") == 0


def test_deletes_respected(reader):
    """Extras paths honor live masks."""
    snap0 = reader.leaves[0]
    live = np.ones(snap0.max_doc, bool)
    q = DisjunctionMaxQuery(
        [rt.TermQuery(rt.Term("body", "w3")), rt.TermQuery(rt.Term("title", "w3"))],
        tie_breaker=0.4,
    )
    base = rt.IndexSearcher(reader).search(q, k=5)
    assert base.total_hits > 0
    live[base.score_docs[0].doc] = False
    r2 = IndexReader([snap0.with_deletes(live)])
    got = rt.IndexSearcher(r2).search(q, k=5)
    assert got.total_hits == base.total_hits - 1
    assert all(sd.doc != base.score_docs[0].doc for sd in got.score_docs)
