"""Device-offloaded sorted search / collapse: exact parity with the host
match path (the oracle) across random corpora, deletes, reverse sorts."""

import numpy as np
import pytest

from rucene_tpu import BooleanQuery, Document, IndexSearcher, NumericDocValuesField, Term, TermQuery, TextField
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.sort_field import Sort, SortField, SortFieldType
from tests.conftest import WORDS, random_corpus


def _build(rng, n_docs, n_segments, key_card=7, with_deletes=False):
    corpus = random_corpus(rng, n_docs)
    bounds = np.linspace(0, n_docs, n_segments + 1).astype(int)
    snaps = []
    gi = 0
    for si in range(n_segments):
        buf = SegmentBuffer()
        for t in corpus[bounds[si] : bounds[si + 1]]:
            d = Document()
            d.add(TextField("body", t))
            if gi % 5 != 0:  # some docs lack the DV field
                d.add(NumericDocValuesField("price", int(rng.integers(0, key_card)) * 3 - 5))
            gi += 1
            buf.add_document(d)
        packed = pack_segment(buf.finish())
        live = None
        if with_deletes:
            live = np.ones(packed.max_doc, bool)
            dead = rng.integers(0, packed.max_doc, size=max(1, packed.max_doc // 7))
            live[dead] = False
        snaps.append(SegmentSnapshot(f"s{si}", packed, live=live))
    return IndexReader(snaps)


def _same_field_docs(got, want):
    assert got.total_hits == want.total_hits
    assert len(got.field_docs) == len(want.field_docs)
    for g, w in zip(got.field_docs, want.field_docs):
        assert g.doc == w.doc
        assert g.fields == w.fields
        assert abs(g.score - w.score) <= 2e-6 * max(1.0, abs(w.score))


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("with_deletes", [False, True])
def test_sorted_device_matches_host(reverse, with_deletes):
    rng = np.random.default_rng(5 + reverse + 2 * with_deletes)
    reader = _build(rng, 300, 3, with_deletes=with_deletes)
    s = IndexSearcher(reader)
    sort = Sort([SortField("price", SortFieldType.LONG, reverse=reverse)])
    queries = [TermQuery(Term("body", w)) for w in ["the", "fox", "engine", "index"]]
    bq = BooleanQuery()
    bq.must(TermQuery(Term("body", "quick")))
    bq.should(TermQuery(Term("body", "dog")))
    queries.append(bq)
    for q in queries:
        assert s._sorted_device_eligible(q, sort)
        got = s._search_sorted_device(q, 12, sort)
        want = s._search_sorted_host(q, 12, sort)
        _same_field_docs(got, want)


def test_sorted_device_match_all():
    from rucene_tpu import MatchAllDocsQuery

    rng = np.random.default_rng(11)
    reader = _build(rng, 150, 2)
    s = IndexSearcher(reader)
    sort = Sort([SortField("price", SortFieldType.LONG)])
    q = MatchAllDocsQuery()
    assert s._sorted_device_eligible(q, sort)
    got = s._search_sorted_device(q, 10, sort)
    want = s._search_sorted_host(q, 10, sort)
    _same_field_docs(got, want)


def test_sorted_score_mixed_falls_back_to_host():
    rng = np.random.default_rng(13)
    reader = _build(rng, 100, 1)
    s = IndexSearcher(reader)
    sort = Sort(
        [SortField("price", SortFieldType.LONG), SortField(None, SortFieldType.SCORE)]
    )
    assert not s._sorted_device_eligible(TermQuery(Term("body", "the")), sort)
    td = s.search_sorted(TermQuery(Term("body", "the")), 5, sort)
    assert td.total_hits > 0


def _build_two_dv(rng, n_docs, n_segments, with_deletes=False):
    corpus = random_corpus(rng, n_docs)
    bounds = np.linspace(0, n_docs, n_segments + 1).astype(int)
    snaps = []
    gi = 0
    for si in range(n_segments):
        buf = SegmentBuffer()
        for t in corpus[bounds[si] : bounds[si + 1]]:
            d = Document()
            d.add(TextField("body", t))
            if gi % 5 != 0:
                d.add(NumericDocValuesField("price", int(rng.integers(0, 6)) * 3 - 5))
            if gi % 7 != 0:
                d.add(NumericDocValuesField("stock", int(rng.integers(0, 9))))
            gi += 1
            buf.add_document(d)
        packed = pack_segment(buf.finish())
        live = None
        if with_deletes:
            live = np.ones(packed.max_doc, bool)
            live[rng.integers(0, packed.max_doc, size=max(1, packed.max_doc // 8))] = False
        snaps.append(SegmentSnapshot(f"s{si}", packed, live=live))
    return IndexReader(snaps)


@pytest.mark.parametrize("rev1,rev2", [(False, False), (True, False), (False, True), (True, True)])
@pytest.mark.parametrize("with_deletes", [False, True])
def test_sorted_multi_field_device_matches_host(rev1, rev2, with_deletes):
    """2-field numeric sorts with mixed directions run on the device via
    composite ranks (VERDICT r2 item 9; field_comparator.rs:124-367)."""
    rng = np.random.default_rng(50 + rev1 + 2 * rev2 + 4 * with_deletes)
    reader = _build_two_dv(rng, 260, 3, with_deletes=with_deletes)
    s = IndexSearcher(reader)
    sort = Sort(
        [
            SortField("price", SortFieldType.LONG, reverse=rev1),
            SortField("stock", SortFieldType.LONG, reverse=rev2),
        ]
    )
    for w in ("the", "fox", "index"):
        q = TermQuery(Term("body", w))
        assert s._sorted_device_eligible(q, sort)
        got = s._search_sorted_device(q, 15, sort)
        want = s._search_sorted_host(q, 15, sort)
        _same_field_docs(got, want)


def test_sorted_rank_cache_survives_refresh():
    """Rank tables are reused by a NEW searcher over the same leaves (the
    NRT refresh shape — VERDICT r2 weak #8)."""
    from rucene_tpu.search import searcher as searcher_mod

    rng = np.random.default_rng(61)
    reader = _build(rng, 120, 2)
    s1 = IndexSearcher(reader)
    sort = Sort([SortField("price", SortFieldType.LONG)])
    s1.search_sorted(TermQuery(Term("body", "the")), 5, sort)
    n_before = len(searcher_mod._RANK_CACHE)
    s2 = IndexSearcher(reader)  # new searcher, same leaves
    s2.search_sorted(TermQuery(Term("body", "the")), 5, sort)
    assert len(searcher_mod._RANK_CACHE) == n_before  # hit, no recompute entry


@pytest.mark.parametrize("with_deletes", [False, True])
def test_collapse_device_matches_host(with_deletes):
    rng = np.random.default_rng(29 + with_deletes)
    reader = _build(rng, 280, 3, key_card=5, with_deletes=with_deletes)
    s = IndexSearcher(reader)
    queries = [TermQuery(Term("body", w)) for w in ["the", "fox", "search"]]
    bq = BooleanQuery()
    bq.must(TermQuery(Term("body", "lazy")))
    queries.append(bq)
    for q in queries:
        got = s._search_collapse_device(q, 4, "price")
        want = s._search_collapse_host(q, 4, "price")
        assert got.total_hits == want.total_hits
        assert [sd.doc for sd in got.score_docs] == [sd.doc for sd in want.score_docs]
        for g, w in zip(got.score_docs, want.score_docs):
            assert abs(g.score - w.score) <= 2e-6 * max(1.0, abs(w.score))


def test_collapse_public_api_uses_device():
    rng = np.random.default_rng(31)
    reader = _build(rng, 120, 2, key_card=4)
    s = IndexSearcher(reader)
    td = s.search_collapse(TermQuery(Term("body", "the")), 3, "price")
    want = s._search_collapse_host(TermQuery(Term("body", "the")), 3, "price")
    assert [sd.doc for sd in td.score_docs] == [sd.doc for sd in want.score_docs]
