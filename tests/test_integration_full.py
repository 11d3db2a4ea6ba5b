"""One end-to-end scenario exercising the whole public surface together:
parallel ingestion -> commit -> reopen -> every query family -> sort /
collapse / rescoring / highlight / explain -> deletes + DV updates + NRT ->
merge -> CheckIndex. The integration analog of the reference's
examples/example.rs smoke loop, but wider."""

import numpy as np

from rucene_tpu import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    Document,
    ExistsQuery,
    IndexSearcher,
    IntPoint,
    MatchAllDocsQuery,
    NumericDocValuesField,
    PhraseQuery,
    PointRangeQuery,
    SortedSetDocValuesField,
    StringField,
    Term,
    TermQuery,
    TextField,
    parse_query_string,
)
from rucene_tpu.highlight import FastVectorHighlighter, FieldQuery
from rucene_tpu.index.doc_writer import add_documents_parallel
from rucene_tpu.index.reader import open_directory_reader
from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
from rucene_tpu.search.rescorer import QueryRescorer
from rucene_tpu.search.search_manager import SearcherManager
from rucene_tpu.search.sort_field import Sort
from rucene_tpu.search.spans import SpanNearQuery, SpanTermQuery
from rucene_tpu.store.directory import FSDirectory
from rucene_tpu.tools import check_index
from tests.conftest import random_corpus


def test_full_lifecycle(tmp_path):
    rng = np.random.default_rng(2026)
    texts = random_corpus(rng, 400)
    d = FSDirectory(str(tmp_path / "full"))
    w = IndexWriter(d, IndexWriterConfig(max_buffered_docs=120))

    docs = []
    for i, t in enumerate(texts):
        doc = Document()
        doc.add(StringField("id", str(i), stored=True))
        doc.add(TextField("body", t, stored=True, term_vectors=True))
        doc.add(NumericDocValuesField("rank", i % 17))
        doc.add(IntPoint("year", 2000 + i % 25))
        doc.add(SortedSetDocValuesField("tag", f"t{i % 5}"))
        docs.append(doc)
    add_documents_parallel(w, docs, num_threads=3, docs_per_segment=100)
    w.commit()

    # fresh reopen
    r = open_directory_reader(d)
    assert r.num_docs == 400
    s = IndexSearcher(r)

    # every query family returns something sane
    assert s.search(TermQuery(Term("body", "the")), 10).total_hits > 0
    bq = BooleanQuery().must(TermQuery(Term("body", "fox"))).must_not(
        TermQuery(Term("body", "lazy"))
    )
    assert s.search(bq, 10).total_hits >= 0
    assert s.search(MatchAllDocsQuery(), 3).total_hits == 400
    assert s.search(PointRangeQuery("year", 2005, 2010), 10).total_hits > 0
    assert s.search(ExistsQuery("rank"), 5).total_hits == 400
    assert s.search(ConstantScoreQuery(TermQuery(Term("body", "dog")), 3.0), 5).score_docs[0].score == 3.0
    assert s.search(DisjunctionMaxQuery([TermQuery(Term("body", "dog")), TermQuery(Term("body", "fox"))], 0.1), 5).total_hits > 0
    assert s.search(parse_query_string("fox AND dog", "body"), 5).total_hits >= 0
    toks = None
    for t in texts:
        if len(t.split()) >= 2:
            toks = t.split()[:2]
            break
    assert s.search(PhraseQuery("body", toks), 10).total_hits > 0
    assert s.search(SpanNearQuery([SpanTermQuery(Term("body", toks[0])), SpanTermQuery(Term("body", toks[1]))], 0, True), 10).total_hits > 0

    # sort / collapse / rescoring
    ts = s.search_sorted(TermQuery(Term("body", "the")), 10, Sort.by("rank"))
    keys = [fd.fields[0] for fd in ts.field_docs]
    assert keys == sorted(keys)
    tc = s.search_collapse(TermQuery(Term("body", "the")), 10, "rank")
    # one hit per distinct "rank" value (17 values exist), capped at k
    assert 0 < len(tc.score_docs) <= 10

    def _rank_of(global_doc):
        leaf = next(lf for lf in reversed(r.leaves) if global_doc >= lf.doc_base)
        return int(leaf.numeric_doc_values("rank")[0][global_doc - leaf.doc_base])

    ranks = [_rank_of(sd.doc) for sd in tc.score_docs]
    assert len(set(ranks)) == len(ranks)
    first = s.search(TermQuery(Term("body", "fox")), 10)
    if first.score_docs:
        rescored = QueryRescorer(TermQuery(Term("body", "dog")), 2.0).rescore(s, first, 10)
        assert rescored.total_hits == first.total_hits

    # highlight + explain
    top = s.search(TermQuery(Term("body", "fox")), 1)
    if top.score_docs:
        frags = FastVectorHighlighter().get_best_fragments(
            FieldQuery.build(TermQuery(Term("body", "fox"))), r, top.score_docs[0].doc, "body"
        )
        assert frags and "<b>fox</b>" in frags[0]
        ex = s.explain(TermQuery(Term("body", "fox")), top.score_docs[0].doc)
        assert ex.match and abs(ex.value - top.score_docs[0].score) < 1e-4

    # deletes, DV update, NRT
    mgr = SearcherManager(w)
    before = mgr.acquire().search(TermQuery(Term("body", "the")), 5).total_hits
    w.delete_documents_by_term(Term("id", "0"))
    w.update_numeric_doc_value(Term("id", "1"), "rank", 999)
    assert mgr.maybe_refresh()
    s2 = mgr.acquire()
    assert s2.reader.num_docs == 399
    # locate doc id "1" (parallel ingestion => arbitrary segment/position)
    hit = s2.search(TermQuery(Term("id", "1")), 1).score_docs[0]
    leaf = next(
        lf
        for lf in reversed(s2.reader.leaves)
        if hit.doc >= lf.doc_base
    )
    assert int(leaf.numeric_doc_values("rank")[0][hit.doc - leaf.doc_base]) == 999

    # merge everything, commit, verify integrity
    w.force_merge(1)
    w.commit()
    w.close()
    status = check_index(d)
    assert status.clean, status.render()
    r3 = open_directory_reader(d)
    assert len(r3.leaves) == 1 and r3.num_docs == 399
    s3 = IndexSearcher(r3)
    assert s3.search(TermQuery(Term("body", "the")), 5).total_hits in (before, before - 1)
