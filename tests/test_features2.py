"""Feature tests: spans, DisjunctionMax, highlighter, DV updates, concurrent
merge scheduler, search timeout."""

import pytest

from rucene_tpu import (
    Document,
    IndexSearcher,
    NumericDocValuesField,
    StringField,
    Term,
    TermQuery,
    TextField,
)
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.highlight import FastVectorHighlighter, FieldQuery
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.merge_scheduler import ConcurrentMergeScheduler, MergeRateLimiter
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot, open_directory_reader
from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
from rucene_tpu.search.query import BooleanQuery, DisjunctionMaxQuery, PhraseQuery
from rucene_tpu.search.spans import SpanNearQuery, SpanOrQuery, SpanTermQuery
from rucene_tpu.store.directory import RAMDirectory


@pytest.fixture(scope="module")
def span_searcher():
    texts = [
        "alpha beta gamma delta",
        "alpha gamma beta delta",
        "alpha x x x beta",
        "beta alpha",
        "unrelated words here",
    ]
    buf = SegmentBuffer()
    for t in texts:
        d = Document()
        d.add(TextField("body", t, stored=True, term_vectors=True))
        buf.add_document(d)
    return IndexSearcher(IndexReader([SegmentSnapshot("sp", pack_segment(buf.finish()))]))


def test_span_term(span_searcher):
    td = span_searcher.search(SpanTermQuery(Term("body", "alpha")), k=10)
    assert td.total_hits == 4


def test_span_near_ordered(span_searcher):
    q = SpanNearQuery(
        [SpanTermQuery(Term("body", "alpha")), SpanTermQuery(Term("body", "beta"))],
        slop=0,
        in_order=True,
    )
    td = span_searcher.search(q, k=10)
    assert sorted(sd.doc for sd in td.score_docs) == [0]  # only 'alpha beta' adjacent
    q2 = SpanNearQuery(
        [SpanTermQuery(Term("body", "alpha")), SpanTermQuery(Term("body", "beta"))],
        slop=3,
        in_order=True,
    )
    td2 = span_searcher.search(q2, k=10)
    assert sorted(sd.doc for sd in td2.score_docs) == [0, 1, 2]


def test_span_near_unordered(span_searcher):
    q = SpanNearQuery(
        [SpanTermQuery(Term("body", "alpha")), SpanTermQuery(Term("body", "beta"))],
        slop=0,
        in_order=False,
    )
    td = span_searcher.search(q, k=10)
    assert sorted(sd.doc for sd in td.score_docs) == [0, 3]


def test_span_or(span_searcher):
    q = SpanOrQuery([SpanTermQuery(Term("body", "gamma")), SpanTermQuery(Term("body", "x"))])
    td = span_searcher.search(q, k=10)
    assert sorted(sd.doc for sd in td.score_docs) == [0, 1, 2]


def test_dismax(span_searcher):
    qa = TermQuery(Term("body", "alpha"))
    qb = TermQuery(Term("body", "unrelated"))
    dm = DisjunctionMaxQuery([qa, qb], tie_breaker=0.0)
    td = span_searcher.search(dm, k=10)
    assert td.total_hits == 5
    # pure max: a doc matching only alpha scores exactly its alpha score
    ta = span_searcher.search(qa, k=10)
    alpha_scores = {sd.doc: sd.score for sd in ta.score_docs}
    for sd in td.score_docs:
        if sd.doc in alpha_scores:
            assert sd.score == pytest.approx(alpha_scores[sd.doc], rel=1e-6)
    # tie_breaker adds the rest
    dm2 = DisjunctionMaxQuery([qa, TermQuery(Term("body", "beta"))], tie_breaker=0.5)
    td2 = span_searcher.search(dm2, k=10)
    both = [sd for sd in td2.score_docs if sd.doc == 0]
    assert both, "doc 0 matches both"


def test_highlighter(span_searcher):
    s = span_searcher
    fq = FieldQuery.build(TermQuery(Term("body", "beta")))
    h = FastVectorHighlighter()
    frags = h.get_best_fragments(fq, s.reader, 0, "body", frag_char_size=40)
    assert frags and "<b>beta</b>" in frags[0]
    # phrase-aware: only the adjacent pair highlights as a unit
    fq2 = FieldQuery.build(PhraseQuery("body", ["alpha", "beta"]))
    frags2 = h.get_best_fragments(fq2, s.reader, 0, "body")
    assert frags2 and "<b>alpha beta</b>" in frags2[0]
    assert h.get_best_fragments(fq2, s.reader, 1, "body") == []  # not adjacent in doc 1
    # doc without term vectors -> no fragments rather than error
    buf = SegmentBuffer()
    d = Document()
    d.add(TextField("body", "beta text", stored=True))
    buf.add_document(d)
    s2 = IndexSearcher(IndexReader([SegmentSnapshot("no_tv", pack_segment(buf.finish()))]))
    assert h.get_best_fragments(fq, s2.reader, 0, "body") == []


def test_dv_update(tmp_path):
    d = RAMDirectory()
    w = IndexWriter(d)
    for i in range(4):
        doc = Document()
        doc.add(StringField("id", str(i), stored=True))
        doc.add(TextField("body", f"doc number {i}"))
        doc.add(NumericDocValuesField("rank", i * 10))
        w.add_document(doc)
    w.commit()
    w.update_numeric_doc_value(Term("id", "2"), "rank", 999)
    r = w.get_reader()
    vals, present = r.leaves[0].numeric_doc_values("rank")
    assert vals.tolist() == [0, 10, 999, 30]
    assert present.all()
    # persists across commit + reopen
    w.commit()
    w.close()
    r2 = open_directory_reader(d)
    vals2, _ = r2.leaves[0].numeric_doc_values("rank")
    assert vals2.tolist() == [0, 10, 999, 30]


def test_concurrent_merge_scheduler():
    d = RAMDirectory()
    from rucene_tpu.index.merge import TieredMergePolicy

    cfg = IndexWriterConfig(
        max_buffered_docs=1,
        merge_policy=TieredMergePolicy(merge_factor=4, segs_per_tier=4),
        merge_scheduler=ConcurrentMergeScheduler(max_threads=2),
    )
    w = IndexWriter(d, cfg)
    for i in range(16):
        doc = Document()
        doc.add(TextField("body", f"common word{i}"))
        w.add_document(doc)
    w.commit()
    cfg.merge_scheduler.sync()
    r = w.get_reader()
    assert r.num_docs == 16
    assert len(r.leaves) < 16
    s = IndexSearcher(r)
    assert s.search(TermQuery(Term("body", "common")), 20).total_hits == 16
    w.close()


def test_rate_limiter_abort():
    rl = MergeRateLimiter()
    rl.pause(1000)
    rl.abort()
    from rucene_tpu.index.merge_scheduler import MergeAbortedError

    with pytest.raises(MergeAbortedError):
        rl.check_abort()


def test_search_timeout(span_searcher):
    res = span_searcher.search_batch([TermQuery(Term("body", "alpha"))], k=5, timeout_s=0.0)
    # deadline already passed: leaves skipped, marked timed out
    assert span_searcher.timed_out is True
    assert res[0].total_hits == 0
    res2 = span_searcher.search_batch([TermQuery(Term("body", "alpha"))], k=5, timeout_s=30.0)
    assert span_searcher.timed_out is False
    assert res2[0].total_hits == 4


def test_rescorer():
    from rucene_tpu.search.rescorer import QueryRescorer

    d = RAMDirectory()
    w = IndexWriter(d)
    for i, t in enumerate(["fox alpha", "fox beta", "fox alpha beta", "nothing here"]):
        doc = Document()
        doc.add(StringField("id", str(i), stored=True))
        doc.add(TextField("body", t))
        w.add_document(doc)
    s = IndexSearcher(w.get_reader())
    first = s.search(TermQuery(Term("body", "fox")), k=10)
    rescored = QueryRescorer(TermQuery(Term("body", "beta")), rescore_weight=10.0).rescore(
        s, first, top_n=10
    )
    assert rescored.total_hits == first.total_hits
    # docs with 'beta' must now outrank the others
    top2 = {sd.doc for sd in rescored.score_docs[:2]}
    assert top2 == {1, 2}
    w.close()


def test_force_merge_deletes():
    d = RAMDirectory()
    w = IndexWriter(d, IndexWriterConfig(max_buffered_docs=3))
    for i in range(9):
        doc = Document()
        doc.add(StringField("id", str(i), stored=True))
        doc.add(TextField("body", f"common tok{i}"))
        w.add_document(doc)
    w.delete_documents_by_term(Term("id", "1"))
    w.delete_documents_by_term(Term("id", "4"))
    r0 = w.get_reader()
    assert r0.num_docs == 7 and r0.max_doc == 9
    w.force_merge_deletes()
    r1 = w.get_reader()
    assert r1.num_docs == 7 and r1.max_doc == 7  # dead docs expunged
    s = IndexSearcher(r1)
    assert s.search(TermQuery(Term("body", "common")), 10).total_hits == 7
    w.close()


def test_sharded_fallback_queries():
    import jax

    from rucene_tpu import PhraseQuery
    from rucene_tpu.codec.postings import pack_segment
    from rucene_tpu.index.memory import SegmentBuffer
    from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
    from rucene_tpu.parallel.sharded import ShardedIndex, ShardedSearcher, make_mesh

    texts = ["alpha beta gamma", "beta gamma delta", "gamma delta epsilon", "zeta eta"]
    snaps = []
    for i in range(2):
        buf = SegmentBuffer()
        for t in texts[i * 2 : i * 2 + 2]:
            doc = Document()
            doc.add(TextField("body", t))
            buf.add_document(doc)
        snaps.append(SegmentSnapshot(f"fb{i}", pack_segment(buf.finish())))
    reader = IndexReader(snaps)
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    sh = ShardedSearcher(ShardedIndex(mesh, reader))
    res = sh.search_batch(
        [PhraseQuery("body", ["beta", "gamma"]), TermQuery(Term("body", "gamma"))], k=5
    )
    assert res[0].total_hits == 2  # phrase via fallback
    assert res[1].total_hits == 3  # term via sharded path


def test_special_queries_inside_boolean(span_searcher):
    """Spans / DisMax / ConstantScore compose as boolean clauses."""
    from rucene_tpu.search.query import ConstantScoreQuery

    s = span_searcher
    bq = BooleanQuery()
    bq.must(
        SpanNearQuery(
            [SpanTermQuery(Term("body", "alpha")), SpanTermQuery(Term("body", "beta"))],
            slop=3,
            in_order=True,
        )
    )
    bq.must_not(TermQuery(Term("body", "gamma")))
    td = s.search(bq, k=10)
    # span matches docs 0,1,2 at slop 3; gamma excludes 0 and 1
    assert sorted(sd.doc for sd in td.score_docs) == [2]

    bq2 = BooleanQuery()
    bq2.should(ConstantScoreQuery(TermQuery(Term("body", "unrelated")), boost=5.0))
    bq2.should(TermQuery(Term("body", "delta")))
    td2 = s.search(bq2, k=10)
    assert sorted(sd.doc for sd in td2.score_docs) == [0, 1, 4]
    by_doc = {sd.doc: sd.score for sd in td2.score_docs}
    assert by_doc[4] >= 5.0  # constant-score clause contribution

    dm = DisjunctionMaxQuery(
        [TermQuery(Term("body", "alpha")), TermQuery(Term("body", "x"))], tie_breaker=0.1
    )
    bq3 = BooleanQuery()
    bq3.must(dm)
    bq3.filter(TermQuery(Term("body", "beta")))
    td3 = s.search(bq3, k=10)
    assert sorted(sd.doc for sd in td3.score_docs) == [0, 1, 2, 3]


def test_highlighter_boundary_scanner():
    """Fragments snap to word/sentence boundaries instead of cutting
    mid-word (reference SimpleBoundaryScanner, highlight/mod.rs:1062)."""
    text = (
        "the quick brown fox jumps over the lazy dog while the searching "
        "machinery highlights interesting passages precisely and never "
        "cuts a word in half anywhere"
    )
    buf = SegmentBuffer()
    d = Document()
    d.add(TextField("body", text, stored=True, term_vectors=True))
    buf.add_document(d)
    s = IndexSearcher(IndexReader([SegmentSnapshot("bs", pack_segment(buf.finish()))]))
    fq = FieldQuery.build(TermQuery(Term("body", "highlights")))
    h = FastVectorHighlighter()
    frags = h.get_best_fragments(fq, s.reader, 0, "body", frag_char_size=40)
    assert frags and "<b>highlights</b>" in frags[0]
    # every fragment edge falls on a word boundary of the source text
    plain = frags[0].replace("<b>", "").replace("</b>", "")
    idx = text.find(plain)
    assert idx >= 0, (plain, text)
    assert idx == 0 or text[idx - 1] == " "
    end = idx + len(plain)
    assert end == len(text) or text[end] in ". ,!?\t\n"


def test_highlighter_multivalued_field():
    """Multi-valued stored fields highlight: offsets accumulate across
    values with a 1-char gap, and the display text joins the same way."""
    buf = SegmentBuffer()
    d = Document()
    d.add(TextField("body", "first value here", stored=True, term_vectors=True))
    d.add(TextField("body", "second value with target word", stored=True, term_vectors=True))
    buf.add_document(d)
    s = IndexSearcher(IndexReader([SegmentSnapshot("mv", pack_segment(buf.finish()))]))
    fq = FieldQuery.build(TermQuery(Term("body", "target")))
    h = FastVectorHighlighter()
    frags = h.get_best_fragments(fq, s.reader, 0, "body", frag_char_size=60)
    assert frags, "multi-valued field produced no fragments"
    assert "<b>target</b>" in frags[0]
    # the second value's terms highlight at the right place in the join
    fq2 = FieldQuery.build(PhraseQuery("body", ["target", "word"]))
    frags2 = h.get_best_fragments(fq2, s.reader, 0, "body", frag_char_size=60)
    assert frags2 and "<b>target word</b>" in frags2[0]
