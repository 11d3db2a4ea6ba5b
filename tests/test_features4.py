"""New query types, DV families, query cache, CheckIndex, metrics."""

import numpy as np
import pytest

from rucene_tpu import Document, IndexSearcher, StringField, Term, TermQuery, TextField
from rucene_tpu.doc.field import (
    BinaryDocValuesField,
    NumericDocValuesField,
    SortedDocValuesField,
    SortedNumericDocValuesField,
    SortedSetDocValuesField,
)
from rucene_tpu.index.reader import open_directory_reader
from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
from rucene_tpu.search.cache import LRUQueryCache, UsageTrackingCachingPolicy
from rucene_tpu.search.query import (
    BoostingQuery,
    ConstantScoreQuery,
    ExistsQuery,
    FilterQuery,
)
from rucene_tpu.search.spans import SpanBoostQuery, SpanTermQuery
from rucene_tpu.store.directory import FSDirectory, RAMDirectory
from rucene_tpu.tools import check_index
from rucene_tpu.util.metrics import METRICS


@pytest.fixture()
def dv_writer():
    w = IndexWriter(RAMDirectory())
    rows = [
        ("red apple", b"blobA", "alpha", [3, 1], ["x", "y"]),
        ("green pear", b"blobB", "beta", [2], ["y"]),
        ("red cherry", None, None, [], []),
    ]
    for i, (text, blob, s, nums, tags) in enumerate(rows):
        d = Document()
        d.add(StringField("id", str(i), stored=True))
        d.add(TextField("body", text))
        d.add(NumericDocValuesField("num", i * 10))
        if blob is not None:
            d.add(BinaryDocValuesField("bin", blob))
        if s is not None:
            d.add(SortedDocValuesField("cat", s))
        for n in nums:
            d.add(SortedNumericDocValuesField("snum", n))
        for t in tags:
            d.add(SortedSetDocValuesField("tags", t))
        w.add_document(d)
    return w


def test_dv_families_roundtrip(tmp_path, dv_writer):
    w = dv_writer
    w.commit()
    r = w.get_reader()
    leaf = r.leaves[0]
    assert leaf.binary_doc_values("bin") == [b"blobA", b"blobB", None]
    values, ords = leaf.sorted_doc_values("cat")
    assert values == ["alpha", "beta"]
    assert ords.tolist() == [0, 1, -1]
    flat, offs = leaf.sorted_numeric_doc_values("snum")
    assert flat.tolist() == [1, 3, 2]  # per-doc sorted
    assert offs.tolist() == [0, 2, 3, 3]
    vals, fo, so = leaf.sorted_set_doc_values("tags")
    assert vals == ["x", "y"]
    assert fo.tolist() == [0, 1, 1]
    assert so.tolist() == [0, 2, 3, 3]
    # survive disk roundtrip via FSDirectory
    d2 = FSDirectory(str(tmp_path / "dv"))
    from rucene_tpu.codec import files as segfiles

    segfiles.write_segment(d2, "x", leaf.packed)
    rt = segfiles.read_segment(d2, "x")
    assert rt.binary_dv["bin"] == [b"blobA", b"blobB", None]
    assert rt.sorted_dv["cat"][0] == ["alpha", "beta"]
    w.close()


def test_dv_families_merge(dv_writer):
    w = dv_writer
    w.flush()
    d = Document()
    d.add(StringField("id", "9", stored=True))
    d.add(TextField("body", "yellow apple"))
    d.add(SortedDocValuesField("cat", "aaa"))
    d.add(SortedSetDocValuesField("tags", "z"))
    w.add_document(d)
    w.force_merge(1)
    r = w.get_reader()
    assert len(r.leaves) == 1
    leaf = r.leaves[0]
    values, ords = leaf.sorted_doc_values("cat")
    assert values == ["aaa", "alpha", "beta"]
    # merge may reorder segments (smallest first); map ords via stored ids
    by_id = {leaf.document(d)["id"]: d for d in range(leaf.max_doc)}
    expect = {"0": 1, "1": 2, "2": -1, "9": 0}  # alpha, beta, missing, aaa
    for doc_id, want_ord in expect.items():
        assert ords[by_id[doc_id]] == want_ord, doc_id
    vals, fo, so = leaf.sorted_set_doc_values("tags")
    assert vals == ["x", "y", "z"]
    w.close()


def test_constant_score_filter_exists(dv_writer):
    s = IndexSearcher(dv_writer.get_reader())
    td = s.search(ConstantScoreQuery(TermQuery(Term("body", "red")), boost=2.5), k=10)
    assert td.total_hits == 2
    assert all(sd.score == 2.5 for sd in td.score_docs)
    tf = s.search(FilterQuery(TermQuery(Term("body", "red"))), k=10)
    assert tf.total_hits == 2 and all(sd.score == 0.0 for sd in tf.score_docs)
    te = s.search(ExistsQuery("bin"), k=10)
    assert sorted(sd.doc for sd in te.score_docs) == [0, 1]
    te2 = s.search(ExistsQuery("body"), k=10)
    assert te2.total_hits == 3
    dv_writer.close()


def test_boosting_query(dv_writer):
    s = IndexSearcher(dv_writer.get_reader())
    base = s.search(TermQuery(Term("body", "red")), k=10)
    bq = BoostingQuery(
        TermQuery(Term("body", "red")), TermQuery(Term("body", "cherry")), 0.1
    )
    td = s.search(bq, k=10)
    assert td.total_hits == base.total_hits
    scores = {sd.doc: sd.score for sd in td.score_docs}
    base_scores = {sd.doc: sd.score for sd in base.score_docs}
    assert scores[2] == pytest.approx(base_scores[2] * 0.1, rel=1e-6)  # demoted
    assert scores[0] == base_scores[0]
    dv_writer.close()


def test_span_boost(dv_writer):
    s = IndexSearcher(dv_writer.get_reader())
    plain = s.search(SpanTermQuery(Term("body", "apple")), k=5)
    boosted = s.search(SpanBoostQuery(SpanTermQuery(Term("body", "apple")), 3.0), k=5)
    assert boosted.score_docs[0].score == pytest.approx(plain.score_docs[0].score * 3.0, rel=1e-5)
    dv_writer.close()


def test_query_cache():
    cache = LRUQueryCache(max_entries=4, policy=UsageTrackingCachingPolicy(min_frequency=2))

    class FakeLeaf:
        packed = object()
        name = "f"

    calls = []

    def compute():
        calls.append(1)
        return np.arange(3)

    leaf = FakeLeaf()
    cache.get_or_compute(leaf, ("k",), compute)  # miss, not cached (freq 1)
    cache.get_or_compute(leaf, ("k",), compute)  # miss, cached now (freq 2)
    cache.get_or_compute(leaf, ("k",), compute)  # hit
    assert len(calls) == 2
    assert cache.hits == 1 and cache.misses == 2


def test_check_index(tmp_path):
    d = FSDirectory(str(tmp_path / "ci"))
    w = IndexWriter(d, IndexWriterConfig(max_buffered_docs=3))
    for i in range(7):
        doc = Document()
        doc.add(StringField("id", str(i), stored=True))
        doc.add(TextField("body", f"common token{i} extra words here"))
        w.add_document(doc)
    w.delete_documents_by_term(Term("id", "3"))
    w.commit()
    w.close()
    st = check_index(d)
    assert st.clean, st.render()
    assert sum(s.num_postings for s in st.segments) > 0
    # corrupt one byte mid-file -> detected
    seg = [f for f in d.list_all() if f.endswith(".seg")][0]
    import os

    pth = os.path.join(d.path, seg)
    raw = bytearray(open(pth, "rb").read())
    raw[len(raw) // 2] ^= 0x01
    open(pth, "wb").write(bytes(raw))
    st2 = check_index(d)
    assert not st2.clean
    assert "BROKEN" in st2.render() or st2.errors


def test_check_index_exorcise(tmp_path):
    """-exorcise drops broken segments and leaves an openable index."""
    import os

    from rucene_tpu.index.reader import open_directory_reader
    from rucene_tpu.tools import exorcise

    d = FSDirectory(str(tmp_path / "ex"))
    w = IndexWriter(d, IndexWriterConfig(max_buffered_docs=3))
    for i in range(9):
        doc = Document()
        doc.add(StringField("id", str(i), stored=True))
        doc.add(TextField("body", f"common token{i}"))
        w.add_document(doc)
    w.commit()
    w.close()
    assert check_index(d).clean

    # clean index: exorcise is a no-op
    assert exorcise(d) == []

    # corrupt the middle segment
    segs = sorted(f for f in d.list_all() if f.endswith(".seg"))
    assert len(segs) == 3
    pth = os.path.join(d.path, segs[1])
    raw = bytearray(open(pth, "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    open(pth, "wb").write(bytes(raw))
    assert not check_index(d).clean

    dropped = exorcise(d)
    assert dropped == [segs[1].removesuffix(".seg")]
    st = check_index(d)
    assert st.clean, st.render()
    r = open_directory_reader(d)
    assert r.num_docs == 6  # the broken segment's 3 docs are gone
    assert (
        IndexSearcher(r).search(TermQuery(Term("body", "common")), 10).total_hits == 6
    )
    # the dropped segment's file was GCed
    assert segs[1] not in d.list_all()

    # a writer can keep going on the repaired index
    w2 = IndexWriter(d)
    doc = Document()
    doc.add(StringField("id", "99", stored=True))
    doc.add(TextField("body", "common replacement"))
    w2.add_document(doc)
    w2.commit()
    assert w2.get_reader().num_docs == 7
    w2.close()


def test_metrics(dv_writer):
    METRICS.reset()
    s = IndexSearcher(dv_writer.get_reader())
    s.search(TermQuery(Term("body", "red")), k=5)
    snap = METRICS.snapshot()
    assert snap["counters"]["search.queries"] == 1
    assert snap["timers"]["search.batch"]["count"] == 1
    dv_writer.close()


def test_trace_and_profiler(tmp_path, dv_writer):
    """trace() feeds the metrics registry AND the jax profiler; a capture
    directory materializes with a trace file."""
    from rucene_tpu.util.metrics import METRICS, start_profiler, stop_profiler, trace

    METRICS.reset()
    s = IndexSearcher(dv_writer.get_reader())
    logdir = str(tmp_path / "xprof")
    start_profiler(logdir)
    with trace("test.scope"):
        s.search(TermQuery(Term("body", "red")), k=3)
    stop_profiler()
    snap = METRICS.snapshot()
    assert snap["timers"]["test.scope"]["count"] == 1
    assert snap["timers"]["search.device"]["count"] == 1
    import os

    found = []
    for root, _dirs, files in os.walk(logdir):
        found.extend(files)
    assert found, "profiler capture produced no files"
