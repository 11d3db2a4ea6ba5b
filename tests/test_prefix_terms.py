"""PrefixQuery + TermsIterator (reference: blocktree term enumeration,
blocktree_reader.rs:907; Lucene PrefixQuery constant-score rewrite)."""

import numpy as np
import pytest

from rucene_tpu import (
    BooleanQuery,
    Document,
    IndexSearcher,
    PrefixQuery,
    StringField,
    Term,
    TermQuery,
    TextField,
)
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.search.query_string import parse_query_string

DOCS = [
    "apple apricot banana",
    "application apply banana",
    "banana cherry",
    "apple pie",
    "appliance store",
    "zebra apex",
]


def _reader(n_segments=1):
    bounds = np.linspace(0, len(DOCS), n_segments + 1).astype(int)
    snaps = []
    for si in range(n_segments):
        buf = SegmentBuffer()
        for t in DOCS[bounds[si] : bounds[si + 1]]:
            d = Document()
            d.add(TextField("body", t))
            buf.add_document(d)
        snaps.append(SegmentSnapshot(f"s{si}", pack_segment(buf.finish())))
    return IndexReader(snaps)


def _brute_prefix_docs(prefix):
    return {
        i
        for i, t in enumerate(DOCS)
        if any(w.startswith(prefix) for w in t.split())
    }


@pytest.mark.parametrize("n_segments", [1, 3])
@pytest.mark.parametrize("prefix", ["app", "ap", "banana", "z", "q"])
def test_prefix_query_matches_brute_force(n_segments, prefix):
    s = IndexSearcher(_reader(n_segments))
    td = s.search(PrefixQuery("body", prefix, boost=2.0), k=10)
    want = _brute_prefix_docs(prefix)
    assert {sd.doc for sd in td.score_docs} == want
    assert td.total_hits == len(want)
    for sd in td.score_docs:
        assert sd.score == pytest.approx(2.0)  # constant score


def test_prefix_as_boolean_filter():
    s = IndexSearcher(_reader())
    q = (
        BooleanQuery()
        .must(TermQuery(Term("body", "banana")))
        .add(PrefixQuery("body", "app"), __import__("rucene_tpu").Occur.FILTER)
    )
    td = s.search(q, k=10)
    want = {i for i in _brute_prefix_docs("app") if "banana" in DOCS[i].split()}
    assert {sd.doc for sd in td.score_docs} == want


def test_query_string_prefix():
    s = IndexSearcher(_reader())
    td = s.search(parse_query_string("app*", default_field="body"), k=10)
    assert {sd.doc for sd in td.score_docs} == _brute_prefix_docs("app")
    # a lone "*" or mid-string "*" must NOT become a prefix query
    td2 = s.search(parse_query_string("a*b", default_field="body"), k=10)
    assert td2.total_hits == 0  # literal term "a*b" absent


def test_terms_iterator_protocol():
    r = _reader()
    leaf = r.leaves[0]
    it = leaf.terms_iterator("body")
    # full enumeration is sorted + matches the vocabulary
    seen = []
    while (t := it.next()) is not None:
        seen.append(t)
    vocab = sorted({w for d in DOCS for w in d.split()})
    assert seen == vocab

    it2 = leaf.terms_iterator("body")
    assert it2.seek_exact("banana")
    assert it2.term() == "banana"
    assert it2.doc_freq() == sum("banana" in d.split() for d in DOCS)
    assert it2.total_term_freq() >= it2.doc_freq()
    p = it2.postings()
    assert p is not None and len(p[0]) == it2.doc_freq()

    assert it2.seek_ceil("app") == it2.NOT_FOUND
    assert it2.term() == "apple"
    assert it2.seek_ceil("apple") == it2.FOUND
    assert it2.seek_ceil("zzzz") == it2.END
    assert not it2.seek_exact("nope")

    it3 = leaf.terms_iterator("body")
    it3.seek_ord(0)
    assert it3.term() == vocab[0]
    with pytest.raises(IndexError):
        it3.seek_ord(10_000)
    assert leaf.terms_iterator("missing_field") is None


def test_prefix_terms_listing():
    r = _reader()
    leaf = r.leaves[0]
    assert leaf.prefix_terms("body", "app") == [
        "apple", "appliance", "application", "apply"
    ]
    assert leaf.prefix_terms("body", "") == sorted(
        {w for d in DOCS for w in d.split()}
    )
    assert leaf.prefix_terms("body", "qq") == []


def test_prefix_query_with_writer_index(tmp_path):
    from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
    from rucene_tpu.store.directory import RAMDirectory

    d = RAMDirectory()
    w = IndexWriter(d, IndexWriterConfig(max_buffered_docs=2))
    for i, t in enumerate(DOCS):
        doc = Document()
        doc.add(StringField("id", str(i), stored=True))
        doc.add(TextField("body", t))
        w.add_document(doc)
    w.commit()
    r = w.get_reader()
    s = IndexSearcher(r)
    td = s.search(PrefixQuery("body", "app"), k=10)
    assert td.total_hits == len(_brute_prefix_docs("app"))
    w.close()


def test_prefix_on_sharded_mesh():
    """Prefix planes ride the sharded shard_map program like ranges."""
    from rucene_tpu.parallel.sharded import ShardedIndex, ShardedSearcher, make_mesh

    r = _reader(3)
    mesh = make_mesh(n_shards=4, n_dp=2)
    ss = ShardedSearcher(ShardedIndex(mesh, r))
    single = IndexSearcher(r)
    qs = [
        PrefixQuery("body", "app"),
        BooleanQuery()
        .must(TermQuery(Term("body", "banana")))
        .should(PrefixQuery("body", "ap")),
    ]
    got = ss.search_batch(qs, k=10)
    want = single.search_batch(qs, k=10)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert {sd.doc for sd in g.score_docs} == {sd.doc for sd in w.score_docs}


def test_query_string_not_keyword():
    s = IndexSearcher(_reader())
    got = s.search(parse_query_string("apple NOT apricot", default_field="body"), k=20)
    want = s.search(parse_query_string("apple -apricot", default_field="body"), k=20)
    assert [sd.doc for sd in got.score_docs] == [sd.doc for sd in want.score_docs]
    assert got.total_hits == want.total_hits
