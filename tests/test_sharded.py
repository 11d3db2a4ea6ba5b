"""Multi-device sharded search on the virtual 8-CPU mesh: results must match
the single-device searcher exactly (same doc ids, same scores)."""

import numpy as np
import pytest

from rucene_tpu import BooleanQuery, IndexSearcher, Term, TermQuery
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from rucene_tpu.parallel.sharded import ShardedIndex, ShardedSearcher, make_mesh
from tests.conftest import WORDS, make_docs, random_corpus
from tests.hitcheck import assert_hits_equal


@pytest.fixture(scope="module")
def sharded_setup():
    rng = np.random.default_rng(99)
    corpus = random_corpus(rng, 400)
    parts = [corpus[0:90], corpus[90:210], corpus[210:290], corpus[290:400]]
    snaps = []
    for i, part in enumerate(parts):
        buf = SegmentBuffer()
        for d in make_docs(part):
            buf.add_document(d)
        snaps.append(SegmentSnapshot(f"p{i}", pack_segment(buf.finish())))
    reader = IndexReader(snaps)
    single = IndexSearcher(reader)
    mesh = make_mesh(n_shards=4, n_dp=2)
    sharded = ShardedSearcher(ShardedIndex(mesh, reader))
    return single, sharded


def test_sharded_term_queries(sharded_setup):
    single, sharded = sharded_setup
    queries = [TermQuery(Term("body", w)) for w in ["the", "fox", "tensor", "merge", "pack", "dog"]]
    got = sharded.search_batch(queries, k=12)
    want = single.search_batch(queries, k=12)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_sharded_boolean_queries(sharded_setup):
    single, sharded = sharded_setup
    rng = np.random.default_rng(3)
    queries = []
    for _ in range(8):
        w = rng.choice(WORDS, size=3, replace=False)
        q = BooleanQuery()
        q.must(TermQuery(Term("body", w[0])))
        q.should(TermQuery(Term("body", w[1])))
        q.must_not(TermQuery(Term("body", w[2])))
        queries.append(q)
    got = sharded.search_batch(queries, k=20)
    want = single.search_batch(queries, k=20)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_sharded_fewer_segments_than_shards(sharded_setup):
    # 2 segments on a 4-shard mesh: filler shards contribute nothing
    rng = np.random.default_rng(17)
    corpus = random_corpus(rng, 120)
    snaps = []
    for i, part in enumerate([corpus[:50], corpus[50:]]):
        buf = SegmentBuffer()
        for d in make_docs(part):
            buf.add_document(d)
        snaps.append(SegmentSnapshot(f"q{i}", pack_segment(buf.finish())))
    reader = IndexReader(snaps)
    mesh = make_mesh(n_shards=4, n_dp=2)
    sharded = ShardedSearcher(ShardedIndex(mesh, reader))
    single = IndexSearcher(reader)
    q = [TermQuery(Term("body", "the")), TermQuery(Term("body", "fox"))]
    got = sharded.search_batch(q, k=10)
    want = single.search_batch(q, k=10)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )

def test_sharded_more_segments_than_shards():
    # 16 segments on a 4-shard mesh: each shard takes a combined leaf group
    rng = np.random.default_rng(23)
    corpus = random_corpus(rng, 320)
    snaps = []
    for i in range(16):
        buf = SegmentBuffer()
        for d in make_docs(corpus[i * 20 : (i + 1) * 20]):
            buf.add_document(d)
        snaps.append(SegmentSnapshot(f"m{i}", pack_segment(buf.finish())))
    reader = IndexReader(snaps)
    mesh = make_mesh(n_shards=4, n_dp=2)
    sharded = ShardedSearcher(ShardedIndex(mesh, reader))
    single = IndexSearcher(reader)
    queries = [TermQuery(Term("body", w)) for w in ["the", "fox", "engine", "dog"]]
    bq = BooleanQuery()
    bq.must(TermQuery(Term("body", "quick")))
    bq.should(TermQuery(Term("body", "lazy")))
    queries.append(bq)
    got = sharded.search_batch(queries, k=25)
    want = single.search_batch(queries, k=25)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_sharded_match_all_and_mixed(sharded_setup):
    from rucene_tpu import MatchAllDocsQuery

    single, sharded = sharded_setup
    queries = [
        MatchAllDocsQuery(),
        TermQuery(Term("body", "fox")),
        MatchAllDocsQuery(boost=2.5),
        TermQuery(Term("body", "engine")),
    ]
    got = sharded.search_batch(queries, k=15)
    want = single.search_batch(queries, k=15)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_sharded_phrases_in_program(sharded_setup):
    """Pure phrase rows execute INSIDE the shard_map program (VERDICT r2
    item 3) — no single-process fallback — with exact parity."""
    from rucene_tpu import PhraseQuery
    from rucene_tpu.parallel.sharded import ShardedSearcher

    single, sharded = sharded_setup
    queries = [
        PhraseQuery("body", ["quick", "brown"]),
        TermQuery(Term("body", "fox")),
        PhraseQuery("body", ["lazy", "dog"]),
        PhraseQuery("body", ["quick", "brown", "fox"]),
        PhraseQuery("body", ["the", "quick"], slop=2),
    ]
    called = []
    orig = ShardedSearcher._fallback_searcher
    ShardedSearcher._fallback_searcher = lambda self: called.append(1) or orig(self)
    try:
        got = sharded.search_batch(queries, k=10)
    finally:
        ShardedSearcher._fallback_searcher = orig
    assert not called, "sharded phrase query used the single-process fallback"
    want = single.search_batch(queries, k=10)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_sharded_mixed_phrase_boolean_falls_back(sharded_setup):
    """Mixed phrase+term booleans still answer correctly via the cached
    fallback searcher."""
    from rucene_tpu import PhraseQuery

    single, sharded = sharded_setup
    bq = BooleanQuery()
    bq.must(PhraseQuery("body", ["quick", "brown"]))
    bq.must(TermQuery(Term("body", "fox")))
    queries = [bq, TermQuery(Term("body", "dog"))]
    got = sharded.search_batch(queries, k=10)
    want = single.search_batch(queries, k=10)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )
    fb1 = sharded._fallback
    assert fb1 is not None
    sharded.search_batch([bq], k=5)
    assert sharded._fallback is fb1


def test_sharded_ranges_in_program():
    """Range/exists queries run INSIDE the shard_map program (filter
    planes), matching the single-process searcher."""
    import numpy as np

    from rucene_tpu import (
        BooleanQuery,
        Document,
        ExistsQuery,
        IndexSearcher,
        IntPoint,
        NumericDocValuesField,
        PointRangeQuery,
        Term,
        TermQuery,
        TextField,
    )
    from rucene_tpu.codec.postings import pack_segment
    from rucene_tpu.index.memory import SegmentBuffer
    from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
    from rucene_tpu.parallel.sharded import ShardedIndex, ShardedSearcher
    from rucene_tpu.search.query import Occur

    rng = np.random.default_rng(31)
    leaves = []
    for si in range(4):
        buf = SegmentBuffer()
        for i in range(200):
            d = Document()
            d.add(TextField("body", " ".join(f"w{rng.integers(0, 20)}" for _ in range(10))))
            d.add(IntPoint("price", int(rng.integers(0, 100))))
            if i % 2 == 0:
                d.add(NumericDocValuesField("rank", i))
            buf.add_document(d)
        leaves.append(SegmentSnapshot(f"s{si}", pack_segment(buf.finish())))
    reader = IndexReader(leaves)
    mesh = make_mesh(n_shards=4, n_dp=2)
    sidx = ShardedIndex(mesh, reader)
    ss = ShardedSearcher(sidx)
    single = IndexSearcher(reader)

    queries = [
        PointRangeQuery("price", 10, 60),
        BooleanQuery().must(TermQuery(Term("body", "w3"))).add(
            PointRangeQuery("price", 0, 50), Occur.FILTER
        ),
        BooleanQuery().should(TermQuery(Term("body", "w5"))).add(
            PointRangeQuery("price", 80, 99), Occur.SHOULD
        ),
        ExistsQuery("rank"),
        BooleanQuery().must(TermQuery(Term("body", "w1"))).add(
            PointRangeQuery("price", 20, 90), Occur.MUST_NOT
        ),
    ]
    # ensure no fallback: partial-mode guard aside, the program must cover these
    called = []
    orig = ShardedSearcher._fallback_searcher
    ShardedSearcher._fallback_searcher = lambda self: called.append(1) or orig(self)
    try:
        got = ss.search_batch(queries, k=15)
    finally:
        ShardedSearcher._fallback_searcher = orig
    assert not called, "sharded range query used the fallback searcher"
    want = single.search_batch(queries, k=15)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert [sd.doc for sd in g.score_docs] == [sd.doc for sd in w.score_docs]
        for a, b in zip(g.score_docs, w.score_docs):
            assert abs(a.score - b.score) <= 4e-6 * max(1.0, abs(b.score))
