"""Doc-range splitting of one packed segment (codec/split.py) — the
hot-segment TP analog (SURVEY §2.7 block-range sharding; goes beyond the
reference's per-leaf parallel search, searcher.rs:419-470)."""

import numpy as np
import pytest

from rucene_tpu import (
    BooleanQuery,
    Document,
    IndexSearcher,
    IntPoint,
    PhraseQuery,
    PointRangeQuery,
    Term,
    TermQuery,
    TextField,
)
from rucene_tpu.codec.postings import pack_segment
from rucene_tpu.codec.split import _decode_block, split_packed_segment
from rucene_tpu.index.memory import SegmentBuffer
from rucene_tpu.index.reader import IndexReader, SegmentSnapshot
from tests.hitcheck import assert_hits_equal


def _corpus(n_docs=3000, vocab=120, seed=3, dense_term=True):
    """Zipf-ish corpus with one very dense term (EF/bitset blocks) and
    normal FOR blocks."""
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n_docs):
        n = int(rng.integers(4, 16))
        words = [f"w{int(rng.zipf(1.3)) % vocab}" for _ in range(n)]
        if dense_term and i % 2 == 0:
            words.append("dense")  # ~50% df -> EF/bitset block regime
        texts.append(" ".join(words))
    return texts


def _packed(texts):
    buf = SegmentBuffer()
    for i, t in enumerate(texts):
        d = Document()
        d.add(TextField("body", t))
        d.add(IntPoint("num", i % 97))
        buf.add_document(d)
    return pack_segment(buf.finish())


def _term_postings(p, field, term):
    """(docs, freqs) of one term decoded block by block, host-side."""
    pf = p.fields[field]
    o = pf.term_ord.get(term)
    if o is None:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ds, fs = [], []
    s = int(pf.block_start[o])
    for bi in range(s, s + int(pf.block_count[o])):
        d, f = _decode_block(p, bi)
        ds.append(d)
        fs.append(f)
    if not ds:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(ds), np.concatenate(fs)


@pytest.mark.parametrize("n_parts", [2, 3, 7])
def test_split_block_parity(n_parts):
    texts = _corpus()
    p = _packed(texts)
    subs = split_packed_segment(p, n_parts)
    assert len(subs) == n_parts
    assert sum(sp.max_doc for sp in subs) == p.max_doc
    bounds = np.concatenate([[0], np.cumsum([sp.max_doc for sp in subs])])
    for term in ["w1", "w3", "w17", "dense", f"w{5}"]:
        want_d, want_f = _term_postings(p, "body", term)
        got_d, got_f = [], []
        for j, sp in enumerate(subs):
            d, f = _term_postings(sp, "body", term)
            assert ((d >= 0) & (d < sp.max_doc)).all()
            got_d.append(d + bounds[j])
            got_f.append(f)
        got_d = np.concatenate(got_d)
        got_f = np.concatenate(got_f)
        np.testing.assert_array_equal(got_d, want_d)
        np.testing.assert_array_equal(got_f, want_f)
        # per-slice doc freq is exact (sum of block counts)
        assert sum(
            int(sp.fields["body"].doc_freq[sp.fields["body"].term_ord[term]])
            for sp in subs
            if term in sp.fields["body"].term_ord
        ) == len(want_d)


def test_split_slices_norms_and_points():
    texts = _corpus(500)
    p = _packed(texts)
    subs = split_packed_segment(p, 3)
    lo = 0
    for sp in subs:
        hi = lo + sp.max_doc
        np.testing.assert_array_equal(sp.norms["body"], p.norms["body"][lo:hi])
        vals, docs = sp.points["num"]
        wv, wd = p.points["num"]
        sel = (wd >= lo) & (wd < hi)
        np.testing.assert_array_equal(docs, wd[sel] - lo)
        np.testing.assert_array_equal(vals, wv[sel])
        lo = hi


def test_split_view_occurrence_accessors_raise():
    p = _packed(_corpus(400))
    subs = split_packed_segment(p, 2)
    snap = SegmentSnapshot("s0", subs[0])
    with pytest.raises(ValueError, match="split view"):
        snap.read_postings("body", "w1", with_positions=True)
    # plain docs+freqs stay available
    assert snap.read_postings("body", "w1") is not None


def _queries():
    qs = [
        TermQuery(Term("body", "w1")),
        TermQuery(Term("body", "dense")),
        BooleanQuery().must(TermQuery(Term("body", "w1"))).must(
            TermQuery(Term("body", "w2"))
        ),
        BooleanQuery().should(TermQuery(Term("body", "w3"))).should(
            TermQuery(Term("body", "w9"))
        ),
        PointRangeQuery("num", 10, 40),
        PhraseQuery("body", ["w1", "w2"]),
    ]
    return qs


def test_sharded_split_hot_parity():
    """A single-segment (force-merged shape) reader on an 8-device mesh:
    split_hot spreads the one segment over all shards; results must equal
    the single-process searcher exactly."""
    from rucene_tpu.parallel.sharded import ShardedIndex, ShardedSearcher, make_mesh

    texts = _corpus(4000)
    reader = IndexReader([SegmentSnapshot("big", _packed(texts))])
    mesh = make_mesh(n_shards=4, n_dp=2)
    idx = ShardedIndex(mesh, reader)
    assert len(idx.leaves) == 4  # the hot segment actually split
    ss = ShardedSearcher(idx)
    single = IndexSearcher(reader)
    qs = _queries()
    got = ss.search_batch(qs, k=10)
    want = single.search_batch(qs, k=10)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_sharded_split_hot_with_deletes():
    from rucene_tpu.parallel.sharded import ShardedIndex, ShardedSearcher, make_mesh

    texts = _corpus(2000)
    p = _packed(texts)
    live = np.ones(p.max_doc, bool)
    live[::5] = False
    reader = IndexReader([SegmentSnapshot("big", p, live=live)])
    mesh = make_mesh(n_shards=4, n_dp=2)
    ss = ShardedSearcher(ShardedIndex(mesh, reader))
    single = IndexSearcher(reader)
    qs = _queries()[:4]
    got = ss.search_batch(qs, k=10)
    want = single.search_batch(qs, k=10)
    for g, w in zip(got, want):
        assert g.total_hits == w.total_hits
        assert_hits_equal(
            [(sd.doc, sd.score) for sd in g.score_docs],
            [(sd.doc, sd.score) for sd in w.score_docs],
        )


def test_split_hot_opt_out():
    from rucene_tpu.parallel.sharded import ShardedIndex, make_mesh

    reader = IndexReader([SegmentSnapshot("big", _packed(_corpus(600)))])
    idx = ShardedIndex(make_mesh(n_shards=4, n_dp=2), reader, split_hot=False)
    assert len(idx.leaves) == 1
